from tpu_sednn.metrics.quality import stoi, seg_snr, lsd, si_sdr, snr
from tpu_sednn.metrics.pesq import pesq
from tpu_sednn.metrics.composite import composite, llr, wss
from tpu_sednn.metrics.throughput import audio_seconds_per_second
