"""On-device DSP: framing, STFT, log-power spectrum, overlap-add ISTFT.

Replaces the reference's offline feature toolchain (`Wav2LogSpec.exe` +
endianness converters + feacat packing, /root/reference/how_to_get_pfile.txt)
with TPU-resident transforms.  The STFT is expressed as a real-DFT matmul so
it runs on the MXU and fuses with windowing and log-power (SURVEY.md §7 step 5).
"""

from tpu_sednn.dsp.stft import (
    StftConfig,
    frame_signal,
    stft_logpower,
    stft_real_imag,
    istft_overlap_add,
    reconstruct_from_lps,
)
