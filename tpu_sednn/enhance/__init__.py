from tpu_sednn.enhance.decode import (
    EnhanceConfig,
    enhance_waveform,
    enhance_lps,
    lps_from_mask,
    postprocess_mask,
)
