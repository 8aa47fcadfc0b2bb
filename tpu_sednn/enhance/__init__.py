from tpu_sednn.enhance.decode import (
    EnhanceConfig,
    compute_gv,
    enhance_waveform,
    enhance_lps,
    equalize_gv,
    lps_from_mask,
    postprocess_mask,
)
