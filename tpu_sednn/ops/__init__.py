from tpu_sednn.ops.fused_mlp import fused_linear_act, fused_bwd_update
from tpu_sednn.ops.stft_pallas import stft_lps_pallas
