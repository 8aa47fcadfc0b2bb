from tpu_sednn.model.mlp import (
    ModelConfig,
    init_params,
    forward,
    forward_eval,
    params_from_wts,
    params_to_wts,
)
from tpu_sednn.model.quant import (
    QuantParams,
    forward_eval_int8,
    quantize_params_int8,
)
