from tpu_sednn.model.mlp import (
    ModelConfig,
    init_params,
    init_params_parity,
    forward,
    forward_eval,
    fold_eval_params,
    params_from_wts,
    params_to_wts,
)
from tpu_sednn.model.quant import (
    QuantParams,
    forward_eval_int8,
    quantize_params_int8,
)
