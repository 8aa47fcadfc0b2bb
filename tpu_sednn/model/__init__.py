from tpu_sednn.model.mlp import (
    ModelConfig,
    init_params,
    forward,
    forward_eval,
    params_from_wts,
    params_to_wts,
)
