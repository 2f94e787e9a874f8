from shift_gcn_tpu.models import stgcn  # noqa: F401
from shift_gcn_tpu.models.shift_gcn import (  # noqa: F401
    BlockSpec,
    ModelConfig,
    apply,
    config_from_reference_args,
    default_backbone,
    init_params,
    make_model,
    param_count,
)
