from shift_gcn_tpu.train.config import ExperimentConfig, load_config  # noqa: F401
from shift_gcn_tpu.train.optim import (  # noqa: F401
    build_weight_decay_tree,
    init_sgd,
    sgd_update,
    step_decay_lr,
)
from shift_gcn_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
    cross_entropy,
    make_eval_step,
    make_train_step,
)
from shift_gcn_tpu.train.trainer import Trainer  # noqa: F401
