from dcl_net_tpu.train.solver import (  # noqa: F401
    TrainState,
    autoclip,
    build_lr_schedule,
    build_optimizer,
    make_train_step,
    Solver,
)
from dcl_net_tpu.train.checkpoints import save_checkpoint, load_checkpoint  # noqa: F401
