from .optim import (  # noqa: F401
    PlateauState,
    clip_params,
    make_adam,
    make_rmsprop,
    plateau_init,
    plateau_step,
    step_lr,
)
