from .optim import make_adam, step_lr, cosine_lr, make_multi_optimizer
from .kws_train import KWSTrainConfig, KWSTrainState, make_train_step, init_train_state

__all__ = [
    "make_adam",
    "step_lr",
    "cosine_lr",
    "make_multi_optimizer",
    "KWSTrainConfig",
    "KWSTrainState",
    "make_train_step",
    "init_train_state",
]
