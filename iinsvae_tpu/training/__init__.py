from iinsvae_tpu.training.losses import semi_loss, joint_loss
from iinsvae_tpu.training.optim import make_optimizer, lambda_lr_schedule
from iinsvae_tpu.training.state import TrainState, create_train_state

__all__ = [
    "semi_loss",
    "joint_loss",
    "make_optimizer",
    "lambda_lr_schedule",
    "TrainState",
    "create_train_state",
]
