"""Training runtime: optimizer masking, train step, capture, checkpoints."""
from .trainer import (
    TrainConfig,
    TrainState,
    Trainer,
    label_params,
    trainable_mask,
)
from .capture import capture_references
from .ema import EmaState, ema_init, ema_swap, ema_update
from .lr_schedule import lambda_linear, lambda_warmup_cosine, lambda_warmup_cosine2
from .checkpoint import latest_checkpoint, restore_train_state, save_train_state
from .logging import MetricsLogger, save_image_grid
