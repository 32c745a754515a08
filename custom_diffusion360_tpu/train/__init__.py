"""Training runtime: optimizer masking, train step, capture, checkpoints."""
from .trainer import (
    TrainConfig,
    TrainState,
    Trainer,
    label_params,
    trainable_mask,
)
from .capture import capture_references
