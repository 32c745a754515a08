"""Native (C++) host preprocessing with automatic build + numpy fallback."""
from .wrapper import (
    native_available,
    resize_bicubic_to_pm1,
    dilate7,
    crop_u8,
)
