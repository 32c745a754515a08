"""Host-side data layer: tokenization and the CO3D/NAVI pipeline."""
from .tokenizer import ClipTokenizer
