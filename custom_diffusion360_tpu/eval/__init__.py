"""Evaluation subsystem: FID and CLIP-score.

The reference publishes no evaluation code ("Evaluation: to be released",
README.md:114); its only eval-adjacent component is a thin pytorch_fid
wrapper (sgm/modules/encoders/modules.py:233-250). This package provides the
TPU-native eval stack the paper's metrics need: a functional InceptionV3
feature extractor (FID variant), Frechet-distance statistics, and CLIP
image/text similarity over this package's own parity-tested CLIP towers.
"""
from .fid import FeatureStats, frechet_distance  # noqa: F401
from .clip_score import clip_score  # noqa: F401
