from . import modes
from .coverage import get_coverage, get_clean_data, shapenet_preprocess
from .nbv import (
    METHOD_NAMES,
    NBVRunner,
    ensemble_uncertainty_rgb,
    ensemble_uncertainty_rgb_density,
    score_candidates_rgb,
    score_candidates_rgb_density,
)

__all__ = [
    "modes",
    "get_coverage",
    "get_clean_data",
    "shapenet_preprocess",
    "METHOD_NAMES",
    "NBVRunner",
    "ensemble_uncertainty_rgb",
    "ensemble_uncertainty_rgb_density",
    "score_candidates_rgb",
    "score_candidates_rgb_density",
]
