from .convnextv2 import MODELS, ConvNeXtV2, convnextv2_tiny
from .data import PVBDataset, PVBPretrainDataset, center_crop, load_rgb
from .infer import BudgetPredictor, convert_torch_checkpoint
from .model import IMG_PATTERN, PVBNet, PVBPretrain, logits_to_budget, make_pvbnet
from .train import (
    TrainConfig,
    check_accuracy,
    load_checkpoint,
    save_checkpoint,
    train_regression,
)

__all__ = [
    "MODELS",
    "ConvNeXtV2",
    "convnextv2_tiny",
    "PVBDataset",
    "PVBPretrainDataset",
    "center_crop",
    "load_rgb",
    "BudgetPredictor",
    "convert_torch_checkpoint",
    "IMG_PATTERN",
    "PVBNet",
    "PVBPretrain",
    "logits_to_budget",
    "make_pvbnet",
    "TrainConfig",
    "check_accuracy",
    "load_checkpoint",
    "save_checkpoint",
    "train_regression",
]
