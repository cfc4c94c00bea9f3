"""Loss registry (TPU rewrite of the reference ``loss/`` package)."""
from .base import OPENOCC_LOSS, BaseLoss, MultiLoss, build_loss, register
from .reproj import ReprojLossMonoMultiNew, ReprojLossMonoMultiNewCombine
from .rgb import RGBLossMS, SemCELossMS, SemLossMS
from .regularizers import (AdaptiveSparsityLoss, EdgeLoss3DMS, EikonalLoss,
                           HardSparsityLoss, SecondGradLoss, SoftSparsityLoss,
                           SparsityLoss)

__all__ = [
    "OPENOCC_LOSS", "BaseLoss", "MultiLoss", "build_loss", "register",
    "ReprojLossMonoMultiNew", "ReprojLossMonoMultiNewCombine",
    "RGBLossMS", "SemCELossMS", "SemLossMS",
    "AdaptiveSparsityLoss", "EdgeLoss3DMS", "EikonalLoss",
    "HardSparsityLoss", "SecondGradLoss", "SoftSparsityLoss", "SparsityLoss",
]
