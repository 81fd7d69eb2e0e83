"""Classifier-free-guidance CIFAR-10 subsystem.

TPU-native rebuild of the reference's `DiffusionFreeGuidence/` package
(label-conditioned CFG DDPM) and of the older unconditional CIFAR trainer
(`diffusion/Train.py`), both of which are broken at the reference's HEAD
(SURVEY.md §2.9.1-2); this implements the documented intent.
"""

from .data import CIFAR10Dataset, SyntheticLabeledDataset, make_labeled_dataset
from .sampler import cfg_ddpm_sample
from .train import (
    CFGConfig,
    cfg_train_step,
    evaluate_cfg,
    make_cfg_train_step,
    train_cfg,
)

__all__ = [
    "CFGConfig",
    "CIFAR10Dataset",
    "SyntheticLabeledDataset",
    "cfg_ddpm_sample",
    "cfg_train_step",
    "evaluate_cfg",
    "make_cfg_train_step",
    "make_labeled_dataset",
    "train_cfg",
]
