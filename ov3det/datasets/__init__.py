from ov3det.datasets.image_bank import BankRefDataset, build_image_bank
from ov3det.datasets.synthetic import (
    SyntheticDataset,
    SyntheticOVDataset,
    make_batch,
    make_scene,
)

__all__ = [
    "BankRefDataset",
    "build_image_bank",
    "SyntheticDataset",
    "SyntheticOVDataset",
    "make_batch",
    "make_scene",
]
