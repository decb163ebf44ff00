from ov3det.datasets.synthetic import (
    SyntheticDataset,
    SyntheticOVDataset,
    make_batch,
    make_scene,
)

__all__ = ["SyntheticDataset", "SyntheticOVDataset", "make_batch", "make_scene"]
