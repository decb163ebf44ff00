from ov3det.datasets.synthetic import SyntheticDataset, make_batch, make_scene

__all__ = ["SyntheticDataset", "make_batch", "make_scene"]
