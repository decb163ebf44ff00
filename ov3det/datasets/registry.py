"""Dataset registry: name -> (splits dict, dataset_config).

Counterpart of reference datasets/__init__.py:12-50 (build_dataset):
train split augmented, test = val un-augmented, plus an "inference" view of
the train split without augmentation for pseudo-label generation.  Adds a
"synthetic" dataset for data-free testing/benchmarking.
"""
from __future__ import annotations

from ov3det.config import DataConfig
from ov3det.datasets.dataset_configs import ScannetDatasetConfig, SunrgbdDatasetConfig
from ov3det.datasets.scannet import ScannetDetectionDataset
from ov3det.datasets.sunrgbd import SunrgbdDetectionDataset
from ov3det.datasets.synthetic import SyntheticDataset, SyntheticOVDataset


def build_dataset(cfg: DataConfig, splits=("train", "test")):
    name = cfg.dataset_name
    datasets = {}
    if name == "sunrgbd":
        dataset_config = SunrgbdDatasetConfig()

        def make(split, augment):
            return SunrgbdDetectionDataset(
                dataset_config,
                split_set=split,
                root_dir=cfg.root_dir,
                raw_data_dir=cfg.meta_data_dir,
                pseudo_box_dir=cfg.pseudo_label_dir,
                feature_2d_dir=cfg.feature_2d_dir,
                num_points=cfg.num_points,
                use_color=cfg.use_color,
                use_image=cfg.use_image,
                augment=augment,
                use_pbox=cfg.use_pbox,
                use_2d_feature=cfg.use_2d_feature,
            )

        if "train" in splits:
            datasets["train"] = make("train", True)
        if "test" in splits:
            datasets["test"] = make("val", False)
        if "inference" in splits:
            datasets["inference"] = make("train", False)
    elif name == "scannet":
        dataset_config = ScannetDatasetConfig()

        def make(split, augment):
            return ScannetDetectionDataset(
                dataset_config,
                split_set=split,
                root_dir=cfg.root_dir,
                meta_data_dir=cfg.meta_data_dir,
                pseudo_box_dir=cfg.pseudo_label_dir,
                feature_2d_dir=cfg.feature_2d_dir,
                num_points=cfg.num_points,
                use_color=cfg.use_color,
                use_image=cfg.use_image,
                frames_dir=cfg.frames_dir,
                max_frames=cfg.max_frames,
                augment=augment,
                use_pbox=cfg.use_pbox,
                use_2d_feature=cfg.use_2d_feature,
            )

        if "train" in splits:
            datasets["train"] = make("train", True)
        if "test" in splits:
            datasets["test"] = make("val", False)
        if "inference" in splits:
            datasets["inference"] = make("train", False)
    elif name == "synthetic":
        dataset_config = ScannetDatasetConfig()
        # --use_image: the OV variant adds 530x730 canvases + calibration in
        # the SUN RGB-D schema so the open-vocab path (teacher, image bank)
        # is drivable data-free
        cls = SyntheticOVDataset if cfg.use_image else SyntheticDataset
        for split, seed in (("train", 1), ("test", 2), ("inference", 1)):
            if split in splits:
                datasets[split] = cls(
                    size=64 if split == "train" else 16,
                    seed=seed,
                    num_points=cfg.num_points,
                    num_semcls=dataset_config.num_semcls,
                    num_angle_bin=dataset_config.num_angle_bin,
                )
    else:
        raise ValueError(f"unknown dataset {name}")
    return datasets, dataset_config
