"""Pseudo-label generation entry point.

Counterpart of reference generate_pseudo_label.py:27-283 (without its
broken `build_ULIP` import, generate_pseudo_label.py:19): runs the trained
detector over the TRAIN split without augmentation, accumulates predictions
through the LabelFormatter, thresholds them per class, keeps boxes whose
contained points' modal semantic label matches, and writes `{scan}_bbox.npy`
pseudo-ground-truth files consumable via --use_pbox.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ov3det.datasets.loader import DataLoader, slice_valid, valid_count
from ov3det.datasets.registry import build_dataset
from ov3det.engine import build_training, restore_eval_checkpoint
from ov3det.main import config_from_args, make_args_parser
from ov3det.models import Model3DETR
from ov3det.tools.label_formatter import LabelFormatter


def make_pseudo_label_parser():
    p = make_args_parser()
    p.add_argument("--out_dir", type=str, required=False, default=None)
    p.add_argument("--label_dir", type=str, required=False, default=None,
                   help="per-scan point+semantic-label npy files")
    p.add_argument("--topk", default=100, type=int)
    p.add_argument("--conf_thresh", default=0.6, type=float)
    p.add_argument("--obj_thresh", default=0.9, type=float)
    return p


def run_inference(cfg, args) -> LabelFormatter:
    datasets, dataset_config = build_dataset(cfg.data, splits=("inference",))
    dataset = datasets["inference"]
    loader = DataLoader(
        dataset,
        batch_size=cfg.data.batch_size_per_device,
        shuffle=False,
        drop_last=False,
        num_workers=cfg.data.num_workers,
        sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]),
        transfer="packed" if jax.process_count() == 1 else "tree",
    )
    model = Model3DETR(cfg.model)
    example = next(iter(loader))
    inputs = {
        "point_clouds": jnp.asarray(example["point_clouds"]),
        "point_cloud_dims_min": jnp.asarray(example["point_cloud_dims_min"]),
        "point_cloud_dims_max": jnp.asarray(example["point_cloud_dims_max"]),
    }
    state, _, eval_step, _ = build_training(
        cfg, model, inputs, iters_per_epoch=1, rng=jax.random.PRNGKey(cfg.seed)
    )
    restored, epoch = restore_eval_checkpoint(
        jax.device_get(state), args.test_ckpt, cfg.checkpoint_dir
    )
    state = jax.device_put(restored)
    print(f"loaded checkpoint from epoch {epoch}")

    formatter = LabelFormatter(
        output_path=args.out_dir,
        label_path=args.label_dir,
        scene_list=dataset.scan_names,
        num_classes=cfg.model.num_semcls,
    )
    for batch in loader:
        outputs = eval_step(state, batch)
        # strip tail-padding of the final partial batch: a duplicated pad
        # sample would write its predictions twice into the same scan's rows
        n = valid_count(batch)
        formatter.step(slice_valid(outputs, n), slice_valid(batch, n))
    return formatter


def main(argv=None):
    args = make_pseudo_label_parser().parse_args(argv)
    cfg = config_from_args(args)
    try:  # persistent compile cache (see ov3det/main.py)
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    assert args.out_dir, "set --out_dir"
    os.makedirs(args.out_dir, exist_ok=True)
    formatter = run_inference(cfg, args)
    formatter.process(args.topk, args.conf_thresh, args.obj_thresh, processes=0)


if __name__ == "__main__":
    main()
