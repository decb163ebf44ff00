"""Training / evaluation entry point.

Counterpart of the reference's main.py + engine.py epoch loops
(reference main.py:28-506, engine.py:47-302): argparse surface with the
same knobs, cosine-warmup schedule, latest/best/periodic checkpoints,
resume-on-restart, idempotent final_eval guard, approximate train-time AP
and exact eval AP, and a NaN-loss abort.

Single process regardless of device count: data parallelism is a mesh +
GSPMD, not torch.multiprocessing.spawn (reference main.py:490-506).
"""
from __future__ import annotations

import argparse
import math
import os
import pickle
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ov3det.config import (
    DataConfig,
    DecoderConfig,
    EncoderConfig,
    LossConfig,
    MatcherConfig,
    ModelConfig,
    OptimConfig,
    TeacherConfig,
    TrainConfig,
)
from ov3det.datasets.loader import DataLoader, slice_valid, valid_count
from ov3det.datasets.registry import build_dataset
from ov3det.engine import (
    CheckpointManager,
    PreemptionGuard,
    build_training,
    restore_eval_checkpoint,
)
from ov3det.eval import APCalculator
from ov3det.models import Model3DETR
from ov3det.parallel import batch_sharding, make_mesh, replicate
from ov3det.utils import Logger, SmoothedValue


def make_args_parser():
    p = argparse.ArgumentParser("TPU-native open-vocabulary 3D detection")
    # Optimizer (reference main.py:31-41)
    p.add_argument("--base_lr", default=5e-4, type=float)
    p.add_argument("--warm_lr", default=1e-6, type=float)
    p.add_argument("--warm_lr_epochs", default=9, type=int)
    p.add_argument("--final_lr", default=1e-6, type=float)
    p.add_argument("--weight_decay", default=0.1, type=float)
    p.add_argument("--filter_biases_wd", default=False, action="store_true")
    p.add_argument("--clip_gradient", default=0.1, type=float)
    # Encoder (reference main.py:52-62)
    p.add_argument("--enc_type", default="vanilla", choices=["masked", "vanilla"])
    p.add_argument("--enc_nlayers", default=3, type=int)
    p.add_argument("--enc_dim", default=256, type=int)
    p.add_argument("--enc_ffn_dim", default=128, type=int)
    p.add_argument("--enc_dropout", default=0.1, type=float)
    p.add_argument("--enc_nhead", default=4, type=int)
    p.add_argument("--enc_activation", default="relu", type=str)
    # Decoder (reference main.py:64-69)
    p.add_argument("--dec_nlayers", default=8, type=int)
    p.add_argument("--dec_dim", default=256, type=int)
    p.add_argument("--dec_ffn_dim", default=256, type=int)
    p.add_argument("--dec_dropout", default=0.1, type=float)
    p.add_argument("--dec_nhead", default=4, type=int)
    # Other model params (reference main.py:71-86)
    p.add_argument("--mlp_dropout", default=0.3, type=float)
    p.add_argument("--preenc_npoints", default=2048, type=int)
    p.add_argument("--pos_embed", default="fourier", choices=["fourier", "sine"])
    p.add_argument("--nqueries", default=256, type=int)
    p.add_argument("--use_color", default=False, action="store_true")
    p.add_argument("--compute_dtype", default="float32", choices=["float32", "bfloat16"])
    # Matcher / losses (reference main.py:89-105)
    p.add_argument("--matcher_giou_cost", default=2, type=float)
    p.add_argument("--matcher_cls_cost", default=1, type=float)
    p.add_argument("--matcher_center_cost", default=0, type=float)
    p.add_argument("--matcher_objectness_cost", default=0, type=float)
    p.add_argument("--loss_giou_weight", default=0, type=float)
    p.add_argument("--matcher_giou", default="rotated",
                   choices=["rotated", "axis_aligned"],
                   help="GIoU flavor for the matcher COST matrix on rotated-"
                   "box datasets; the GIoU loss stays exact either way. "
                   "axis_aligned is a speed knob that costs measurable AP "
                   "on rotated datasets (see config.py LossConfig)")
    p.add_argument("--loss_sem_cls_weight", default=1, type=float)
    p.add_argument("--loss_no_object_weight", default=0.2, type=float)
    p.add_argument("--loss_angle_cls_weight", default=0.1, type=float)
    p.add_argument("--loss_angle_reg_weight", default=0.5, type=float)
    p.add_argument("--loss_center_weight", default=5.0, type=float)
    p.add_argument("--loss_size_weight", default=1.0, type=float)
    p.add_argument("--loss_2dalignment_weight", default=0.0, type=float)
    # Dataset (reference main.py:107-176)
    p.add_argument("--dataset_name", required=True,
                   choices=["scannet", "sunrgbd", "synthetic"])
    p.add_argument("--dataset_root_dir", type=str, default=None)
    p.add_argument("--meta_data_dir", type=str, default=None)
    p.add_argument("--dataset_num_workers", default=4, type=int)
    p.add_argument("--batchsize_per_gpu", default=8, type=int)
    p.add_argument("--super_batch", default=1, type=int,
                   help="group G batches into one H2D transfer + one "
                   "scanned train dispatch (single-device runs; per-iter "
                   "logging coarsens to every G iters)")
    p.add_argument("--quantize_points", default=False, action="store_true",
                   help="ship point clouds as per-sample uint16 on the "
                   "packed H2D path (~0.1 mm quantization noise; halves "
                   "the transfer on bandwidth-bound links)")
    p.add_argument("--yuv_images", default=False, action="store_true",
                   help="ship uint8 RGB canvases as 4:2:0 YUV on the packed "
                   "H2D path (halves the image bytes; lossless vs the "
                   "4:2:0-JPEG SUN RGB-D sources' chroma content)")
    p.add_argument("--image_bank", default=False, action="store_true",
                   help="upload every training scene's yuv420 canvas to the "
                   "device ONCE at startup and ship a 4-byte image_ref per "
                   "sample instead (zero steady-state image H2D; ~0.58 MB "
                   "HBM/scene — full SUN RGB-D train is ~3 GB); needs "
                   "--use_image")
    p.add_argument("--num_points", default=None, type=int)
    p.add_argument("--pseudo_label_dir", type=str, default=None)
    p.add_argument("--clip_embed_path", type=str, default=None)
    p.add_argument("--region_clip_ckpt_path", type=str, default=None)
    p.add_argument("--teacher_compute_dtype", type=str, default="int8",
                   choices=["int8", "bfloat16", "float32"],
                   help="compute dtype of the frozen RegionCLIP tower "
                   "(int8 = W8A8 trunk convs on the MXU, the TPU-fast "
                   "default — fidelity golden-tested at width 80; "
                   "bf16 = conservative fast mode; f32 = parity mode)")
    p.add_argument("--feature_2d_dir", type=str, default=None)
    p.add_argument("--use_pbox", default=False, action="store_true")
    p.add_argument("--use_2d_feature", default=False, action="store_true",
                   help="load per-point 2D features with the scenes; NOTE: "
                   "no training path consumes them (faithful to the "
                   "reference, which also loads and drops them)")
    p.add_argument("--use_image", default=False, action="store_true")
    p.add_argument("--frames_dir", type=str, default=None,
                   help="ScanNet frames tree (color/depth/pose per scan) for "
                   "--use_image; the reference hardcodes this path "
                   "(datasets/scannet.py:28)")
    p.add_argument("--max_frames", default=64, type=int)
    # Training (reference main.py:178-196)
    p.add_argument("--start_epoch", default=-1, type=int)
    p.add_argument("--max_epoch", default=720, type=int)
    p.add_argument("--eval_every_epoch", default=10, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--test_only", default=False, action="store_true")
    p.add_argument("--test_ckpt", default=None, type=str)
    p.add_argument("--checkpoint_dir", default=None, type=str)
    p.add_argument("--log_every", default=10, type=int)
    p.add_argument("--log_metrics_every", default=20, type=int)
    p.add_argument("--save_separate_checkpoint_every_epoch", default=100, type=int)
    p.add_argument("--ngpus", default=1, type=int, help="data-parallel devices")
    # Observability (SURVEY §5.1/5.2)
    p.add_argument("--profile_dir", default=None, type=str,
                   help="write a jax.profiler trace of the first "
                   "--profile_steps train iterations here (TensorBoard/xprof)")
    p.add_argument("--profile_steps", default=5, type=int)
    p.add_argument("--eval_loss", default=False, action="store_true",
                   help="compute the (teacher-free) criterion during "
                   "in-training evals and log Test_details/ losses "
                   "(reference engine.py:198-206)")
    p.add_argument("--debug_nans", default=False, action="store_true",
                   help="enable jax_debug_nans (per-op NaN tracebacks; the "
                   "reference's anomaly-mode equivalent, slows every step)")
    # Multi-host (one python process per host; reference main.py:405-411
    # spawns one process per GPU with NCCL instead)
    p.add_argument("--coordinator_address", default=None, type=str)
    p.add_argument("--num_processes", default=None, type=int)
    p.add_argument("--process_id", default=None, type=int)
    return p


def config_from_args(args) -> TrainConfig:
    num_semcls = {"scannet": 18, "sunrgbd": 20, "synthetic": 18}[args.dataset_name]
    num_angle_bin = {"scannet": 1, "sunrgbd": 12, "synthetic": 1}[args.dataset_name]
    num_points = args.num_points or {"scannet": 40000, "sunrgbd": 20000,
                                     "synthetic": 2048}[args.dataset_name]
    return TrainConfig(
        model=ModelConfig(
            encoder=EncoderConfig(
                kind=args.enc_type,
                num_layers=args.enc_nlayers,
                dim=args.enc_dim,
                ffn_dim=args.enc_ffn_dim,
                num_heads=args.enc_nhead,
                dropout=args.enc_dropout,
                activation=args.enc_activation,
            ),
            decoder=DecoderConfig(
                num_layers=args.dec_nlayers,
                dim=args.dec_dim,
                ffn_dim=args.dec_ffn_dim,
                num_heads=args.dec_nhead,
                dropout=args.dec_dropout,
            ),
            preenc_npoints=args.preenc_npoints,
            num_queries=args.nqueries,
            mlp_dropout=args.mlp_dropout,
            pos_embed=args.pos_embed,
            use_color=args.use_color,
            num_semcls=num_semcls,
            num_angle_bin=num_angle_bin,
            compute_dtype=args.compute_dtype,
        ),
        loss=LossConfig(
            matcher=MatcherConfig(
                cost_class=args.matcher_cls_cost,
                cost_objectness=args.matcher_objectness_cost,
                cost_center=args.matcher_center_cost,
                cost_giou=args.matcher_giou_cost,
            ),
            giou_weight=args.loss_giou_weight,
            matcher_giou=args.matcher_giou,
            sem_cls_weight=args.loss_sem_cls_weight,
            no_object_weight=args.loss_no_object_weight,
            angle_cls_weight=args.loss_angle_cls_weight,
            angle_reg_weight=args.loss_angle_reg_weight,
            center_weight=args.loss_center_weight,
            size_weight=args.loss_size_weight,
            alignment_2d_weight=args.loss_2dalignment_weight,
        ),
        optim=OptimConfig(
            base_lr=args.base_lr,
            warm_lr=args.warm_lr,
            warm_lr_epochs=args.warm_lr_epochs,
            final_lr=args.final_lr,
            weight_decay=args.weight_decay,
            filter_biases_wd=args.filter_biases_wd,
            clip_gradient=args.clip_gradient,
        ),
        data=DataConfig(
            dataset_name=args.dataset_name,
            root_dir=args.dataset_root_dir,
            meta_data_dir=args.meta_data_dir,
            pseudo_label_dir=args.pseudo_label_dir,
            feature_2d_dir=args.feature_2d_dir,
            num_points=num_points,
            use_color=args.use_color,
            use_image=args.use_image,
            frames_dir=args.frames_dir,
            max_frames=args.max_frames,
            use_pbox=args.use_pbox,
            use_2d_feature=args.use_2d_feature,
            num_workers=args.dataset_num_workers,
            batch_size_per_device=args.batchsize_per_gpu,
            super_batch=args.super_batch,
            quantize_points=args.quantize_points,
            yuv_images=args.yuv_images,
            image_bank=args.image_bank,
        ),
        teacher=TeacherConfig(
            enabled=args.use_image,
            checkpoint_path=args.region_clip_ckpt_path,
            text_embed_path=args.clip_embed_path,
            compute_dtype=args.teacher_compute_dtype,
        ),
        max_epoch=args.max_epoch,
        eval_every_epoch=args.eval_every_epoch,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        log_every=args.log_every,
        log_metrics_every=args.log_metrics_every,
        save_separate_checkpoint_every_epoch=args.save_separate_checkpoint_every_epoch,
        num_devices=args.ngpus,
        profile_dir=args.profile_dir,
        profile_steps=args.profile_steps,
        debug_nans=args.debug_nans,
        eval_loss=args.eval_loss,
    )


def load_text_embed(path, num_semcls, embed_dim):
    """Load the frozen CLIP text-embedding matrix (reference
    models/model_3detr.py:417-419 loads a torch .pth; .npy accepted too)."""
    if path is None:
        return None
    if path.endswith(".npy"):
        emb = np.load(path)
    else:
        import torch

        emb = torch.load(path, map_location="cpu").float().numpy()
    assert emb.shape == (num_semcls + 1, embed_dim), emb.shape
    return jnp.asarray(emb)


def build_teacher_fn(cfg, example_batch):
    """Construct the frozen RegionCLIP teacher hook for the 2D-alignment
    loss (reference criterion.py:363-399 runs it inside the criterion)."""
    from ov3det.models.regionclip import (
        RegionCLIPTeacher,
        convert_torch_checkpoint,
        make_teacher_fn,
        quantize_teacher_params,
    )

    dtype = cfg.teacher.compute_dtype
    teacher = RegionCLIPTeacher(
        embed_dim=cfg.model.clip_embed_dim,
        compute_dtype=dtype if dtype != "float32" else None,
    )
    if cfg.teacher.checkpoint_path:
        variables = convert_torch_checkpoint(cfg.teacher.checkpoint_path)
    else:
        print("WARNING: no --region_clip_ckpt_path; teacher runs with random "
              "weights (distillation targets are meaningless)")
        img = jnp.asarray(example_batch["image"][:1])
        boxes = jnp.zeros((1, 1, 4), jnp.float32)
        # init the FLOAT tower (quantize_teacher_params consumes f32
        # kernels); param shapes don't depend on the compute dtype
        f32_teacher = teacher.clone(compute_dtype=None)
        variables = jax.jit(
            lambda: f32_teacher.init(jax.random.PRNGKey(0), img, boxes)
        )()
    # int8 -> W8A8-quantize the trunk convs (+bf16 the rest) and calibrate
    # static activation scales on a REAL canvas from the example batch;
    # other dtypes fall through to plain cast_teacher_params semantics
    calib = None
    if dtype == "int8":
        img_np = np.asarray(example_batch["image"][:1], np.float32)
        h = float(example_batch["image_height"][0])
        w = float(example_batch["image_width"][0])
        rng = np.random.default_rng(0)
        x1 = rng.uniform(0, w * 0.5, size=(1, 8)).astype(np.float32)
        y1 = rng.uniform(0, h * 0.5, size=(1, 8)).astype(np.float32)
        calib_boxes = np.stack(
            [x1, y1,
             np.minimum(x1 + rng.uniform(8, w * 0.5, (1, 8)), w - 1.0),
             np.minimum(y1 + rng.uniform(8, h * 0.5, (1, 8)), h - 1.0)],
            axis=-1,
        ).astype(np.float32)
        calib = (img_np, calib_boxes)
    variables = quantize_teacher_params(variables, dtype, teacher=teacher,
                                        calib=calib)
    return make_teacher_fn(teacher, per_layer=cfg.loss.teacher_per_layer), variables


def evaluate(cfg, eval_step, state, loader, dataset_config, exact=True,
             eval_processes: int = 0, logger=None, curr_iter=0):
    # eval_processes=0: the vectorized per-scan IoU makes the per-class AP
    # loop fast enough single-process; a >0 value fans out like the
    # reference's Pool(10) (utils/eval_det.py:253) but forks a JAX process.
    ap = APCalculator(
        dataset_config=dataset_config,
        ap_iou_thresh=[0.25, 0.5],
        class2type_map=dataset_config.class2type,
        exact_eval=exact,
        eval_processes=eval_processes,
    )
    loss_meter = SmoothedValue(10)
    last_loss_dict = None
    for batch in loader:
        outputs = eval_step(state, batch)
        if isinstance(outputs, tuple):  # --eval_loss: (outputs, loss_dict)
            outputs, last_loss_dict = outputs
            loss_meter.update(float(last_loss_dict["loss"]))
        # partial final batch: loader padded it to the fixed jit shape by
        # repeating the last sample — strip the pad so each scan scores once
        # (reference torch DataLoader keeps the partial batch itself)
        n = valid_count(batch)
        ap.step_meter(slice_valid(outputs, n), slice_valid(batch, n))
    if logger is not None and last_loss_dict is not None:
        # reference logs the last batch's loss breakdown under Test_details/
        # and the smoothed total under Test/ (engine.py:226-229)
        logger.log_scalars(
            {k: float(v) for k, v in last_loss_dict.items()},
            curr_iter, prefix="Test_details/",
        )
        logger.log_scalars({"loss": loss_meter.avg}, curr_iter, prefix="Test/")
    return ap


def do_train(cfg: TrainConfig, args=None):
    # multi-host sanity: a SingleDeviceSharding is never a valid global
    # sharding for jax.make_array_from_process_local_data, so a multi-process
    # run must shard over >= process_count devices (and evenly, so each host
    # owns a whole slice) — fail here with a clear message instead of deep
    # inside the loader
    if jax.process_count() > 1 and (
        cfg.num_devices < jax.process_count()
        or cfg.num_devices % jax.process_count() != 0
    ):
        raise ValueError(
            f"multi-host run with {jax.process_count()} processes needs "
            f"num_devices (--ngpus) to be a positive multiple of the process "
            f"count, got {cfg.num_devices}"
        )
    mesh = make_mesh(cfg.num_devices) if cfg.num_devices > 1 else None
    # single-device: packed single-buffer transfer (one H2D put + on-device
    # unpack per batch — per-array puts contend with in-flight step
    # execution on remote transports, see datasets/loader.py); multi-device
    # keeps per-array tree placement (batch-sharded over the mesh)
    if mesh:
        sharding, transfer = batch_sharding(mesh), "tree"
    else:
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        transfer = "packed" if jax.process_count() == 1 else "tree"

    datasets, dataset_config = build_dataset(cfg.data)
    image_bank = image_bank_hw = None
    if cfg.data.image_bank:
        # device-resident canvases for the frozen teacher: encode + upload
        # once here (like the teacher weights), train batches then carry a
        # 4-byte image_ref each (datasets/image_bank.py); the bank rides
        # state.frozen so mesh replication and checkpoint-stripping treat
        # it exactly like the teacher tree
        assert cfg.data.use_image and cfg.teacher.enabled, (
            "--image_bank needs --use_image (the bank feeds the 2D teacher)"
        )
        from ov3det.datasets import BankRefDataset, build_image_bank

        image_bank, image_bank_hw = build_image_bank(datasets["train"])
        datasets = {**datasets, "train": BankRefDataset(datasets["train"])}
    train_transfer = "packed_device" if transfer == "packed" else transfer
    super_batch = cfg.data.super_batch if train_transfer == "packed_device" else 1
    train_loader = DataLoader(
        datasets["train"],
        batch_size=cfg.data.batch_size_per_device * cfg.num_devices,
        shuffle=True,
        num_workers=cfg.data.num_workers,
        seed=cfg.seed,
        sharding=sharding,
        # train hot loop: unpack fuses into the step (one dispatch/batch);
        # super_batch>1 groups G batches into one put + one scan dispatch
        transfer=train_transfer,
        super_batch=super_batch,
        quantize=(
            (("point_clouds",) if cfg.data.quantize_points else ())
            + (("image",) if cfg.data.yuv_images else ())
            if train_transfer != "tree"
            else ()
        ),
    )
    test_loader = DataLoader(
        datasets["test"],
        batch_size=cfg.data.batch_size_per_device * cfg.num_devices,
        shuffle=False,
        drop_last=False,
        num_workers=cfg.data.num_workers,
        sharding=sharding,
        transfer=transfer,
    )

    model = Model3DETR(cfg.model)
    example = next(iter(test_loader))
    inputs = {
        "point_clouds": jnp.asarray(example["point_clouds"]),
        "point_cloud_dims_min": jnp.asarray(example["point_cloud_dims_min"]),
        "point_cloud_dims_max": jnp.asarray(example["point_cloud_dims_max"]),
    }
    text_embed = load_text_embed(
        cfg.teacher.text_embed_path, cfg.model.num_semcls, cfg.model.clip_embed_dim
    )
    teacher_fn, teacher_vars = (
        build_teacher_fn(cfg, example) if cfg.teacher.enabled else (None, None)
    )
    state, train_step, eval_step, schedule = build_training(
        cfg,
        model,
        inputs,
        iters_per_epoch=len(train_loader),
        rng=jax.random.PRNGKey(cfg.seed),
        text_embed=text_embed,
        teacher_fn=teacher_fn,
        teacher_vars=teacher_vars,
        eval_loss=cfg.eval_loss,
        image_bank=image_bank,
        image_bank_hw=image_bank_hw,
    )
    if mesh:
        state = replicate(state, mesh)

    from ov3det.engine.train import make_packed_group_step, make_packed_step

    packed_step = make_packed_step(train_step)
    group_step = make_packed_group_step(train_step)

    def run_step(state, item, key):
        """Dispatch one train step (or one G-batch group) per loader item."""
        if isinstance(item, tuple):  # packed_device: (device buf, metas)
            if item[0].ndim == 2:  # (G, nbytes) super-batch group
                return group_step(state, item[0], item[1], key)
            return packed_step(state, item[0], item[1], key)
        return train_step(state, item, key)

    def item_batches(item) -> int:
        """How many train batches one loader item carries."""
        if isinstance(item, tuple) and item[0].ndim == 2:
            return int(item[0].shape[0])
        return 1

    def last_metrics(metrics) -> dict:
        """Scalars of the LAST sub-step for (possibly (G,)-stacked) metrics."""
        return {k: float(np.asarray(v).ravel()[-1]) for k, v in metrics.items()}

    assert cfg.checkpoint_dir, "set --checkpoint_dir"
    ckpt = CheckpointManager(cfg.checkpoint_dir)
    restored, loaded_epoch, extra = ckpt.restore(jax.device_get(state))
    # reference persists best_val_metrics inside checkpoint.pth and restores
    # it on resume (utils/io.py:33-58) so a preemption-resume never lets a
    # worse eval overwrite checkpoint_best
    best_ap25 = float((extra or {}).get("best_ap25", -1.0))
    if restored is not None:
        state = replicate(restored, mesh) if mesh else jax.device_put(restored)
        print(f"resumed from epoch {loaded_epoch} (best AP25 {best_ap25:.4f})")
    start_epoch = loaded_epoch + 1

    final_eval = os.path.join(cfg.checkpoint_dir, "final_eval.txt")
    final_eval_pkl = os.path.join(cfg.checkpoint_dir, "final_eval.pkl")
    if os.path.isfile(final_eval):
        print(f"Found final eval file {final_eval}. Skipping training.")
        return state

    logger = Logger(cfg.checkpoint_dir)
    guard = PreemptionGuard()
    best_metrics = {}
    iters_per_epoch = len(train_loader)
    max_iters = cfg.max_epoch * iters_per_epoch

    for epoch in range(start_epoch, cfg.max_epoch):
        train_loader.set_epoch(epoch)
        time_meter, loss_meter = SmoothedValue(10), SmoothedValue(10)
        train_ap = APCalculator(
            dataset_config=dataset_config,
            ap_iou_thresh=[0.25, 0.5],
            class2type_map=dataset_config.class2type,
            exact_eval=False,
            eval_processes=0,
        )
        it = 0  # batch index within the epoch (items may carry G batches)
        prof_on = False
        for item in train_loader:
            if guard.should_stop:
                # preemption: persist the latest state and exit cleanly
                ckpt.save_latest(state, epoch - 1, extra={"best_ap25": best_ap25})
                print("preemption signal received; checkpoint saved, exiting")
                return state
            t0 = time.time()
            g = item_batches(item)
            # iter bookkeeping refers to the LAST batch this item carries
            curr_iter = epoch * iters_per_epoch + it + g - 1
            global_it = curr_iter - start_epoch * iters_per_epoch
            if cfg.profile_dir and not prof_on and global_it >= 1:
                os.makedirs(cfg.profile_dir, exist_ok=True)  # skip compile it
                jax.profiler.start_trace(cfg.profile_dir)
                prof_on = True
            # per-iter key built HOST-side: an old-style PRNG key is just a
            # uint32[2] array ([seed, iter] is a distinct key per step), and
            # jax.random.PRNGKey/fold_in are each a device dispatch — two
            # extra RPCs per item on the remote-tunnel runtime.  Sub-step
            # derivation (fold_in(key, g)) happens INSIDE the jitted step.
            state, metrics = run_step(
                state, item,
                np.array([cfg.seed & 0xFFFFFFFF,
                          epoch * iters_per_epoch + it], np.uint32),
            )
            if (cfg.profile_dir and prof_on
                    and global_it >= 1 + cfg.profile_steps):
                jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
                print(f"profiler trace written to {cfg.profile_dir}")
                prof_on = False
            crossed = (curr_iter // cfg.log_metrics_every
                       > (curr_iter - g) // cfg.log_metrics_every)
            if crossed or curr_iter % cfg.log_metrics_every == 0:
                batch = DataLoader.unpack(item)  # last sub-batch of the item
                outputs = eval_step(state, batch)
                if isinstance(outputs, tuple):  # --eval_loss variant
                    outputs = outputs[0]
                train_ap.step_meter(outputs, batch)
            crossed = (curr_iter // cfg.log_every
                       > (curr_iter - g) // cfg.log_every)
            if crossed or curr_iter % cfg.log_every == 0:
                scalars = last_metrics(metrics)  # host sync, amortized
                loss = scalars["loss"]
                if not math.isfinite(loss):
                    print("Loss is not finite. Training stopped.")
                    sys.exit(1)
                loss_meter.update(loss)
                time_meter.update((time.time() - t0) / g)
                lr = float(schedule(jnp.asarray(curr_iter)))
                eta = (max_iters - curr_iter) * time_meter.avg
                print(
                    f"Epoch [{epoch}/{cfg.max_epoch}]; Iter [{curr_iter}/{max_iters}]; "
                    f"Loss {loss_meter.avg:0.2f}; LR {lr:0.2e}; "
                    f"Iter time {time_meter.avg:0.2f}; ETA {eta:0.0f}s"
                )
                logger.log_scalars(
                    scalars, curr_iter, prefix="Train_details/",
                )
                logger.log_scalars(
                    {"lr": lr, "loss": loss_meter.avg, "batch_time": time_meter.avg},
                    curr_iter,
                    prefix="Train/",
                )
            it += g

        ckpt.save_latest(state, epoch, extra={"best_ap25": best_ap25})
        if (
            epoch > 0
            and cfg.save_separate_checkpoint_every_epoch > 0
            and epoch % cfg.save_separate_checkpoint_every_epoch == 0
        ):
            ckpt.save_periodic(state, epoch)

        metrics_all = train_ap.compute_metrics()
        print(
            f"Epoch [{epoch}/{cfg.max_epoch}] train "
            + train_ap.metrics_to_str(metrics_all, per_class=False)
        )
        logger.log_scalars(
            train_ap.metrics_to_dict(metrics_all),
            epoch * iters_per_epoch,
            prefix="Train/",
        )

        if epoch % cfg.eval_every_epoch == 0 or epoch == cfg.max_epoch - 1:
            ap = evaluate(cfg, eval_step, state, test_loader, dataset_config,
                          logger=logger, curr_iter=epoch * iters_per_epoch)
            m = ap.compute_metrics()
            ap25 = m[0.25]["mAP"]
            print(f"Evaluate Epoch [{epoch}/{cfg.max_epoch}]")
            print(ap.metrics_to_str(m, per_class=True))
            logger.log_scalars(
                ap.metrics_to_dict(m), epoch * iters_per_epoch, prefix="Test/"
            )
            if ap25 > best_ap25:
                best_ap25 = ap25
                best_metrics = m
                ckpt.save_best(state, epoch, extra={"best_ap25": best_ap25})
                # refresh the latest checkpoint's bookkeeping too: it was
                # written before this eval, and resume reads best_ap25 from it
                ckpt.write_extra({"best_ap25": best_ap25})
                print(f"saved new best checkpoint (AP25 {ap25:.4f})")

    # final eval
    ap = evaluate(cfg, eval_step, state, test_loader, dataset_config)
    m = ap.compute_metrics()
    with open(final_eval, "w") as fh:
        fh.write("Training Finished.\nFinal Eval Numbers.\n")
        fh.write(ap.metrics_to_str(m))
        fh.write("\nBest Eval Numbers.\n")
        fh.write(ap.metrics_to_str(best_metrics) if best_metrics else "n/a")
    with open(final_eval_pkl, "wb") as fh:
        pickle.dump(m, fh)
    logger.close()
    return state


def test_model(cfg: TrainConfig, test_ckpt: str | None = None):
    datasets, dataset_config = build_dataset(cfg.data, splits=("test",))
    test_loader = DataLoader(
        datasets["test"],
        batch_size=cfg.data.batch_size_per_device,
        shuffle=False,
        drop_last=False,
        num_workers=cfg.data.num_workers,
        sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]),
        transfer="packed" if jax.process_count() == 1 else "tree",
    )
    model = Model3DETR(cfg.model)
    example = next(iter(test_loader))
    inputs = {
        "point_clouds": jnp.asarray(example["point_clouds"]),
        "point_cloud_dims_min": jnp.asarray(example["point_cloud_dims_min"]),
        "point_cloud_dims_max": jnp.asarray(example["point_cloud_dims_max"]),
    }
    state, _, eval_step, _ = build_training(
        cfg, model, inputs, iters_per_epoch=1, rng=jax.random.PRNGKey(cfg.seed)
    )
    restored, epoch = restore_eval_checkpoint(
        jax.device_get(state), test_ckpt, cfg.checkpoint_dir
    )
    state = jax.device_put(restored)
    ap = evaluate(cfg, eval_step, state, test_loader, dataset_config)
    m = ap.compute_metrics()
    print(f"Test model (epoch {epoch}); Metrics:")
    print(ap.metrics_to_str(m))
    return m


def main(argv=None):
    args = make_args_parser().parse_args(argv)
    cfg = config_from_args(args)
    # persistent compilation cache: a fresh process re-running the same
    # config skips the (minutes-long on a remote-tunnel TPU) XLA compiles
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    np.random.seed(cfg.seed)
    if cfg.debug_nans:
        # per-op NaN tracebacks (SURVEY §5.2: the opt-in equivalent of the
        # reference's always-on torch.autograd.set_detect_anomaly)
        jax.config.update("jax_debug_nans", True)
    if args.coordinator_address or args.num_processes:
        from ov3det.engine.runtime import init_multihost

        init_multihost(args.coordinator_address, args.num_processes,
                       args.process_id)
    if args.test_only:
        test_model(cfg, test_ckpt=args.test_ckpt)
    else:
        do_train(cfg, args)


if __name__ == "__main__":
    main()
