"""Single dataclass config tree for the whole framework.

Replaces the reference's two config systems — ~60 argparse flags
(reference main.py:28-198) plus a detectron2/yacs `opts` remainder for the
RegionCLIP teacher (reference main.py:157-164, models/model_regionclip.py:5-13)
— with one typed tree.  Defaults mirror the reference CLI defaults.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class EncoderConfig:
    """Transformer encoder (reference main.py:52-62)."""

    kind: str = "vanilla"  # "vanilla" | "masked"
    num_layers: int = 3
    dim: int = 256
    ffn_dim: int = 128
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "relu"
    # Euclidean-distance thresholds per masked layer. NOTE the reference
    # squares [0.4, 0.8, 1.2] and then compares the *unsquared* cdist against
    # them (models/model_3detr.py:393, models/transformer.py:152-159), so the
    # effective radii really are 0.16/0.64/1.44 — replicated verbatim.
    masking_radius: tuple[float, ...] = (0.4**2, 0.8**2, 1.2**2)


@dataclass(frozen=True)
class DecoderConfig:
    """Transformer decoder (reference main.py:64-69)."""

    num_layers: int = 8
    dim: int = 256
    ffn_dim: int = 256
    num_heads: int = 4
    dropout: float = 0.1


@dataclass(frozen=True)
class ModelConfig:
    """3DETR detector (reference main.py:43-86, models/model_3detr.py)."""

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    preenc_npoints: int = 2048
    num_queries: int = 256
    mlp_dropout: float = 0.3
    pos_embed: str = "fourier"  # "fourier" | "sine"
    use_color: bool = False
    num_semcls: int = 18
    num_angle_bin: int = 1
    clip_embed_dim: int = 640
    # pre-encoder set-abstraction (reference models/model_3detr.py:353-362)
    preenc_radius: float = 0.2
    preenc_nsample: int = 64
    preenc_mlp: tuple[int, ...] = (64, 128, 256)
    # masked-encoder interim downsampler (reference models/model_3detr.py:385-391)
    interim_radius: float = 0.4
    interim_nsample: int = 32
    interim_mlp: tuple[int, ...] = (256, 256, 256)
    # compute dtype for transformer matmuls ("float32" | "bfloat16")
    compute_dtype: str = "float32"
    # parallel-FPS shard counts (1 = exact greedy FPS; >1 cuts the serial
    # selection latency ~Sx with near-identical coverage, see ops.pointcloud)
    fps_shards: int = 4
    query_fps_shards: int = 4
    # neighborhood selection in the SA modules: "bucketed" (TPU-fast,
    # statistically equivalent under random point order) or "first_k"
    # (exact CUDA-kernel parity — used for checkpoint-parity evaluation)
    ball_query_method: str = "bucketed"


@dataclass(frozen=True)
class MatcherConfig:
    """Hungarian matcher costs (reference main.py:89-93)."""

    cost_class: float = 1.0
    cost_objectness: float = 0.0
    cost_center: float = 0.0
    cost_giou: float = 2.0


@dataclass(frozen=True)
class LossConfig:
    """Loss weights (reference main.py:95-105)."""

    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    giou_weight: float = 0.0
    sem_cls_weight: float = 1.0
    no_object_weight: float = 0.2
    angle_cls_weight: float = 0.1
    angle_reg_weight: float = 0.5
    center_weight: float = 5.0
    size_weight: float = 1.0
    alignment_2d_weight: float = 0.0
    # hoist the frozen 2D teacher out of the per-aux-layer loop (the
    # reference re-runs RegionCLIP for each of the 8 decoder layers,
    # criterion.py:434-442 — the dominant cost it flags itself)
    teacher_per_layer: bool = False
    # GIoU compute dtype ("bfloat16" halves the polygon-clip bandwidth at
    # ~0.4% relative area error; default is the reference-parity f32 —
    # opt into bf16 via --giou_compute_dtype in throughput-first runs)
    giou_compute_dtype: str = "float32"
    # GIoU flavor for the MATCHER COST matrix on rotated-box datasets:
    # "rotated" = exact polygon-clip over all (layer, query, gt) pairs —
    # reference parity (criterion.py:348-356) and the golden-test setting;
    # "axis_aligned" = enclosing-AABB GIoU for the cost only (the GIoU
    # *loss*, when active, stays exact rotated on the matched pairs).
    # On axis-aligned datasets (ScanNet) the two are identical.  Default is
    # the parity setting: a 2-seed synthetic probe (tests/
    # test_matcher_default.py scenario, 300 steps) reached AP25 0.123-0.126
    # with "rotated" vs 0.091-0.099 with "axis_aligned", so the cheap cost
    # is NOT quality-neutral on rotated datasets — treat it as an opt-in
    # speed knob, not the default.
    matcher_giou: str = "rotated"


@dataclass(frozen=True)
class OptimConfig:
    """AdamW + cosine schedule (reference main.py:31-41, engine.py:22-44)."""

    base_lr: float = 5e-4
    warm_lr: float = 1e-6
    warm_lr_epochs: int = 9
    final_lr: float = 1e-6
    weight_decay: float = 0.1
    filter_biases_wd: bool = False
    clip_gradient: float = 0.1


@dataclass(frozen=True)
class DataConfig:
    """Dataset selection and paths (reference main.py:107-176)."""

    dataset_name: str = "scannet"  # "scannet" | "sunrgbd" | "synthetic"
    root_dir: Optional[str] = None
    meta_data_dir: Optional[str] = None
    pseudo_label_dir: Optional[str] = None
    feature_2d_dir: Optional[str] = None
    num_points: int = 40000
    use_color: bool = False
    use_image: bool = False
    # ScanNet multi-frame image loading (reference datasets/scannet.py:276-285
    # hardcodes SCANNET_FRAMES_ROOT; here the frames tree is a config path)
    frames_dir: Optional[str] = None
    max_frames: int = 64
    use_pbox: bool = False
    use_2d_feature: bool = False
    num_workers: int = 4
    batch_size_per_device: int = 8
    max_num_obj: int = 64
    # group G batches into one H2D transfer + one scanned dispatch
    # (single-device packed path only; see datasets/loader.py super_batch)
    super_batch: int = 1
    # ship point clouds as per-sample-scaled uint16 on the packed H2D path
    # (~0.1 mm quantization noise, halves the transfer; loader.py q16 codec)
    quantize_points: bool = False
    # ship uint8 RGB canvases as 4:2:0 YUV on the packed H2D path (halves
    # the image bytes; SUN RGB-D sources are 4:2:0 JPEGs, so the dropped
    # chroma detail never existed in the files — loader.py yuv420 codec)
    yuv_images: bool = False
    # device-resident image bank: upload every scene's yuv420 canvas ONCE
    # at startup (~0.58 MB/scene of HBM; full SUN RGB-D train ~3 GB) and
    # ship a 4-byte image_ref per sample instead — steady-state steps move
    # zero image bytes host->device (datasets/image_bank.py)
    image_bank: bool = False


@dataclass(frozen=True)
class TeacherConfig:
    """Frozen RegionCLIP 2D teacher (reference main.py:144-156)."""

    enabled: bool = False
    checkpoint_path: Optional[str] = None
    text_embed_path: Optional[str] = None
    image_size: tuple[int, int] = (530, 730)
    # compute dtype of the frozen tower ("int8" | "bfloat16" | "float32").
    # The teacher carries no gradients, so int8 W8A8 trunk convs are the
    # production default (int32 MXU accumulation, measured 1.49-1.72x the
    # bf16 trunk on v5e; region-feature cosine vs f32 golden-tested at
    # width 80 in tests/test_teacher_parity.py).  Weights are quantized /
    # cast once at load — see models/regionclip.quantize_teacher_params.
    compute_dtype: str = "int8"


@dataclass(frozen=True)
class TrainConfig:
    """Top-level run config (reference main.py:178-196)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    data: DataConfig = field(default_factory=DataConfig)
    teacher: TeacherConfig = field(default_factory=TeacherConfig)
    max_epoch: int = 720
    eval_every_epoch: int = 10
    seed: int = 0
    checkpoint_dir: Optional[str] = None
    log_every: int = 10
    log_metrics_every: int = 20
    save_separate_checkpoint_every_epoch: int = 100
    # parallelism: data-parallel mesh size (1 = single chip)
    num_devices: int = 1
    # observability (SURVEY §5.1/5.2): jax.profiler trace of the first
    # profile_steps training iterations, written under profile_dir; and the
    # jax_debug_nans opt-in (the reference's always-on
    # torch.autograd.set_detect_anomaly equivalent, main.py:499)
    profile_dir: Optional[str] = None
    profile_steps: int = 5
    debug_nans: bool = False
    # compute the (teacher-free) criterion during in-training evals and log
    # Test_details/ losses like the reference (engine.py:198-206, 226-229)
    eval_loss: bool = False


def replace(cfg, **kw):
    """Functional update helper for frozen dataclasses."""
    return dataclasses.replace(cfg, **kw)


# Canned run configs mirroring reference scripts/*.sh
def scannet_quick() -> TrainConfig:
    """reference scripts/scannet_quick.sh"""
    return TrainConfig(
        model=ModelConfig(num_semcls=18, num_angle_bin=1, num_queries=256,
                          compute_dtype="bfloat16"),
        loss=LossConfig(giou_weight=1.0),
        data=DataConfig(dataset_name="scannet", num_points=40000),
        max_epoch=90,
    )


def sunrgbd_quick() -> TrainConfig:
    """reference scripts/sunrgbd_quick.sh (giou weight 0; matcher center/obj 5)"""
    return TrainConfig(
        model=ModelConfig(num_semcls=20, num_angle_bin=12, num_queries=128,
                          compute_dtype="bfloat16"),
        loss=LossConfig(
            matcher=MatcherConfig(
                cost_class=1.0, cost_objectness=5.0, cost_center=5.0, cost_giou=3.0
            ),
            giou_weight=0.0,
        ),
        data=DataConfig(dataset_name="sunrgbd", num_points=20000),
        max_epoch=90,
    )
