"""Jitted train/eval steps and the epoch loop.

Counterpart of the reference's engine.py + optimizer.py:
  * one fused XLA program per training step — forward, criterion (incl. the
    Hungarian matcher and GIoU), backward, grad clip, AdamW update, LR
    schedule — versus the reference's python loop with per-iteration
    host syncs (engine.py:47-150: `.item()` loss checks, CPU Hungarian,
    Cython GIoU);
  * data parallelism by sharding the batch over a `data` mesh axis;
    gradient all-reduce is inserted by GSPMD (no DDP wrapper);
  * NaN handling: loss finiteness is checked only when metrics are pulled
    to the host (reference aborts on NaN every step, engine.py:107-109 —
    same abort semantics, amortized sync).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ov3det.config import LossConfig, OptimConfig
from ov3det.engine.schedule import make_lr_schedule
from ov3det.losses import set_criterion
from ov3det.models import Model3DETR


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    frozen: Any
    opt_state: Any


def build_optimizer(cfg: OptimConfig, schedule: Callable):
    """AdamW with optional weight-decay filtering of biases/1-D params
    (reference optimizer.py:5-27) and global-norm gradient clipping
    (reference engine.py:112-113)."""

    def wd_mask(params):
        return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)

    tx = optax.adamw(
        learning_rate=schedule,
        weight_decay=cfg.weight_decay,
        mask=wd_mask if cfg.filter_biases_wd else None,
    )
    if cfg.clip_gradient > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_gradient), tx)
    return tx


def create_train_state(
    model: Model3DETR,
    tx,
    example_inputs: dict,
    rng: jax.Array,
    text_embed: Optional[jnp.ndarray] = None,
    teacher_vars: Optional[Any] = None,
    image_bank: Optional[jnp.ndarray] = None,
) -> TrainState:
    # jit the initializer: eager init dispatches thousands of tiny ops,
    # which is pathological over a remote-device transport
    variables = jax.jit(partial(model.init, train=False))(rng, example_inputs)
    frozen = dict(variables.get("frozen", {}))
    if text_embed is not None:
        frozen["text_embed"] = jnp.asarray(text_embed)
    if teacher_vars is not None:
        # frozen 2D-teacher weights ride in the state so the jitted step
        # receives them as arguments — NOT as embedded HLO constants (an
        # RN50x4 tree inflates the program to ~350MB otherwise); the
        # checkpointer strips this key (see engine/checkpoint.py)
        frozen["teacher2d"] = teacher_vars
    if image_bank is not None:
        # device-resident yuv420 canvases for the frozen teacher (static
        # per scene — datasets/image_bank.py); stripped at checkpoint like
        # the teacher weights
        frozen["image_bank"] = image_bank
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        frozen=frozen,
        opt_state=tx.init(params),
    )


def _decode_banked_images(batch: dict, frozen: dict, hw) -> dict:
    """Reconstruct batch["image"] from the device-resident bank.

    Bank mode (datasets/image_bank.py): batches carry a 4-byte image_ref
    per sample instead of the ~0.58 MB encoded canvas; the gather + yuv
    decode fuse into the train step, and steady-state steps move zero
    image bytes host->device.  `hw` is the static canvas geometry."""
    if hw is None or "image_ref" not in batch or "image" in batch:
        return batch
    from ov3det.datasets.loader import yuv420_decode_rows

    rows = jnp.take(frozen["image_bank"], batch["image_ref"], axis=0)
    batch = dict(batch)
    batch["image"] = yuv420_decode_rows(
        rows, (batch["image_ref"].shape[0], hw[0], hw[1], 3)
    )
    return batch


def make_train_step(
    model: Model3DETR,
    tx,
    loss_cfg: LossConfig,
    num_angle_bin: int,
    num_semcls: int,
    teacher_fn: Optional[Callable] = None,
    image_bank_hw: Optional[tuple] = None,
):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    teacher_fn: optional callable (teacher_vars, batch, outputs) ->
    (B, Q, C) frozen 2D-teacher region features for the distillation loss;
    its weights come from state.frozen["teacher2d"].  image_bank_hw: the
    (H, W) canvas geometry when images ride the device-resident bank
    (state.frozen["image_bank"]) instead of the batch.
    """

    def loss_fn(params, state, batch, rng):
        if teacher_fn is not None:
            batch = _decode_banked_images(batch, state.frozen, image_bank_hw)
        inputs = {
            "point_clouds": batch["point_clouds"],
            "point_cloud_dims_min": batch["point_cloud_dims_min"],
            "point_cloud_dims_max": batch["point_cloud_dims_max"],
        }
        outputs, updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats, "frozen": state.frozen},
            inputs,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        teacher_feats = (
            teacher_fn(state.frozen["teacher2d"], batch, outputs)
            if teacher_fn is not None
            else None
        )
        total, loss_dict = set_criterion(
            outputs,
            batch,
            loss_cfg,
            num_angle_bin=num_angle_bin,
            num_semcls=num_semcls,
            teacher_feats=teacher_feats,
        )
        return total, (loss_dict, updates["batch_stats"])

    @jax.jit
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        (loss, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = dict(loss_dict)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_packed_step(train_step):
    """Fuse the packed-batch unpack into the train step.

    For DataLoader(transfer="packed_device"): the loader yields
    (device uint8 buffer, metas) and this wrapper unpacks INSIDE the same
    jitted program — one dispatch per batch instead of unpack + step.  On
    remote-device transports each extra dispatch against a busy device
    costs 15-30ms of host-side serialization; on local hardware this is
    merely tidier.
    """
    from ov3det.datasets.loader import unpack_batch

    @partial(jax.jit, static_argnames=("metas",))
    def packed_step(state, buf, metas, rng):
        return train_step(state, unpack_batch(buf, metas), rng)

    return packed_step


def make_packed_multi_step(train_step):
    """G train steps in ONE jitted dispatch over a (G, nbytes) super-batch.

    Pairs with DataLoader(super_batch=G): the loader ships G packed batches
    as one device buffer (one H2D put) and this program lax.scans the
    per-batch train step over the G rows (one dispatch).  The scan body is
    the SAME train step, so the compiled program stays one-step-sized.

    NOTE: on the remote-tunnel transport this repo benches on, XLA
    while-loop bodies execute ~2-3x slower than the identical program
    dispatched plainly (same pathology as the scan-wrapped teacher note in
    models/regionclip.py) — there, use make_packed_group_step instead,
    which amortizes the H2D without a scan.  On directly-attached TPU
    hardware this single-dispatch form is the better choice.

    Returns (state, metrics) with every metric stacked (G,) — callers log
    metrics[...][g] per sub-step or just the last.  The per-sub-step rng is
    fold_in(rng, g).
    """
    from ov3det.datasets.loader import unpack_batch

    @partial(jax.jit, static_argnames=("metas",))
    def multi_step(state, bufs, metas, rng):
        def body(st, xs):
            g, buf = xs
            st, m = train_step(
                st, unpack_batch(buf, metas), jax.random.fold_in(rng, g)
            )
            return st, m

        G = bufs.shape[0]
        return jax.lax.scan(body, state, (jnp.arange(G), bufs))

    return multi_step


def make_packed_group_step(train_step, max_group: int = 64):
    """One plain train-step dispatch per sub-batch of a (G, nbytes) group,
    WITHOUT re-transferring: the group buffer lives on device (one H2D put
    by the loader), and each dispatch gathers row g with a pre-staged
    device index scalar — so the steady-state loop issues zero host->device
    transfers and G ordinary dispatches per group.  Use this on transports
    where (a) every put serializes behind in-flight compute (hence the
    grouping) and (b) XLA loop bodies dispatch slowly (hence no scan).

    Returns run_group(state, bufs, metas, rng) -> (state, metrics_of_last).
    """
    from ov3det.datasets.loader import unpack_batch

    # pre-staged device scalars: created once, reused every group
    idx_cache: dict = {}

    @partial(jax.jit, static_argnames=("metas",))
    def sub_step(state, bufs, g, metas, rng):
        buf = bufs[g]  # on-device row gather of the resident group buffer
        key = jax.random.fold_in(rng, g)
        return train_step(state, unpack_batch(buf, metas), key)

    def run_group(state, bufs, metas, rng):
        G = int(bufs.shape[0])
        metrics = None
        for g in range(G):
            if g not in idx_cache:
                idx_cache[g] = jnp.asarray(g, jnp.int32)
            state, metrics = sub_step(state, bufs, idx_cache[g], metas, rng)
        return state, metrics

    # the jitted inner program, exposed for cost analysis (bench.py MFU:
    # lower().compile() of the SAME program re-keys into the compilation
    # cache instead of standing up a fresh one)
    run_group.sub_step = sub_step
    return run_group


def make_eval_step(
    model: Model3DETR,
    loss_cfg: Optional[LossConfig] = None,
    num_angle_bin: int = 1,
    num_semcls: int = 18,
):
    """Jitted eval forward.  With loss_cfg the step ALSO computes the
    criterion (teacher-free: the distillation term needs the frozen 2D
    teacher and is a train-only signal) and returns (outputs, loss_dict) —
    the reference's evaluate computes the loss whenever a criterion is
    passed and logs it under Test_details/ (engine.py:198-206, 226-229)."""

    @jax.jit
    def eval_step(state: TrainState, batch: dict):
        inputs = {
            "point_clouds": batch["point_clouds"],
            "point_cloud_dims_min": batch["point_cloud_dims_min"],
            "point_cloud_dims_max": batch["point_cloud_dims_max"],
        }
        outputs = model.apply(
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "frozen": state.frozen,
            },
            inputs,
            train=False,
        )
        # final decoder layer only — what evaluation consumes
        final = {k: (v[-1] if k != "query_xyz" else v) for k, v in outputs.items()}
        if loss_cfg is None:
            return final
        _, loss_dict = set_criterion(
            outputs,
            batch,
            loss_cfg,
            num_angle_bin=num_angle_bin,
            num_semcls=num_semcls,
        )
        return final, loss_dict

    return eval_step


def build_training(
    cfg,
    model: Model3DETR,
    example_inputs: dict,
    iters_per_epoch: int,
    rng: jax.Array,
    text_embed=None,
    teacher_fn=None,
    teacher_vars=None,
    eval_loss: bool = False,
    image_bank=None,
    image_bank_hw: Optional[tuple] = None,
):
    """Wire schedule + optimizer + state + steps from a TrainConfig."""
    schedule = make_lr_schedule(cfg.optim, cfg.max_epoch, iters_per_epoch)
    tx = build_optimizer(cfg.optim, schedule)
    state = create_train_state(
        model, tx, example_inputs, rng, text_embed, teacher_vars=teacher_vars,
        image_bank=image_bank,
    )
    train_step = make_train_step(
        model,
        tx,
        cfg.loss,
        num_angle_bin=cfg.model.num_angle_bin,
        num_semcls=cfg.model.num_semcls,
        teacher_fn=teacher_fn,
        image_bank_hw=image_bank_hw,
    )
    eval_step = make_eval_step(
        model,
        loss_cfg=cfg.loss if eval_loss else None,
        num_angle_bin=cfg.model.num_angle_bin,
        num_semcls=cfg.model.num_semcls,
    )
    return state, train_step, eval_step, schedule
