"""End-to-end engine tests: loss decreases, LR schedule parity, checkpoint
round-trip, and a sharded train step over the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ov3det.config import (
    DecoderConfig,
    EncoderConfig,
    LossConfig,
    MatcherConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from ov3det.datasets import make_batch
from ov3det.engine import CheckpointManager, build_training, make_lr_schedule
from ov3det.models import Model3DETR
from ov3det.parallel import make_mesh, replicate, shard_batch

NPTS, NPRE, Q, G = 512, 128, 32, 64


def tiny_train_cfg():
    return TrainConfig(
        model=ModelConfig(
            encoder=EncoderConfig(num_layers=2, dim=64, ffn_dim=64, masking_radius=(0.16, 0.64)),
            decoder=DecoderConfig(num_layers=2, dim=64, ffn_dim=64),
            preenc_npoints=NPRE,
            num_queries=Q,
            preenc_mlp=(32, 64, 64),
            num_semcls=6,
            num_angle_bin=1,
            clip_embed_dim=64,
            mlp_dropout=0.0,
        ),
        loss=LossConfig(
            matcher=MatcherConfig(cost_class=1, cost_objectness=5, cost_center=5, cost_giou=2),
            giou_weight=1.0,
            center_weight=5.0,
        ),
        optim=OptimConfig(base_lr=2e-3, warm_lr_epochs=0, clip_gradient=0.1),
        max_epoch=4,
    )


def batch_for(cfg, batch_size=2, seed=0):
    rng = np.random.default_rng(seed)
    b = make_batch(
        rng,
        batch_size=batch_size,
        num_points=NPTS,
        num_semcls=cfg.model.num_semcls,
        num_angle_bin=cfg.model.num_angle_bin,
        num_boxes=4,
    )
    return {k: jnp.asarray(v) for k, v in b.items()}


class TestTraining:
    def test_loss_decreases(self):
        cfg = tiny_train_cfg()
        model = Model3DETR(cfg.model)
        batch = batch_for(cfg)
        inputs = {
            "point_clouds": batch["point_clouds"],
            "point_cloud_dims_min": batch["point_cloud_dims_min"],
            "point_cloud_dims_max": batch["point_cloud_dims_max"],
        }
        state, train_step, eval_step, _ = build_training(
            cfg, model, inputs, iters_per_epoch=10, rng=jax.random.PRNGKey(0)
        )
        losses = []
        for i in range(30):
            state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses[:3] + losses[-3:]
        out = eval_step(state, batch)
        assert out["box_corners"].shape == (2, Q, 8, 3)

    def test_packed_multi_step_matches_sequential(self):
        """make_packed_multi_step (one scan dispatch over a (G, nbytes)
        super-batch) must reproduce G sequential packed steps exactly:
        same final params, same per-sub-step losses, same rng folding."""
        from ov3det.datasets.loader import pack_batch
        from ov3det.engine.train import make_packed_multi_step, make_packed_step

        cfg = tiny_train_cfg()
        model = Model3DETR(cfg.model)
        batches = [batch_for(cfg, seed=s) for s in range(3)]
        np_batches = [
            {k: np.asarray(v) for k, v in b.items()} for b in batches
        ]
        packed = [pack_batch(b) for b in np_batches]
        metas = packed[0][1]
        inputs = {
            "point_clouds": batches[0]["point_clouds"],
            "point_cloud_dims_min": batches[0]["point_cloud_dims_min"],
            "point_cloud_dims_max": batches[0]["point_cloud_dims_max"],
        }
        state, train_step, _, _ = build_training(
            cfg, model, inputs, iters_per_epoch=10, rng=jax.random.PRNGKey(0)
        )
        packed_step = make_packed_step(train_step)
        multi_step = make_packed_multi_step(train_step)

        key = jax.random.PRNGKey(42)
        st_seq = state
        seq_losses = []
        for g, (buf, m) in enumerate(packed):
            st_seq, metrics = packed_step(
                st_seq, jnp.asarray(buf), m, jax.random.fold_in(key, g)
            )
            seq_losses.append(float(metrics["loss"]))

        bufs = jnp.asarray(np.stack([b for b, _ in packed]))
        st_multi, ms = multi_step(state, bufs, metas, key)
        np.testing.assert_allclose(
            np.asarray(ms["loss"]), seq_losses, rtol=1e-6
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            st_multi.params, st_seq.params,
        )
        assert int(st_multi.step) == int(st_seq.step) == 3

        # the no-scan group runner (high-latency-transport variant) must
        # match too: same sub-step keys (fold_in(key, g)), same final state
        from ov3det.engine.train import make_packed_group_step

        group_step = make_packed_group_step(train_step)
        st_grp, m_last = group_step(state, bufs, metas, key)
        np.testing.assert_allclose(float(m_last["loss"]), seq_losses[-1],
                                   rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            st_grp.params, st_seq.params,
        )
        assert int(st_grp.step) == 3

    def test_lr_schedule_matches_reference_formula(self):
        cfg = OptimConfig(base_lr=5e-4, warm_lr=1e-6, warm_lr_epochs=9, final_lr=1e-6)
        max_epoch, ipe = 90, 100
        sched = make_lr_schedule(cfg, max_epoch, ipe)

        import math

        def ref_lr(curr_epoch_norm):
            # reference engine.py:22-37
            if curr_epoch_norm <= 9 / max_epoch and cfg.warm_lr_epochs > 0:
                return cfg.warm_lr + curr_epoch_norm * max_epoch * (
                    (cfg.base_lr - cfg.warm_lr) / cfg.warm_lr_epochs
                )
            return cfg.final_lr + 0.5 * (cfg.base_lr - cfg.final_lr) * (
                1 + math.cos(math.pi * curr_epoch_norm)
            )

        for step in [0, 1, 450, 899, 900, 901, 4500, 8999]:
            ours = float(sched(jnp.asarray(step)))
            want = ref_lr(step / (max_epoch * ipe))
            assert abs(ours - want) < 1e-9, (step, ours, want)

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = tiny_train_cfg()
        model = Model3DETR(cfg.model)
        batch = batch_for(cfg)
        inputs = {
            "point_clouds": batch["point_clouds"],
            "point_cloud_dims_min": batch["point_cloud_dims_min"],
            "point_cloud_dims_max": batch["point_cloud_dims_max"],
        }
        state, train_step, eval_step, _ = build_training(
            cfg, model, inputs, iters_per_epoch=10, rng=jax.random.PRNGKey(0)
        )
        state, _ = train_step(state, batch, jax.random.PRNGKey(0))

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save_latest(state, epoch=3)
        restored, epoch, _ = mgr.restore(jax.device_get(state))
        assert epoch == 3
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        )
        # fresh-dir restore returns sentinel
        mgr2 = CheckpointManager(str(tmp_path / "empty"))
        none_state, epoch2, _ = mgr2.restore(jax.device_get(state))
        assert none_state is None and epoch2 == -1

    def test_best_ap_extra_persists_across_resume(self, tmp_path):
        """Reference persists best_val_metrics in checkpoint.pth and restores
        it on resume (utils/io.py:33-58) — a resume must not let a worse
        eval overwrite checkpoint_best."""
        cfg = tiny_train_cfg()
        model = Model3DETR(cfg.model)
        batch = batch_for(cfg)
        inputs = {
            "point_clouds": batch["point_clouds"],
            "point_cloud_dims_min": batch["point_cloud_dims_min"],
            "point_cloud_dims_max": batch["point_cloud_dims_max"],
        }
        state, _, _, _ = build_training(
            cfg, model, inputs, iters_per_epoch=10, rng=jax.random.PRNGKey(0)
        )
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save_latest(state, epoch=5, extra={"best_ap25": 0.37})
        _, epoch, extra = mgr.restore(jax.device_get(state))
        assert epoch == 5
        assert extra == {"best_ap25": 0.37}
        # write_extra refreshes bookkeeping without rewriting the checkpoint
        mgr.write_extra({"best_ap25": 0.41})
        _, _, extra2 = mgr.restore(jax.device_get(state))
        assert extra2 == {"best_ap25": 0.41}


class TestDataParallel:
    def test_sharded_train_step_8_devices(self):
        assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
        mesh = make_mesh(8)
        cfg = tiny_train_cfg()
        model = Model3DETR(cfg.model)
        batch = batch_for(cfg, batch_size=8)
        inputs = {
            "point_clouds": batch["point_clouds"],
            "point_cloud_dims_min": batch["point_cloud_dims_min"],
            "point_cloud_dims_max": batch["point_cloud_dims_max"],
        }
        state, train_step, eval_step, _ = build_training(
            cfg, model, inputs, iters_per_epoch=10, rng=jax.random.PRNGKey(0)
        )
        state = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        state2, metrics = train_step(state, sharded, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # params remain replicated after the update
        p0 = jax.tree_util.tree_leaves(state2.params)[0]
        assert p0.sharding.is_fully_replicated

        # sharded result == single-device result on the same data
        state_single, train_step_s, _, _ = build_training(
            cfg, model, inputs, iters_per_epoch=10, rng=jax.random.PRNGKey(0)
        )
        state1, metrics1 = train_step_s(state_single, batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            float(metrics["loss"]), float(metrics1["loss"]), rtol=2e-4
        )
