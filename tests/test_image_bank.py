"""Device-resident image bank + host encode-cache correctness.

The open-vocab transport optimizations (datasets/image_bank.py, the
DataLoader encode_cache) must be EXACTLY the same computation as shipping
the canvas every step — the bank stores the same yuv420 rows the loader
codec would put on the wire, and the train step decodes them with the same
device decoder.  These tests pin that equality end-to-end:

- bank rows == loader-codec wire bytes, decoded images bit-identical;
- one OV train step from identical init: banked image_ref path lands the
  same losses as the shipped-image path;
- the loader's per-scene encode memo returns buffers identical to the
  uncached encode, across epochs;
- the checkpointer strips the bank like the teacher weights and restore
  reattaches it.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ov3det.config import (
    DecoderConfig,
    EncoderConfig,
    LossConfig,
    MatcherConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from ov3det.datasets import BankRefDataset, SyntheticOVDataset, build_image_bank
from ov3det.datasets.loader import (
    DataLoader,
    pack_batch,
    unpack_batch,
    yuv420_decode_rows,
)
from ov3det.engine import build_training
from ov3det.models import Model3DETR
from ov3det.models.regionclip import RegionCLIPTeacher, make_teacher_fn

NCLS, NBIN = 4, 1
BATCH, NPOINTS = 2, 256


class SmallOVDataset(SyntheticOVDataset):
    """64x96 canvas keeps the tiny-teacher tests CPU-fast."""

    IMG_H, IMG_W = 64, 96


def _dataset(size=6, seed=11):
    return SmallOVDataset(size=size, seed=seed, num_points=NPOINTS,
                          num_semcls=NCLS, num_angle_bin=NBIN)


class TestBankCodecEquality:
    def test_bank_rows_decode_identically_to_wire_codec(self):
        ds = _dataset()
        bank, hw = build_image_bank(ds)
        assert hw == (SmallOVDataset.IMG_H, SmallOVDataset.IMG_W)
        imgs = np.stack([ds.get_image(i) for i in range(len(ds))])
        buf, metas = pack_batch({"image": imgs}, quantize=("image",))
        want = np.asarray(unpack_batch(jnp.asarray(buf), metas)["image"])
        got = np.asarray(
            yuv420_decode_rows(jnp.asarray(np.asarray(bank)),
                               (len(ds), hw[0], hw[1], 3))
        )
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, want)

    def test_bankref_dataset_schema(self):
        ds = _dataset()
        wrapped = BankRefDataset(ds)
        assert len(wrapped) == len(ds)
        d = wrapped[3]
        assert "image" not in d
        assert d["image_ref"] == np.int32(3)
        # everything else passes through untouched
        ref = ds[3]
        np.testing.assert_array_equal(d["point_clouds"], ref["point_clouds"])
        np.testing.assert_array_equal(d["calib_K"], ref["calib_K"])
        assert d["image_height"] == ref["image_height"]


class TestEncodeCache:
    def test_cached_buffers_identical_across_epochs(self):
        ds = _dataset(size=4)
        kw = dict(batch_size=2, shuffle=False, num_workers=2,
                  worker_type="thread", transfer="packed",
                  quantize=("point_clouds", "image"))
        plain = DataLoader(ds, **kw)
        cached = DataLoader(ds, encode_cache=("image",), **kw)
        want = [
            {k: np.asarray(v) for k, v in b.items()} for b in plain
        ]
        for epoch in range(2):  # epoch 0 fills the memo, epoch 1 hits it
            got = [
                {k: np.asarray(v) for k, v in b.items()} for b in cached
            ]
            for gb, wb in zip(got, want):
                for k in wb:
                    np.testing.assert_array_equal(gb[k], wb[k])
        # one memo entry per (key, scene)
        assert len(cached._enc_cache) == len(ds)
        plain.shutdown()
        cached.shutdown()


def _tiny_cfg():
    return TrainConfig(
        model=ModelConfig(
            encoder=EncoderConfig(kind="vanilla", num_layers=1, dim=32,
                                  ffn_dim=32, num_heads=4, dropout=0.0),
            decoder=DecoderConfig(num_layers=2, dim=32, ffn_dim=32,
                                  num_heads=4, dropout=0.0),
            preenc_npoints=64,
            preenc_mlp=(16, 32, 32),
            num_queries=8,
            mlp_dropout=0.0,
            num_semcls=NCLS,
            num_angle_bin=NBIN,
            clip_embed_dim=32,
            fps_shards=1,
            query_fps_shards=1,
            ball_query_method="first_k",
        ),
        loss=LossConfig(
            matcher=MatcherConfig(cost_class=1.0, cost_objectness=5.0,
                                  cost_center=5.0, cost_giou=3.0),
            giou_weight=0.0,
            alignment_2d_weight=1.0,
        ),
        optim=OptimConfig(),
        max_epoch=2,
    )


class TestBankedTrainStep:
    def test_banked_step_matches_shipped_image_step(self):
        """One OV train step, identical init, identical scenes: the
        image_ref+bank path must land the same losses as shipping the
        (yuv-roundtripped) canvas in the batch — the decoded uint8 images
        are bit-identical, so any drift would be a wiring bug."""
        ds = _dataset(size=BATCH)
        bank, hw = build_image_bank(ds)

        items = [ds[i] for i in range(BATCH)]
        batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
        # path A ships what the wire codec delivers (== the bank content)
        buf, metas = pack_batch({"image": batch["image"]}, quantize=("image",))
        batch_a = dict(batch)
        batch_a["image"] = unpack_batch(jnp.asarray(buf), metas)["image"]
        batch_a = {k: jnp.asarray(v) for k, v in batch_a.items()}
        # path B carries only the 4-byte refs
        batch_b = {k: v for k, v in batch.items() if k != "image"}
        batch_b["image_ref"] = np.arange(BATCH, dtype=np.int32)
        batch_b = {k: jnp.asarray(v) for k, v in batch_b.items()}

        cfg = _tiny_cfg()
        teacher_kw = dict(width=16, layers=(1, 1, 1, 1), embed_dim=32,
                          pooler_resolution=6, image_resolution=hw[0])
        t_vars = RegionCLIPTeacher(**teacher_kw).init(
            jax.random.PRNGKey(7),
            jnp.zeros((1, hw[0], hw[1], 3), jnp.float32),
            jnp.zeros((1, 1, 4)),
        )
        teacher_fn = make_teacher_fn(RegionCLIPTeacher(**teacher_kw))
        model = Model3DETR(cfg.model)
        inputs = {k: batch_a[k] for k in (
            "point_clouds", "point_cloud_dims_min", "point_cloud_dims_max")}

        def one_step(batch, **bank_kw):
            state, train_step, _, _ = build_training(
                cfg, model, inputs, iters_per_epoch=2,
                rng=jax.random.PRNGKey(0), teacher_fn=teacher_fn,
                teacher_vars=t_vars, **bank_kw,
            )
            _, metrics = train_step(state, batch, jax.random.PRNGKey(1))
            return {k: float(v) for k, v in metrics.items()}

        m_ship = one_step(batch_a)
        m_bank = one_step(batch_b, image_bank=bank, image_bank_hw=hw)
        assert set(m_ship) == set(m_bank)
        for k in m_ship:
            np.testing.assert_allclose(m_bank[k], m_ship[k], rtol=2e-4,
                                       err_msg=k)


class TestCheckpointStripsBank:
    def test_split_detaches_bank_and_teacher(self):
        from ov3det.engine.checkpoint import _split_teacher
        from ov3det.engine.train import TrainState

        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params={"w": jnp.ones(2)},
            batch_stats={},
            frozen={
                "text_embed": jnp.ones(3),
                "teacher2d": {"params": {"k": jnp.ones(1)}},
                "image_bank": jnp.zeros((4, 8), jnp.uint8),
            },
            opt_state=(),
        )
        kept, detached = _split_teacher(state)
        assert set(kept.frozen) == {"text_embed"}
        assert set(detached) == {"teacher2d", "image_bank"}
        # reattach semantics (what restore() does)
        back = kept.replace(frozen={**kept.frozen, **detached})
        assert set(back.frozen) == {"text_embed", "teacher2d", "image_bank"}
