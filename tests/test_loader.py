"""DataLoader batching semantics: tail-batch pad-and-mask.

The reference torch DataLoader keeps the final partial batch for eval /
pseudo-label inference (dynamic shape); our loader pads it to the fixed jit
shape and marks the pad via valid_mask, so no test scan is silently
excluded from mAP and no pseudo-label row is written twice.
"""
import numpy as np

from ov3det.datasets.loader import DataLoader, slice_valid, valid_count


class _FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "point_clouds": np.full((16, 3), float(i), np.float32),
            "scan_idx": np.asarray(i, np.int64),
        }


class TestPadAndMask:
    def test_drop_last_false_pads_tail_batch(self):
        loader = DataLoader(_FakeDataset(10), batch_size=4, drop_last=False,
                            num_workers=1)
        batches = list(loader)
        assert len(loader) == 3 and len(batches) == 3
        # every batch keeps the fixed shape
        for b in batches:
            assert b["point_clouds"].shape == (4, 16, 3)
            assert b["valid_mask"].shape == (4,)
        assert valid_count(batches[0]) == 4
        assert valid_count(batches[2]) == 2
        # pad repeats the last real sample (tail position)
        np.testing.assert_array_equal(batches[2]["scan_idx"], [8, 9, 9, 9])
        # slice_valid strips exactly the pad
        sliced = slice_valid(batches[2], valid_count(batches[2]))
        np.testing.assert_array_equal(sliced["scan_idx"], [8, 9])
        assert sliced["point_clouds"].shape == (2, 16, 3)
        # all 10 scans appear exactly once across valid prefixes
        seen = np.concatenate(
            [slice_valid(b, valid_count(b))["scan_idx"] for b in batches]
        )
        np.testing.assert_array_equal(np.sort(seen), np.arange(10))

    def test_drop_last_true_has_no_mask(self):
        loader = DataLoader(_FakeDataset(10), batch_size=4, drop_last=True,
                            num_workers=1)
        batches = list(loader)
        assert len(batches) == 2
        for b in batches:
            assert "valid_mask" not in b
            assert valid_count(b) == 4

    def test_exact_multiple_has_full_masks(self):
        loader = DataLoader(_FakeDataset(8), batch_size=4, drop_last=False,
                            num_workers=1)
        batches = list(loader)
        assert len(batches) == 2
        for b in batches:
            assert valid_count(b) == 4


class _PoisonDataset:
    """Raises on one sample — simulates a bad scene / broken worker."""

    def __len__(self):
        return 8

    def __getitem__(self, i):
        if i == 5:
            raise ValueError("poisoned sample 5")
        return {"x": np.full((4,), float(i), np.float32)}


class TestWorkerErrorPropagation:
    """A worker exception must surface in the consumer, not hang training
    forever on out_q.get() (the producer used to die before enqueueing the
    sentinel)."""

    def test_thread_worker_exception_reraised(self):
        import pytest

        loader = DataLoader(_PoisonDataset(), batch_size=4, num_workers=2)
        with pytest.raises(ValueError, match="poisoned sample 5"):
            list(loader)

    def test_process_worker_exception_reraised(self):
        import pytest

        loader = DataLoader(_PoisonDataset(), batch_size=4, num_workers=2,
                            worker_type="process")
        try:
            with pytest.raises(ValueError, match="poisoned sample 5"):
                list(loader)
        finally:
            loader.shutdown()


class TestMultiHostLoading:
    """Multi-host data-parallel loading (reference DistributedSampler
    semantics, main.py:445-446): every process derives the same global
    order, fetches only its slice, and the global batch is assembled via
    jax.make_array_from_process_local_data."""

    def test_process_slices_partition_the_global_batch(self):
        from ov3det.datasets import SyntheticDataset
        from ov3det.datasets.loader import DataLoader

        ds = SyntheticDataset(size=16, num_points=64)
        full = DataLoader(ds, batch_size=4, shuffle=True, seed=7, num_workers=2,
                          process_index=0, process_count=1)
        p0 = DataLoader(ds, batch_size=4, shuffle=True, seed=7, num_workers=2,
                        process_index=0, process_count=2)
        p1 = DataLoader(ds, batch_size=4, shuffle=True, seed=7, num_workers=2,
                        process_index=1, process_count=2)
        for b_full, b0, b1 in zip(full, p0, p1):
            merged = np.concatenate([b0["scan_idx"], b1["scan_idx"]])
            np.testing.assert_array_equal(merged, np.asarray(b_full["scan_idx"]))
            assert b0["point_clouds"].shape[0] == 2

    def test_global_assembly_matches_device_put(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ov3det.datasets import SyntheticDataset
        from ov3det.datasets.loader import DataLoader
        from ov3det.parallel import make_mesh

        mesh = make_mesh()
        sharding = NamedSharding(mesh, P("data"))
        ds = SyntheticDataset(size=8, num_points=64)
        kw = dict(batch_size=8, shuffle=False, num_workers=2, sharding=sharding)
        assembled = next(iter(DataLoader(ds, global_assembly=True, **kw)))
        put = next(iter(DataLoader(ds, **kw)))
        for k in put:
            assert assembled[k].sharding.is_equivalent_to(put[k].sharding,
                                                          put[k].ndim)
            np.testing.assert_array_equal(np.asarray(assembled[k]),
                                          np.asarray(put[k]))


class TestPackedTransfer:
    """transfer="packed": one uint8 H2D buffer per batch + on-device unpack
    (see loader.pack_batch rationale — per-array puts contend with step
    execution on remote-device transports)."""

    def test_pack_unpack_roundtrip_mixed_dtypes(self):
        import jax.numpy as jnp

        from ov3det.datasets.loader import pack_batch, unpack_batch

        rng = np.random.default_rng(0)
        batch = {
            "f32": rng.normal(size=(4, 7, 3)).astype(np.float32),
            "i32": rng.integers(-5, 90, size=(4, 11)).astype(np.int32),
            "i64": rng.integers(0, 9, size=(4,)).astype(np.int64),
            "u8": rng.integers(0, 255, size=(2, 5, 6, 3)).astype(np.uint8),
            "bool": rng.integers(0, 2, size=(4, 3)).astype(bool),
            "f64": rng.normal(size=(3, 2)),
        }
        buf, metas = pack_batch(batch)
        assert buf.dtype == np.uint8
        out = unpack_batch(jnp.asarray(buf), metas)
        assert set(out) == set(batch)
        np.testing.assert_array_equal(np.asarray(out["f32"]), batch["f32"])
        np.testing.assert_array_equal(np.asarray(out["i32"]), batch["i32"])
        np.testing.assert_array_equal(np.asarray(out["i64"]),
                                      batch["i64"].astype(np.int32))
        np.testing.assert_array_equal(np.asarray(out["u8"]), batch["u8"])
        np.testing.assert_array_equal(np.asarray(out["bool"]),
                                      batch["bool"].astype(np.uint8))
        np.testing.assert_allclose(np.asarray(out["f64"]),
                                   batch["f64"].astype(np.float32))

    def test_packed_device_put_happens_on_producer_thread(self):
        """packed_device items arrive as already-committed device arrays:
        the H2D put runs on the producer thread (overlapping the in-flight
        step), never on the consumer's critical path."""
        import jax

        from ov3det.datasets import SyntheticDataset
        from ov3det.datasets.loader import DataLoader

        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        ds = SyntheticDataset(size=8, num_points=64)
        loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                            sharding=sharding, transfer="packed_device")
        for buf, metas in loader:
            assert isinstance(buf, jax.Array)
            assert buf.sharding.is_equivalent_to(sharding, buf.ndim)
            assert isinstance(metas, tuple)

    def test_loader_packed_equals_tree(self):
        import jax

        from ov3det.datasets import SyntheticDataset
        from ov3det.datasets.loader import DataLoader

        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        ds = SyntheticDataset(size=8, num_points=64)
        kw = dict(batch_size=4, shuffle=False, num_workers=2, sharding=sharding)
        for a, b in zip(DataLoader(ds, transfer="packed", **kw),
                        DataLoader(ds, transfer="tree", **kw)):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_super_batch_groups_match_per_batch_items(self):
        """super_batch=G ships (G, nbytes) device buffers whose rows unpack
        to exactly the per-batch packed stream, with the final partial
        group keeping its true length."""
        import jax

        from ov3det.datasets import SyntheticDataset
        from ov3det.datasets.loader import DataLoader, unpack_batch

        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        ds = SyntheticDataset(size=20, num_points=64)  # 5 batches -> 2+2+1
        kw = dict(batch_size=4, shuffle=False, num_workers=2,
                  sharding=sharding, transfer="packed_device")
        singles = list(DataLoader(ds, **kw))
        groups = list(DataLoader(ds, super_batch=2, **kw))
        assert len(singles) == 5 and len(groups) == 3
        assert [g[0].shape[0] for g in groups] == [2, 2, 1]
        flat = [(bufs[g], metas) for bufs, metas in groups
                for g in range(bufs.shape[0])]
        for (sb, sm), (gb, gm) in zip(singles, flat):
            assert sm == gm
            a = unpack_batch(sb, sm)
            b = unpack_batch(gb, gm)
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        # unpack() of a group returns the LAST sub-batch's dict
        last = DataLoader.unpack(groups[0])
        want = unpack_batch(*singles[1])
        for k in want:
            np.testing.assert_array_equal(np.asarray(last[k]), np.asarray(want[k]))


def test_direct_write_with_valid_mask_matches_tree():
    """drop_last=False through the zero-copy direct-write grouped path:
    valid_mask rides in the packed row and the pad batch masks correctly."""
    import jax

    from ov3det.datasets import SyntheticDataset
    from ov3det.datasets.loader import DataLoader, unpack_batch

    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    ds = SyntheticDataset(size=10, num_points=64)  # 3 batches, last padded
    kw = dict(batch_size=4, shuffle=False, num_workers=2, drop_last=False,
              sharding=sharding)
    tree = list(DataLoader(ds, transfer="tree", **kw))
    groups = list(DataLoader(ds, transfer="packed_device", super_batch=2,
                             **kw))
    flat = [(bufs[g], metas) for bufs, metas in groups
            for g in range(bufs.shape[0])]
    assert len(tree) == len(flat) == 3
    for t, (gb, gm) in zip(tree, flat):
        u = unpack_batch(gb, gm)
        assert set(u) == set(t)
        for k in t:
            np.testing.assert_array_equal(np.asarray(u[k]), np.asarray(t[k]))
    np.testing.assert_array_equal(
        np.asarray(unpack_batch(*flat[-1])["valid_mask"]), [1, 1, 0, 0]
    )


def test_q16_codec_roundtrip_and_direct_layout():
    """The q16 transfer codec (datasets/loader.py) reconstructs points to
    within half a quantization step of the per-sample range, leaves other
    arrays bit-exact, and the zero-copy direct-write layout matches
    pack_batch byte-for-byte (so both producer paths feed one program)."""
    from ov3det.datasets.loader import (_pack_samples_into, batch_metas,
                                        pack_batch, unpack_batch)

    rng = np.random.default_rng(3)
    B, N, C = 4, 500, 3
    batch = {
        "point_clouds": (rng.standard_normal((B, N, C)) * 2.5).astype(
            np.float32
        ),
        "labels": rng.integers(0, 9, (B, 16)).astype(np.int64),
    }
    q = ("point_clouds",)
    buf, metas = pack_batch(batch, quantize=q)
    plain, _ = pack_batch(batch)
    assert buf.size < 0.55 * plain.size  # the put really halves
    out = unpack_batch(buf, metas)
    pc = np.asarray(out["point_clouds"])
    step = (
        batch["point_clouds"].max(1) - batch["point_clouds"].min(1)
    ) / 65535.0  # (B, C)
    err = np.abs(pc - batch["point_clouds"])
    assert (err <= 0.55 * step[:, None, :] + 1e-6).all()
    np.testing.assert_array_equal(np.asarray(out["labels"]), batch["labels"])

    samples = [{k: batch[k][b] for k in batch} for b in range(B)]
    m2, nbytes = batch_metas(samples[0], B, with_valid_mask=False, quantize=q)
    assert m2 == metas
    row = np.empty(nbytes, np.uint8)
    _pack_samples_into(samples, None, row, m2)
    np.testing.assert_array_equal(row, buf)


def test_q16_loader_feeds_a_train_step():
    """End-to-end: a quantized packed_device super-batch loader drives the
    packed group step; the loss matches the unquantized loader's loss to
    the quantization-noise level (the codec is a transfer detail, not a
    model change)."""
    import jax

    from ov3det.datasets import SyntheticDataset
    from ov3det.datasets.loader import DataLoader
    from ov3det.engine import build_training
    from ov3det.engine.train import make_packed_group_step
    from ov3det.models import Model3DETR
    from tests.test_engine import tiny_train_cfg

    cfg = tiny_train_cfg()
    ds = SyntheticDataset(size=8, num_points=256,
                          num_semcls=cfg.model.num_semcls,
                          num_angle_bin=cfg.model.num_angle_bin)
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def run(quantize):
        loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                            sharding=sharding, transfer="packed_device",
                            super_batch=2, quantize=quantize)
        item = next(iter(loader))
        sample = loader.unpack(item)
        inputs = {k: sample[k] for k in ("point_clouds",
                                         "point_cloud_dims_min",
                                         "point_cloud_dims_max")}
        state, train_step, _, _ = build_training(
            cfg, Model3DETR(cfg.model), inputs, iters_per_epoch=2,
            rng=jax.random.PRNGKey(0))
        group_step = make_packed_group_step(train_step)
        _, metrics = group_step(state, item[0], item[1],
                                jax.random.PRNGKey(1))
        return float(metrics["loss"])

    l_plain = run(())
    l_q16 = run(("point_clouds",))
    assert np.isfinite(l_q16)
    assert abs(l_q16 - l_plain) <= 0.02 * abs(l_plain) + 1e-3


def test_yuv420_codec_roundtrip_and_direct_layout():
    """The yuv420 image transfer codec (datasets/loader.py): 2x reduction
    on the wire, luma-exact reconstruction on gray content, bounded error
    on chroma-smooth content (the SUN RGB-D sources are 4:2:0 JPEGs, so
    the dropped chroma detail never existed in the files), and the
    direct-write layout matches pack_batch byte-for-byte.  Also covers the
    multi-frame (B, F, H, W, 3) ScanNet layout."""
    from scipy.ndimage import zoom as _zoom  # smooth chroma test content

    from ov3det.datasets.loader import (_pack_samples_into, batch_metas,
                                        pack_batch, unpack_batch)

    rng = np.random.default_rng(11)
    B, H, W = 3, 32, 48
    # chroma-smooth content: low-res color field upsampled 8x + fine luma
    low = rng.uniform(40, 215, size=(B, H // 8, W // 8, 3))
    smooth = np.stack([_zoom(low[b], (8, 8, 1), order=1) for b in range(B)])
    luma = rng.uniform(-25, 25, size=(B, H, W, 1))
    img = np.clip(smooth + luma, 0, 255).astype(np.uint8)
    batch = {"image": img, "labels": rng.integers(0, 9, (B, 7)).astype(np.int64)}

    q = ("image",)
    buf, metas = pack_batch(batch, quantize=q)
    plain, _ = pack_batch(batch)
    assert buf.size < 0.55 * plain.size  # the put really halves
    out = unpack_batch(buf, metas)
    got = np.asarray(out["image"]).astype(np.int32)
    assert got.shape == img.shape and np.asarray(out["image"]).dtype == np.uint8
    err = np.abs(got - img.astype(np.int32))
    assert err.mean() <= 3.0, err.mean()
    assert np.percentile(err, 99) <= 14, np.percentile(err, 99)
    np.testing.assert_array_equal(np.asarray(out["labels"]), batch["labels"])

    # gray content has no chroma: reconstruction is luma-rounding-exact
    gray = np.repeat(rng.integers(0, 256, (1, H, W, 1)), 3, -1).astype(np.uint8)
    gbuf, gm = pack_batch({"image": gray}, quantize=q)
    ggot = np.asarray(unpack_batch(gbuf, gm)["image"]).astype(np.int32)
    assert np.abs(ggot - gray.astype(np.int32)).max() <= 2

    # direct-write layout parity (the zero-copy producer path)
    samples = [{k: batch[k][b] for k in batch} for b in range(B)]
    m2, nbytes = batch_metas(samples[0], B, with_valid_mask=False, quantize=q)
    assert m2 == metas
    row = np.empty(nbytes, np.uint8)
    _pack_samples_into(samples, None, row, m2)
    np.testing.assert_array_equal(row, buf)

    # multi-frame layout (ScanNet --use_image ships (F, H, W, 3) samples)
    mf = {"images": img.reshape(1, B, H, W, 3)}  # B=1 sample with F=3 frames
    mbuf, mm = pack_batch(mf, quantize=("images",))
    mg = np.asarray(unpack_batch(mbuf, mm)["images"]).astype(np.int32)
    assert mg.shape == mf["images"].shape
    assert np.abs(mg - mf["images"].astype(np.int32)).mean() <= 3.0
    # frame f of the multi-frame pack decodes exactly like sample f of the
    # batched pack (same bytes, same codec)
    np.testing.assert_array_equal(mg[0], got)
