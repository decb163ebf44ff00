"""Batching data loader: thread-pool sample fetch + host->device prefetch.

Replaces the reference's torch DataLoader with 4 worker processes
(reference main.py:452-458).  At batch 8 the per-sample numpy work is
light; a thread pool + one-batch device prefetch keeps the accelerator fed
without process-spawn complexity, and batches are device_put with the data
mesh sharding so the training step never sees host arrays.

Multi-host (DCN) data parallelism: when jax.process_count() > 1 every host
derives the SAME global index order (seeded shuffle, reference
DistributedSampler semantics at main.py:445-446), fetches only its local
slice of each global batch, and assembles the global jax.Array via
jax.make_array_from_process_local_data — the jitted step then sees
global-batch-shaped arrays whose shards live host-locally.
"""
from __future__ import annotations

import pickle
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from functools import partial
from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp


def collate(samples: list[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


# --- process-worker plumbing (reference torch DataLoader num_workers=4
# semantics, main.py:452-458).  The dataset is pickled ONCE into each
# spawned worker via the initializer; workers run pure-numpy __getitem__
# (no jax backend is ever initialized there).
_WORKER_DATASET = None


def _worker_init(ds_bytes: bytes):
    global _WORKER_DATASET
    _WORKER_DATASET = pickle.loads(ds_bytes)


def _build_batch(dataset, idxs, valid_mask, packed: bool, quantize=(),
                 enc_cache=None, cache_keys=()):
    """Fetch + collate (+ pack) one whole batch; runs INSIDE a worker.

    Batch-level parallelism (torch DataLoader semantics: each worker owns
    whole batches): K workers build K batches concurrently, and the
    producer thread only forwards results — at 20k-point scenes the
    per-sample collate + pack is several ms of host work per batch that
    would otherwise serialize in the producer.
    """
    batch = collate([dataset[int(i)] for i in idxs])
    if valid_mask is not None:
        batch["valid_mask"] = valid_mask
    return (
        pack_batch(batch, quantize, idxs=idxs, enc_cache=enc_cache,
                   cache_keys=cache_keys)
        if packed
        else batch
    )


def _worker_build_batch(idxs, valid_mask, packed, quantize=()):
    return _build_batch(_WORKER_DATASET, idxs, valid_mask, packed, quantize)


# --- packed single-buffer transfer --------------------------------------
# Per-array host->device transfers serialize against in-flight step
# execution in some PJRT clients (each put takes the client lock; a batch
# of ~16 arrays issued from the loader thread while the train step runs
# degraded e2e throughput 6x on the remote-TPU transport this was measured
# on).  Packing the whole batch into ONE uint8 buffer makes the H2D path a
# single put, and a tiny jitted program slices/bitcasts the views back out
# ON DEVICE — zero extra copies on the host, one extra dispatch per batch.

_PACK_KEY = "__packed__"

# --- q16 transfer codec ---------------------------------------------------
# Opt-in per-array uint16 quantization for the packed H2D path.  On
# transports where the host->device link is the e2e bottleneck (the
# remote-tunnel PJRT client this repo benches on moves ~50 MB/s and
# serializes puts against in-flight compute), the f32 point clouds are
# ~95% of the batch bytes; shipping them as per-sample min/max-scaled
# uint16 halves the put and the dequant fuses into the on-device unpack.
# Worst-case reconstruction error is range/65535/2 (~0.1 mm for a 10 m
# scene) — two orders of magnitude below depth-sensor noise.  Layout per
# sample: [min f32[C] | max f32[C] | u16 payload (N*C)].

_Q16_TAG = "q16"

# --- yuv420 transfer codec -------------------------------------------------
# Opt-in chroma-subsampled transport for uint8 RGB images (the open-vocab
# batch's dominant bytes: the SUN RGB-D 530x730 canvas is ~1.16 MB/scene,
# ~90% of the OV group put).  Ships JPEG-style full-range BT.601 YUV with
# 2x2-averaged chroma planes — 1.5 bytes/px instead of 3 — and the
# upsample + inverse transform fuse into the on-device unpack.  This is
# NOT an extra lossy stage for the reference's data: SUN RGB-D images are
# stored as 4:2:0 JPEGs (reference sunrgbd.py loads them via cv2), so the
# chroma detail this codec drops was never in the source files — the host
# decode upsampled it.  Luma is carried exactly (integer transform,
# roundtrip error <= 2/255 per channel on chroma-smooth content; fidelity
# vs the RGB path is covered by the teacher-feature cosine test and the
# training race in tests/).

_YUV_TAG = "yuv420"


def _q16_eligible(key: str, dtype, sample_ndim: int, quantize) -> bool:
    """The codec applies to float32 per-sample matrices (N, C) only; an
    ineligible key in `quantize` silently packs verbatim so callers can
    pass ("point_clouds",) regardless of dataset schema."""
    return key in quantize and np.dtype(dtype) == np.float32 and sample_ndim >= 2


def _yuv_eligible(key: str, dtype, sample_shape, quantize) -> bool:
    """uint8 (..., H, W, 3) images with even H, W (the 2x2 chroma grid)."""
    return (
        key in quantize
        and np.dtype(dtype) == np.uint8
        and len(sample_shape) >= 3
        and sample_shape[-1] == 3
        and sample_shape[-3] % 2 == 0
        and sample_shape[-2] % 2 == 0
    )


def _yuv_sample_bytes(sample_shape) -> int:
    h, w = sample_shape[-3], sample_shape[-2]
    frames = int(np.prod(sample_shape[:-3], dtype=np.int64)) if len(sample_shape) > 3 else 1
    return frames * (h * w + 2 * (h // 2) * (w // 2))


# full-range BT.601 (JPEG) matrix scaled by 256, as float32 rows for one
# BLAS sgemm per frame — every intermediate is an integer < 2^24, so f32
# arithmetic is EXACT and `(x + 128) >> 8` (arithmetic shift = floor) is
# reproduced bit-for-bit by floor((x + 128) / 256).  The previous int32
# formulation was ~21 full-image elementwise passes; on this 1-core host
# the encode was a visible share of the OV loader's 145 ms/item fetch.
_YUV_M = np.array(
    [[77, 150, 29], [-43, -85, 128], [128, -107, -21]], np.float32
).T


def _yuv420_encode(img: np.ndarray) -> np.ndarray:
    """(..., H, W, 3) uint8 RGB -> contiguous uint8 row [Y | U/2x2 | V/2x2].

    Integer full-range BT.601 (the JPEG matrix, scaled by 256): exact
    inverse modulo rounding; chroma planes are 2x2 box-averaged."""
    a = np.asarray(img)
    h, w = a.shape[-3], a.shape[-2]
    yuv = np.floor(
        (a.reshape(-1, 3).astype(np.float32) @ _YUV_M + 128.0) * (1.0 / 256.0)
    ).reshape(-1, h, w, 3)
    y, u, v = yuv[..., 0], yuv[..., 1] + 128.0, yuv[..., 2] + 128.0

    def sub(c):  # 2x2 box average -> (F, h/2, w/2); sums < 2^24: f32-exact
        c4 = c.reshape(-1, h // 2, 2, w // 2, 2)
        return np.floor((c4.sum(axis=(2, 4)) + 2.0) * 0.25)

    parts = [np.clip(y, 0, 255).astype(np.uint8).reshape(-1),
             np.clip(sub(u), 0, 255).astype(np.uint8).reshape(-1),
             np.clip(sub(v), 0, 255).astype(np.uint8).reshape(-1)]
    return np.concatenate(parts)


def _q16_sample_bytes(sample_shape) -> int:
    C = sample_shape[-1]
    n = int(np.prod(sample_shape, dtype=np.int64))
    return 8 * C + 2 * n


def _q16_encode(a: np.ndarray) -> np.ndarray:
    """One sample (N, C) f32 -> contiguous uint8 row (see layout above)."""
    C = a.shape[-1]
    flat = np.ascontiguousarray(a, np.float32).reshape(-1, C)
    mn = flat.min(axis=0)
    mx = flat.max(axis=0)
    scale = np.float32(65535.0) / np.maximum(mx - mn, np.float32(1e-12))
    q = np.clip(np.rint((flat - mn) * scale), 0.0, 65535.0).astype(np.uint16)
    return np.concatenate(
        [mn.view(np.uint8), mx.view(np.uint8), q.view(np.uint8).ravel()]
    )


def _cached_encode(encode_fn, sample, key, idx, enc_cache):
    """Per-(key, dataset-index) memo of an encoded row.  Only for keys the
    caller DECLARED deterministic per index (DataLoader(encode_cache=...)):
    image canvases are loaded raw and never touched by augmentation
    (datasets/sunrgbd.py loads the jpg verbatim; flips/rotations transform
    points and boxes only), so their encoded bytes repeat exactly every
    epoch — on the 1-core bench host the yuv re-encode was a measured
    328 ms/group of avoidable hot-loop CPU (BENCH_r04.json).  dict ops are
    GIL-atomic; a racing duplicate encode is benign (same bytes)."""
    if enc_cache is None or idx is None:
        return encode_fn(np.asarray(sample))
    ck = (key, int(idx))
    row = enc_cache.get(ck)
    if row is None:
        row = encode_fn(np.asarray(sample))
        enc_cache[ck] = row
    return row


def pack_batch(batch: dict, quantize=(), idxs=None, enc_cache=None,
               cache_keys=()):
    """Host-side: dict of np arrays -> (uint8 buffer, static metas).

    64-bit ints/floats are narrowed to 32-bit (matching what device_put
    does under JAX's default x32 mode) and bools widen to uint8.  Keys in
    `quantize` that are float32 (B, N, C) ship q16-encoded (see codec
    notes above); unpack_batch dequantizes on device.  Keys in
    `cache_keys` memoize their encoded rows per dataset index (`idxs`,
    parallel to the batch axis) in `enc_cache` — see _cached_encode.
    """
    metas, parts = [], []
    for k in sorted(batch):
        a = np.ascontiguousarray(batch[k])
        cache = enc_cache if k in cache_keys else None
        idx_of = (lambda b: idxs[b]) if idxs is not None else (lambda b: None)
        if _q16_eligible(k, a.dtype, a.ndim - 1, quantize):
            rows = [
                _cached_encode(_q16_encode, a[b], k, idx_of(b), cache)
                for b in range(a.shape[0])
            ]
            metas.append((k, _Q16_TAG, a.shape, a.shape[0] * rows[0].size))
            parts.extend(rows)
            continue
        if _yuv_eligible(k, a.dtype, a.shape[1:], quantize):
            rows = [
                _cached_encode(_yuv420_encode, a[b], k, idx_of(b), cache)
                for b in range(a.shape[0])
            ]
            metas.append((k, _YUV_TAG, a.shape, a.shape[0] * rows[0].size))
            parts.extend(rows)
            continue
        if a.dtype == np.int64:
            a = a.astype(np.int32)
        elif a.dtype == np.float64:
            a = a.astype(np.float32)
        elif a.dtype == np.bool_:
            a = a.astype(np.uint8)
        flat = a.view(np.uint8).reshape(-1)
        metas.append((k, a.dtype.str, a.shape, flat.size))
        parts.append(flat)
    return np.concatenate(parts), tuple(metas)


def _pack_cast(dt: np.dtype) -> np.dtype:
    """pack_batch's dtype narrowing (x32 mode) as a pure dtype map."""
    if dt == np.int64:
        return np.dtype(np.int32)
    if dt == np.float64:
        return np.dtype(np.float32)
    if dt == np.bool_:
        return np.dtype(np.uint8)
    return np.dtype(dt)


def batch_metas(sample: dict, batch_size: int, with_valid_mask: bool,
                quantize=()):
    """pack_batch metas for a batch of `batch_size` samples of `sample`'s
    schema, computed WITHOUT building the batch.  Layout-identical to
    pack_batch(collate(samples), quantize) so unpack_batch round-trips
    either."""
    items = {k: np.asarray(v) for k, v in sample.items()}
    if with_valid_mask:
        items["valid_mask"] = np.zeros(batch_size, np.float32)
    metas = []
    for k in sorted(items):
        a = items[k]
        if k != "valid_mask" and _q16_eligible(k, a.dtype, a.ndim, quantize):
            shape = (batch_size,) + a.shape
            size = batch_size * _q16_sample_bytes(a.shape)
            metas.append((k, _Q16_TAG, shape, size))
            continue
        if k != "valid_mask" and _yuv_eligible(k, a.dtype, a.shape, quantize):
            shape = (batch_size,) + a.shape
            size = batch_size * _yuv_sample_bytes(a.shape)
            metas.append((k, _YUV_TAG, shape, size))
            continue
        dt = _pack_cast(a.dtype)
        shape = a.shape if k == "valid_mask" else (batch_size,) + a.shape
        size = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
        metas.append((k, dt.str, shape, size))
    return tuple(metas), sum(m[3] for m in metas)


def _pack_samples_into(samples, valid_mask, out_row: np.ndarray, metas,
                       idxs=None, enc_cache=None, cache_keys=()):
    """Write samples straight into a preallocated packed row (uint8 view
    copies — no collate stack, no concatenate, no fresh allocation).  On
    hosts with slow page faults every fresh multi-MB batch buffer costs
    10-300 ms of first-touch; writing into a warm ring row is a plain
    memcpy.  Keys in `cache_keys` memoize encoded rows per dataset index
    (see _cached_encode)."""
    off = 0
    B = len(samples)
    idx_of = (lambda s: idxs[s]) if idxs is not None else (lambda s: None)
    for k, dts, shape, size in metas:
        if k == "valid_mask":
            out_row[off : off + size] = (
                valid_mask.astype(np.float32).view(np.uint8).ravel()
            )
            off += size
            continue
        nb = size // B
        cache = enc_cache if k in cache_keys else None
        if dts == _Q16_TAG:
            for s, smp in enumerate(samples):
                out_row[off + s * nb : off + (s + 1) * nb] = _cached_encode(
                    _q16_encode, smp[k], k, idx_of(s), cache
                )
            off += size
            continue
        if dts == _YUV_TAG:
            for s, smp in enumerate(samples):
                out_row[off + s * nb : off + (s + 1) * nb] = _cached_encode(
                    _yuv420_encode, smp[k], k, idx_of(s), cache
                )
            off += size
            continue
        for s, smp in enumerate(samples):
            a = np.atleast_1d(np.ascontiguousarray(smp[k]))
            if a.dtype != np.dtype(dts):
                a = a.astype(np.dtype(dts))
            out_row[off + s * nb : off + (s + 1) * nb] = (
                a.view(np.uint8).ravel()
            )
        off += size


def _build_batch_direct(dataset, idxs, valid_mask, out_row, metas,
                        enc_cache=None, cache_keys=()):
    """Worker body for the zero-copy direct-write path."""
    _pack_samples_into(
        [dataset[int(i)] for i in idxs], valid_mask, out_row, metas,
        idxs=idxs, enc_cache=enc_cache, cache_keys=cache_keys,
    )
    return True


def yuv420_decode_rows(rows, shape):
    """Device-side yuv420 -> uint8 RGB: rows (B, row_bytes) laid out per
    sample as [Y*F | U*F | V*F] (see _yuv420_encode), `shape` the target
    (B, ..., H, W, 3).  Traceable (used inside unpack_batch and by the
    device-resident image bank's per-step decode, datasets/image_bank.py)."""
    B = shape[0]
    h, w = shape[-3], shape[-2]
    F = int(np.prod(shape[:-3], dtype=np.int64)) // B  # frames/sample
    ny, nc = h * w, (h // 2) * (w // 2)
    y = rows[:, : F * ny].reshape(-1, h, w).astype(jnp.float32)
    u = rows[:, F * ny : F * (ny + nc)].reshape(-1, h // 2, w // 2)
    v = rows[:, F * (ny + nc) :].reshape(-1, h // 2, w // 2)
    # nearest 2x2 chroma upsample + JPEG inverse BT.601, all fused
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2).astype(jnp.float32) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2).astype(jnp.float32) - 128.0
    rgb = jnp.stack(
        [y + 1.402 * v,
         y - 0.344136 * u - 0.714136 * v,
         y + 1.772 * u],
        axis=-1,
    )
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8).reshape(shape)


@partial(jax.jit, static_argnames=("metas",))
def unpack_batch(buf, metas) -> dict:
    """Device-side inverse of pack_batch (slices + bitcasts, fully fused);
    q16 arrays dequantize in the same fused program."""
    out, off = {}, 0
    for k, dts, shape, size in metas:
        seg = jax.lax.slice(buf, (off,), (off + size,))
        if dts == _Q16_TAG:
            B, C = shape[0], shape[-1]
            rows = seg.reshape(B, size // B)
            hdr = jax.lax.bitcast_convert_type(
                rows[:, : 8 * C].reshape(B, 2, C, 4), jnp.float32
            )
            q = jax.lax.bitcast_convert_type(
                rows[:, 8 * C :].reshape(B, -1, C, 2), jnp.uint16
            )
            mn = hdr[:, :1]  # (B, 1, C) broadcasts over the N axis
            scale = (hdr[:, 1:] - mn) * (1.0 / 65535.0)
            out[k] = (mn + q.astype(jnp.float32) * scale).reshape(shape)
            off += size
            continue
        if dts == _YUV_TAG:
            B = shape[0]
            rows = seg.reshape(B, size // B)  # per-sample [Y*F | U*F | V*F]
            out[k] = yuv420_decode_rows(rows, shape)
            off += size
            continue
        dt = np.dtype(dts)
        if dt.itemsize > 1:
            arr = jax.lax.bitcast_convert_type(seg.reshape(-1, dt.itemsize), dt)
        elif dt != np.uint8:
            arr = jax.lax.bitcast_convert_type(seg, dt)
        else:
            arr = seg
        out[k] = arr.reshape(shape)
        off += size
    return out


def valid_count(batch: dict) -> int:
    """Number of real (non-pad) samples in a batch produced by DataLoader
    with drop_last=False; full batch size when no padding happened."""
    mask = batch.get("valid_mask")
    if mask is None:
        return int(batch["point_clouds"].shape[0])
    return int(np.asarray(mask).sum())


def slice_valid(tree: dict, n: int) -> dict:
    """Strip pad samples (always at the tail) from every batched array."""
    return {k: v[:n] for k, v in tree.items()}


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        sharding=None,
        prefetch: int = 2,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        global_assembly: bool = False,
        worker_type: str = "thread",
        transfer: str = "tree",
        super_batch: int = 1,
        quantize: tuple = (),
        encode_cache: tuple = (),
    ):
        """batch_size is the GLOBAL batch; under multi-host each process
        fetches batch_size / process_count samples per step.  Without a
        sharding, multi-process loaders yield process-LOCAL host batches.
        global_assembly forces the make_array_from_process_local_data path
        even single-process (exercised by tests).

        transfer="packed" ships each batch as ONE uint8 buffer and unpacks
        on device (see pack_batch) — use on transports where per-array
        device_put contends with step execution; single-device shardings
        only (the packed layout is key-major, it cannot shard batch-wise).
        transfer="packed_device" additionally SKIPS the unpack dispatch and
        yields (device_buffer, metas) — pair it with
        engine.make_packed_step so the unpack fuses into the train step
        (one dispatch per batch instead of two); call loader.unpack(item)
        when the dict form is needed (metrics/eval).

        encode_cache lists quantize keys whose ENCODED row is deterministic
        per dataset index (e.g. the raw image canvas: augmentation never
        touches it) — their q16/yuv encodes are memoized across epochs
        (thread workers only; process workers don't share host memory).
        Memory: one encoded row per (key, scene) — e.g. full SUN RGB-D
        yuv canvases are ~0.58 MB x 5285 scenes ~= 3 GB of host RAM.

        super_batch=G (packed_device only) groups G consecutive batches
        into ONE (G, nbytes) device buffer: one H2D put and one dispatch
        (engine.make_packed_multi_step scans the G sub-batches in a single
        jitted program) per G batches.  On transports where host->device
        transfers serialize behind in-flight compute (each put waits out
        the current step while holding the client lock), per-batch puts
        cost ~a full step of wall time each — grouping amortizes that to
        1/G.  A final partial group is shipped with its true length."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.sharding = sharding
        self.prefetch = prefetch
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        self.global_assembly = global_assembly
        # "process": spawned worker processes run __getitem__ — numpy-heavy
        # augmentation scales past the GIL (the reference's 4-process torch
        # DataLoader); "thread": in-process pool, fine for IO-light datasets
        assert worker_type in ("thread", "process"), worker_type
        self.worker_type = worker_type
        assert transfer in ("tree", "packed", "packed_device"), transfer
        if transfer != "tree":
            assert self.process_count == 1 and not global_assembly, (
                "packed transfer is single-host (key-major layout can't "
                "shard batch-wise)"
            )
        assert super_batch >= 1
        assert super_batch == 1 or transfer == "packed_device", (
            "super_batch grouping needs transfer='packed_device'"
        )
        self.super_batch = super_batch
        self.transfer = transfer
        self.quantize = tuple(quantize)
        assert not self.quantize or transfer != "tree", (
            "the q16 codec rides the packed transfer layout"
        )
        self.encode_cache = tuple(encode_cache)
        assert not self.encode_cache or worker_type == "thread", (
            "encode_cache memoization needs in-process (thread) workers"
        )
        self._enc_cache: dict = {}
        self._pool = None
        assert batch_size % self.process_count == 0, (batch_size, self.process_count)
        self._epoch = 0

    def _ensure_pool(self):
        if self._pool is None:
            if self.worker_type == "process":
                import multiprocessing as mp

                self._pool = ProcessPoolExecutor(
                    max_workers=self.num_workers,
                    mp_context=mp.get_context("spawn"),
                    initializer=_worker_init,
                    initargs=(pickle.dumps(self.dataset),),
                )
            else:
                self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        return self._pool

    def shutdown(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 1000003 + self._epoch)
            rng.shuffle(order)
        nb = len(self)
        for b in range(nb):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            n_valid = len(idxs)
            if n_valid < self.batch_size:
                # pad-and-mask: keep the fixed jit shape by repeating the
                # last sample; callers strip the tail via valid_count/
                # slice_valid.  The reference torch DataLoader keeps the
                # partial batch (dynamic shape) — on TPU that would force a
                # recompile, so we pad instead and mask host-side.
                pad = np.full(self.batch_size - n_valid, idxs[-1], idxs.dtype)
                idxs = np.concatenate([idxs, pad])
            yield idxs, n_valid

    def __iter__(self) -> Iterator[dict]:
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        pi, pc = self.process_index, self.process_count
        local_b = self.batch_size // pc
        assemble = self.sharding is not None and (pc > 1 or self.global_assembly)

        def place(x):
            if assemble:
                # x is this process's local slice; every process contributes
                # its shard of the global jax.Array (multi-host path)
                return jax.make_array_from_process_local_data(self.sharding, x)
            return jax.device_put(x, self.sharding)

        pool = self._ensure_pool()
        packed = self.transfer in ("packed", "packed_device")
        # zero-copy direct-write path: thread workers pack samples straight
        # into rows of the reusable (G, nbytes) group buffers — no collate
        # stack, no pack concatenate, no flush copy.  Only for in-process
        # workers (processes can't see the ring) on the grouped device path.
        direct = (
            packed
            and self.super_batch > 1
            and self.sharding is not None
            and self.worker_type == "thread"
        )
        if direct:
            d_metas, d_nbytes = batch_metas(
                self.dataset[0], local_b,
                with_valid_mask=not self.drop_last, quantize=self.quantize,
            )
            # slot s is reused by group s + depth; the producer flushes
            # group g (device_put copies it out) before submitting any job
            # of group g + 2 + ceil(workers/G), so this depth is safe
            d_depth = 3 + -(-self.num_workers // self.super_batch)
            d_ring = [
                np.empty((self.super_batch, d_nbytes), np.uint8)
                for _ in range(d_depth)
            ]

        def local_mask(idxs, n_valid):
            local = idxs[pi * local_b : (pi + 1) * local_b]
            valid_mask = None
            if not self.drop_last:
                # mask over GLOBAL batch positions; keep the local rows
                mask = (np.arange(self.batch_size) < n_valid).astype(np.float32)
                valid_mask = mask[pi * local_b : (pi + 1) * local_b]
            return local, valid_mask

        def submit(idxs, n_valid, job: int):
            local, valid_mask = local_mask(idxs, n_valid)
            if direct:
                G = self.super_batch
                row = d_ring[(job // G) % d_depth][job % G]
                return pool.submit(
                    _build_batch_direct, self.dataset, local, valid_mask,
                    row, d_metas, self._enc_cache, self.encode_cache,
                )
            if self.worker_type == "process":
                return pool.submit(_worker_build_batch, local, valid_mask,
                                   packed, self.quantize)
            return pool.submit(_build_batch, self.dataset, local, valid_mask,
                               packed, self.quantize, self._enc_cache,
                               self.encode_cache)

        def producer():
            # batch-level pipeline: keep up to num_workers batches in
            # flight; the producer thread only awaits + forwards (and
            # places batches on device for the sharded path), never builds
            # batches itself.  The H2D put for packed batches happens HERE,
            # off the consumer's critical path: in training the consumer
            # thread is busy dispatching the previous step, and a put issued
            # there serializes against that dispatch — issuing it from the
            # producer overlaps the transfer with the in-flight step.
            from collections import deque

            gen = self._index_batches()
            futs: deque = deque()
            group: list = []  # host-side packed batches awaiting grouping
            # Reusable (G, nbytes) staging buffers: a FRESH 10s-of-MB numpy
            # allocation per group hits sporadic multi-second page-fault /
            # CPU-steal stalls on small shared hosts (measured 18 ms p50,
            # 2.8 s worst for one 16 MB np.stack) — the ring caps that to
            # first-touch only.  A slot is reused after `ring_depth` more
            # groups; device_put has copied it out long before (the consumer
            # holds at most `prefetch` undispatched groups).
            ring: list = []
            ring_depth = max(self.prefetch, 1) + 2
            ring_i = 0

            def flush_group():
                nonlocal ring_i
                metas = group[0][1]
                if not ring and self.sharding is not None:
                    nbytes = group[0][0].size
                    for _ in range(ring_depth):
                        ring.append(
                            np.empty((self.super_batch, nbytes), np.uint8)
                        )
                if self.sharding is None or len(group) < self.super_batch:
                    # host mode yields the buffer itself (no device copy to
                    # detach it from the ring) and the final partial group
                    # has a different G — both take a fresh allocation
                    bufs = np.stack([b for b, _ in group])
                else:
                    bufs = ring[ring_i % ring_depth]
                    ring_i += 1
                    for g, (b, _) in enumerate(group):
                        np.copyto(bufs[g], b)
                group.clear()
                if self.sharding is not None:
                    bufs = jax.device_put(bufs, self.sharding)
                out_q.put((bufs, metas))

            j_submit = j_pop = 0

            def submit_next():
                nonlocal gen, j_submit
                if gen is None:
                    return False
                try:
                    idxs, n_valid = next(gen)
                except StopIteration:
                    gen = None
                    return False
                futs.append(submit(idxs, n_valid, j_submit))
                j_submit += 1
                return True

            try:
                while len(futs) < self.num_workers and submit_next():
                    pass
                while futs:
                    batch = futs.popleft().result()
                    submit_next()
                    if direct:
                        # worker already wrote row (j_pop % G) of its group
                        # ring slot; ship the slot when its group completes
                        G = self.super_batch
                        rows = j_pop % G + 1
                        last_of_group = rows == G
                        last_overall = not futs and gen is None
                        if last_of_group or last_overall:
                            bufs = d_ring[(j_pop // G) % d_depth]
                            if rows < G:  # final partial group: true length
                                bufs = bufs[:rows]
                            bufs = jax.device_put(bufs, self.sharding)
                            out_q.put((bufs, d_metas))
                        j_pop += 1
                        continue
                    j_pop += 1
                    if packed and self.super_batch > 1:
                        buf, metas = batch
                        assert not group or group[0][1] == metas
                        group.append((buf, metas))
                        if len(group) == self.super_batch:
                            flush_group()
                        continue
                    if packed:
                        buf, metas = batch
                        if self.sharding is not None:
                            buf = jax.device_put(buf, self.sharding)
                        batch = (buf, metas)
                    elif self.sharding is not None:
                        batch = jax.tree_util.tree_map(place, batch)
                    out_q.put(batch)
                if group:  # final partial group keeps its true length
                    flush_group()
            except BaseException as exc:  # worker crash, BrokenProcessPool,
                # unpicklable sample...: surface it in the consumer instead
                # of hanging training forever on out_q.get()
                out_q.put(exc)
            finally:
                out_q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                t.join()
                raise item
            if packed and self.transfer != "packed_device":
                item = unpack_batch(*item)
            yield item
        t.join()

    @staticmethod
    def unpack(item):
        """dict form of a yielded item under any transfer mode.

        For a super-batch group ((G, nbytes) buffer) returns the LAST
        sub-batch — the one whose post-step model state metrics refer to.
        """
        if isinstance(item, tuple):
            buf, metas = item
            if getattr(buf, "ndim", 1) == 2:
                buf = buf[-1]
            return unpack_batch(buf, metas)
        return item
