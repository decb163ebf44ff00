"""Point-cloud set-abstraction primitives as pure-XLA ops.

These replace the external CUDA `third_party/pointnet2` extension the
reference imports (reference models/model_3detr.py:8-9): furthest point
sampling, fixed-radius ball query with first-K semantics, and gathering.
Fixed shapes, jit/vmap/grad friendly; indices are non-differentiable by
construction (stop_gradient on the selection path).

Semantics deliberately mirror the CUDA kernels so a converted checkpoint
sees the same neighborhoods:
  * FPS seeds at index 0 and greedily takes the argmax of the running
    min-distance (ties -> lowest index);
  * ball query returns the first `nsample` points (in index order) whose
    squared distance is < radius^2, padding the tail by replicating the
    first hit (every center is its own first hit when querying its source
    cloud, so the pad is always valid there).

A fused Pallas kernel path lives in ov3det.ops.pallas; these jnp versions
are the correctness oracle and the CPU/interpret fallback.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_BIG = 1e10


def _mesh_size_for(batch: int) -> int:
    """Size of the active data mesh if the batch shards evenly, else 1."""
    from ov3det.parallel.mesh import data_mesh

    mesh = data_mesh()
    if mesh is not None and mesh.size > 1 and batch % mesh.size == 0:
        return mesh.size
    return 1


def _pallas_dispatch(xyz: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Run the Pallas FPS kernel, shard_map-wrapped over the data mesh.

    FPS is batch-parallel (reference FPS at models/model_3detr.py:174 is
    per-sample), so each device runs the kernel on its local batch shard;
    no collectives are needed.  interpret=True on non-TPU backends lets the
    multi-chip dry run / CPU-mesh tests exercise this exact path.
    """
    from functools import partial

    from ov3det.ops.pallas.fps_kernel import furthest_point_sample_pallas
    from ov3det.parallel.mesh import DATA_AXIS, data_mesh

    interpret = jax.default_backend() != "tpu"
    fn = partial(
        furthest_point_sample_pallas, num_samples=num_samples, interpret=interpret
    )
    mesh = data_mesh()
    if mesh is not None and mesh.size > 1 and xyz.shape[0] % mesh.size == 0:
        from jax.sharding import PartitionSpec as P

        # check_vma=False: pallas_call's out_shape carries no varying-mesh-
        # axes annotation; the kernel is trivially batch-parallel anyway
        fn = jax.shard_map(
            fn, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    return fn(xyz)


def furthest_point_sample(
    xyz: jnp.ndarray, num_samples: int, shards: int = 1,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Iterative farthest-point sampling.

    xyz: (B, N, 3) float. Returns (B, num_samples) int32 indices.

    On TPU this dispatches to the fused Pallas kernel
    (ov3det.ops.pallas.fps_kernel), which is *exact* greedy FPS
    (CUDA-parity: seed index 0, argmax ties -> lowest index) with the
    min-distance state VMEM-resident for all k iterations — ~100x faster
    than the XLA fori_loop and strictly better than the sharded
    approximation, so `shards` is ignored there.  Under an active data mesh
    the kernel is shard_map-wrapped over the batch axis, so multi-chip
    data-parallel runs keep the fast path.  `use_pallas` forces the
    dispatch either way (None = auto: TPU backend and the four (local_B, N)
    f32 VMEM buffers fit comfortably; on non-TPU backends a forced dispatch
    runs in interpret mode).

    On other backends: shards=1 is exact greedy FPS; shards=S > 1 is the
    parallel approximation — the point set is split into S strided shards,
    each running greedy FPS for num_samples/S selections *in parallel*.
    Serial argmax->gather latency per selection dominates XLA FPS
    (~50us/step, independent of N), so S shards cut wall time ~Sx; with
    randomly-ordered points (both datasets random-subsample each scene)
    the strided shards are i.i.d. subsets and coverage is near-identical
    (see tests/test_ops.py::TestFPS::test_sharded_quality).
    """
    B, N, _ = xyz.shape
    xyz = jax.lax.stop_gradient(xyz)

    if use_pallas is None:
        # Pallas auto-dispatch on TPU.  pallas_call carries no GSPMD
        # partitioning rule, so under a data mesh the kernel is wrapped in
        # shard_map over the batch axis (_pallas_dispatch) — FPS is
        # batch-parallel, each chip runs the kernel on its local shard.
        # The 12 MB bound keeps the four (local_B, N) f32 VMEM buffers
        # comfortably on-chip.  OV3DET_FPS=pallas|xla overrides (the
        # multi-chip dry run uses it to drive the kernel path on CPU).
        force = os.environ.get("OV3DET_FPS")
        if force in ("pallas", "xla"):
            use_pallas = force == "pallas"
        else:
            local_b = B // _mesh_size_for(B)
            use_pallas = (
                jax.default_backend() == "tpu" and 16 * local_b * N <= 12 * 2**20
            )
    if use_pallas:
        return _pallas_dispatch(xyz, num_samples)

    if shards > 1:
        assert num_samples % shards == 0 and N % shards == 0, (num_samples, N, shards)
        S = shards
        # shard s = original indices [s::S] (strided reshape)
        sharded = xyz.reshape(B, N // S, S, 3).transpose(0, 2, 1, 3)  # (B,S,N/S,3)
        flat = sharded.reshape(B * S, N // S, 3)
        local = furthest_point_sample(flat, num_samples // S, shards=1)
        local = local.reshape(B, S, num_samples // S)
        # local index j in shard s -> global index j*S + s
        glob = local * S + jnp.arange(S, dtype=jnp.int32)[None, :, None]
        return glob.transpose(0, 2, 1).reshape(B, num_samples)

    def body(i, state):
        inds, min_d2, last = state
        # distance from the most recently selected point to every point
        d2 = jnp.sum((xyz - last[:, None, :]) ** 2, axis=-1)  # (B, N)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2, axis=-1).astype(jnp.int32)  # (B,)
        inds = inds.at[:, i].set(nxt)
        last = jnp.take_along_axis(xyz, nxt[:, None, None], axis=1)[:, 0, :]
        return inds, min_d2, last

    inds0 = jnp.zeros((B, num_samples), jnp.int32)
    last0 = xyz[:, 0, :]
    min_d2_0 = jnp.full((B, N), _BIG, xyz.dtype)
    inds, _, _ = jax.lax.fori_loop(1, num_samples, body, (inds0, min_d2_0, last0))
    return inds


def gather_points(points: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """points: (B, N, C), inds: (B, M) -> (B, M, C)."""
    return jnp.take_along_axis(points, inds[..., None], axis=1)


def _pairwise_d2(centers: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Squared distances (..., M, N) via the MXU-friendly expansion
    |c|^2 + |x|^2 - 2 c.x — avoids materializing the (M, N, 3) difference
    tensor (3x the HBM traffic of the result)."""
    cross = jnp.einsum(
        "...md,...nd->...mn", centers, pts, precision=jax.lax.Precision.HIGHEST
    )
    c2 = jnp.sum(centers**2, axis=-1)
    x2 = jnp.sum(pts**2, axis=-1)
    return jnp.maximum(c2[..., :, None] + x2[..., None, :] - 2.0 * cross, 0.0)


def ball_query(
    xyz: jnp.ndarray,
    centers: jnp.ndarray,
    radius: float,
    nsample: int,
    method: str = "first_k",
) -> jnp.ndarray:
    """Fixed-radius neighborhood indices.

    xyz: (B, N, 3) source points; centers: (B, M, 3) query centers.
    Returns (B, M, nsample) int32 indices into xyz.

    method="first_k": CUDA-parity semantics — the first nsample in-radius
      points in index order, tail padded with the first hit.
    method="bucketed": TPU-fast variant — the point axis is split into
      nsample equal buckets and each slot takes the first in-radius point of
      its bucket (missing slots replicate the first hit).  Same
      distribution of neighborhoods when point order is random (both
      datasets randomly subsample points per scene), but avoids the
      O(N log N) top_k selection entirely.
    """
    B, N, _ = xyz.shape
    xyz = jax.lax.stop_gradient(xyz)
    centers = jax.lax.stop_gradient(centers)
    r2 = radius * radius

    if method == "bucketed":
        pad = (-N) % nsample
        pts = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)), constant_values=1e6)
        d2 = _pairwise_d2(centers, pts)  # (B, M, N+pad)
        Nb = (N + pad) // nsample
        in_ball = (d2 < r2).reshape(B, -1, nsample, Nb)
        pick = jnp.argmax(in_ball, axis=-1)  # first hit per bucket
        has = jnp.any(in_ball, axis=-1)
        idx = pick + jnp.arange(nsample, dtype=jnp.int32)[None, None, :] * Nb
        # pad empty slots with the first hit of the first non-empty bucket
        first_bucket = jnp.argmax(has, axis=-1)  # (B, M)
        first_idx = jnp.take_along_axis(idx, first_bucket[..., None], axis=-1)
        idx = jnp.where(has, idx, first_idx)
        return jnp.minimum(idx, N - 1).astype(jnp.int32)

    d2 = _pairwise_d2(centers, xyz)  # (B, M, N)
    in_ball = d2 < r2
    order = jnp.arange(N, dtype=jnp.int32)
    # smallest index-order scores among in-ball points == first hits
    scores = jnp.where(in_ball, order[None, None, :], N)
    _, idx = jax.lax.top_k(-scores, nsample)  # ascending scores
    count = jnp.sum(in_ball, axis=-1, keepdims=True)
    slot = jnp.arange(nsample)[None, None, :]
    # pad the tail by replicating the first hit (CUDA kernel behavior)
    idx = jnp.where(slot < count, idx, idx[..., 0:1])
    return idx.astype(jnp.int32)


def bucket_picks(
    xyz: jnp.ndarray, centers: jnp.ndarray, radius: float, nsample: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-bucket first hits of the bucketed ball query.

    The point axis is split into `nsample` equal contiguous buckets; slot k
    takes the first in-radius point of bucket k.  Returns
    (pick (B, M, K) int32 bucket-LOCAL index, has (B, M, K) bool).
    Shared by the XLA ball_group and the Pallas kernel's backward pass.
    """
    B, N, _ = xyz.shape
    M = centers.shape[1]
    K = nsample
    pad = (-N) % K
    pts = jnp.pad(
        jax.lax.stop_gradient(xyz), ((0, 0), (0, pad), (0, 0)),
        constant_values=1e6,
    )
    # f32 throughout: the |c|^2+|x|^2-2c.x expansion cancels catastrophically
    # at ball-radius scale in bf16 (d2 ~ 0.04 from ~10-magnitude operands)
    d2 = _pairwise_d2(jax.lax.stop_gradient(centers), pts)  # (B, M, Npad)
    in_ball = (d2 < radius * radius).reshape(B, M, K, (N + pad) // K)
    return jnp.argmax(in_ball, axis=-1), jnp.any(in_ball, axis=-1)


def ball_group(
    xyz: jnp.ndarray,
    features: jnp.ndarray | None,
    centers: jnp.ndarray,
    radius: float,
    nsample: int,
    normalize_xyz: bool = True,
) -> jnp.ndarray:
    """Fused bucketed ball query + grouping without gathers.

    Equivalent to group_points(xyz, features, centers,
    ball_query(..., method="bucketed"), ...) but the neighbor extraction is
    a one-hot MXU contraction per bucket instead of a random gather — XLA
    gathers of ~1M indices cost ~100 ms/batch on TPU, the contraction a few
    ms.  Returns (B, M, nsample, 3 + C).

    See also ops.pallas.ball_group_kernel.ball_group_pallas — the fully
    fused VMEM-resident version of this op (this XLA formulation is its
    correctness oracle and still materializes ~3 GB of d2/one-hot
    intermediates per flagship batch).
    """
    B, N, _ = xyz.shape
    M = centers.shape[1]
    K = nsample
    xyz_sg = jax.lax.stop_gradient(xyz)
    centers_sg = jax.lax.stop_gradient(centers)
    pad = (-N) % K
    pts = jnp.pad(xyz_sg, ((0, 0), (0, pad), (0, 0)), constant_values=1e6)
    Npad = N + pad
    Nb = Npad // K

    pick, has = bucket_picks(xyz_sg, centers_sg, radius, K)  # (B, M, K)

    onehot = jax.nn.one_hot(pick, Nb, dtype=jnp.float32) * has[..., None]
    pts_b = pts.reshape(B, K, Nb, 3)
    g_xyz = jnp.einsum("bmkn,bknc->bmkc", onehot, pts_b)  # (B, M, K, 3)

    # empty slots replicate the first non-empty bucket's point
    first_bucket = jnp.argmax(has, axis=-1)  # (B, M)
    ohk = jax.nn.one_hot(first_bucket, K, dtype=jnp.float32)
    first_xyz = jnp.einsum("bmk,bmkc->bmc", ohk, g_xyz)
    any_hit = jnp.any(has, axis=-1, keepdims=True)  # (B, M, 1): center itself
    g_xyz = jnp.where(has[..., None], g_xyz, first_xyz[:, :, None, :])
    g_xyz = jnp.where(any_hit[..., None], g_xyz, centers_sg[:, :, None, :])

    rel = g_xyz - centers_sg[:, :, None, :]
    if normalize_xyz:
        rel = rel / radius
    if features is None:
        return rel
    C = features.shape[-1]
    feats_b = jnp.pad(features, ((0, 0), (0, pad), (0, 0))).reshape(B, K, Nb, C)
    g_feat = jnp.einsum("bmkn,bknc->bmkc", onehot, feats_b)
    first_feat = jnp.einsum("bmk,bmkc->bmc", ohk, g_feat)
    g_feat = jnp.where(has[..., None], g_feat, first_feat[:, :, None, :])
    return jnp.concatenate([rel, g_feat], axis=-1)


def ball_group_auto(
    xyz: jnp.ndarray,
    features: jnp.ndarray | None,
    centers: jnp.ndarray,
    radius: float,
    nsample: int,
    normalize_xyz: bool = True,
    use_pallas: bool | None = None,
) -> tuple[jnp.ndarray, int]:
    """ball_group with automatic Pallas-kernel dispatch on TPU.

    Returns (grouped, neighbor_axis): the Pallas kernel emits the
    neighbor-major (B, K, M, 3+C) layout (axis 1), the XLA fallback the
    center-major (B, M, K, 3+C) layout (axis 2).  Consumers (the SA
    module's shared MLP + max-pool) are layout-agnostic, so no transpose is
    paid either way.

    Dispatch mirrors furthest_point_sample: OV3DET_BALLGROUP=pallas|xla
    forces it; otherwise the kernel runs on TPU when its per-cell VMEM
    blocks fit, shard_map-wrapped over an active data mesh (the op is
    batch-parallel), and in interpret mode on other backends when forced.
    """
    B, N, _ = xyz.shape
    M = centers.shape[1]
    K = nsample
    P = 3 + (0 if features is None else features.shape[-1])
    if use_pallas is None:
        force = os.environ.get("OV3DET_BALLGROUP")
        if force in ("pallas", "xla"):
            use_pallas = force == "pallas"
        else:
            Nb = -(-N // K)
            tm = 128 if P <= 128 else 64
            # conservative per-cell VMEM estimate: bucketed points block +
            # output slab, both padded to TPU tiles
            pts_b = K * max(P, 8) * (-(-Nb // 128) * 128) * 4
            out_b = K * tm * (-(-P // 128) * 128) * 4
            use_pallas = (
                jax.default_backend() == "tpu"
                and pts_b + out_b <= 10 * 2**20
            )
    if not use_pallas:
        return ball_group(xyz, features, centers, radius, K, normalize_xyz), 2

    from ov3det.ops.pallas.ball_group_kernel import ball_group_pallas
    from ov3det.parallel.mesh import DATA_AXIS, data_mesh

    interpret = jax.default_backend() != "tpu"

    # custom_vjp nondiff args must be positional
    def run(x, f, c):
        return ball_group_pallas(x, f, c, radius, K, normalize_xyz, interpret)

    mesh = data_mesh()
    if mesh is not None and mesh.size > 1 and B % mesh.size == 0:
        from jax.sharding import PartitionSpec as Pspec

        spec = Pspec(DATA_AXIS)
        if features is None:
            sharded = jax.shard_map(
                lambda x, c: run(x, None, c), mesh=mesh,
                in_specs=(spec, spec), out_specs=spec, check_vma=False,
            )
            return sharded(xyz, centers), 1
        sharded = jax.shard_map(
            run, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )
        return sharded(xyz, features, centers), 1
    return run(xyz, features, centers), 1


def group_points(
    xyz: jnp.ndarray,
    features: jnp.ndarray | None,
    centers: jnp.ndarray,
    group_inds: jnp.ndarray,
    radius: float,
    normalize_xyz: bool = True,
) -> jnp.ndarray:
    """Gather grouped relative coordinates (+ features) per center.

    xyz: (B, N, 3); features: (B, N, C) or None; centers: (B, M, 3);
    group_inds: (B, M, K). Returns (B, M, K, 3 + C) with relative xyz first —
    the layout QueryAndGroup produces for the SA module (pointnet2 lineage).
    """
    B, M, K = group_inds.shape
    flat = group_inds.reshape(B, M * K)
    g_xyz = gather_points(xyz, flat).reshape(B, M, K, 3)
    rel = g_xyz - centers[:, :, None, :]
    if normalize_xyz:
        rel = rel / radius
    if features is None:
        return rel
    C = features.shape[-1]
    g_feat = gather_points(features, flat).reshape(B, M, K, C)
    return jnp.concatenate([rel, g_feat], axis=-1)
