"""3D IoU / generalized IoU, fully vectorized for XLA (runs in-jit on device).

The reference computes rotated-BEV intersection with a CPU Cython polygon
clipper inside the training step (reference utils/box_util.py:683-694 — a
device->host sync every iteration) or a torch.jit triple python loop
(utils/box_util.py:576-598).  Here the Sutherland–Hodgman clip is expressed
as fixed-shape masked tensor ops:

  * a convex quad clipped by 4 half-planes grows to at most 8 vertices, so a
    static (8, 2) vertex buffer with a live-count suffices;
  * each clip step emits <=2 candidate vertices per input vertex into a
    (16, 2) scratch buffer and compacts it order-preservingly with one
    argsort over 16 keys;
  * everything is vmapped over the (B, K1, K2) pair grid.

Conventions follow the reference: corners are camera-frame (up is -Y), the
BEV rectangle is corners [3,2,1,0] projected to (x, z) (counter-clockwise),
box height spans corner-0 y (top) to corner-4 y (bottom).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Vectorized Sutherland–Hodgman quad-vs-quad intersection area
# ---------------------------------------------------------------------------

_MAX_VERTS = 8  # convex quad clipped by a convex quad has <= 8 vertices


def _clip_by_edge_batched(poly: jnp.ndarray, n: jnp.ndarray, cp1: jnp.ndarray, cp2: jnp.ndarray):
    """One Sutherland–Hodgman half-plane clip step, batched over P polygons.

    poly: (P, V, 2) vertex buffers with the first n[p] slots valid; cp1/cp2:
    (P, 2) endpoints of each (ccw) clip edge — "inside" is the left side.
    Returns (new_poly (P, V, 2), new_n (P,)).

    Sort/gather-free: the output slot of every candidate vertex is its
    emission-order rank, computed with a prefix sum, and the compaction is a
    one-hot contraction — TPU-friendly VPU/MXU work instead of the
    per-polygon argsort+gather a naive implementation needs (that gather
    dominated the training step, ~580 ms/batch at SUN RGB-D sizes).
    """
    P, V, _ = poly.shape
    idx = jnp.arange(V)
    valid = idx[None, :] < n[:, None]  # (P, V)
    # previous live vertex: shift by one with slot n-1 wrapped into slot -1
    prev = jnp.roll(poly, 1, axis=1)  # slot 0 <- slot V-1 (fixed below)
    last_live = jnp.sum(
        jnp.where((idx[None, :, None] == (n[:, None, None] - 1)), poly, 0.0), axis=1
    )  # (P, 2)
    s = prev.at[:, 0, :].set(last_live)
    e = poly

    def side(p):
        # strict ">" matches the reference inside() (utils/box_util.py:399-401)
        return (cp2[:, None, 0] - cp1[:, None, 0]) * (p[..., 1] - cp1[:, None, 1]) - (
            cp2[:, None, 1] - cp1[:, None, 1]
        ) * (p[..., 0] - cp1[:, None, 0])

    inside_e = side(e) > 0
    inside_s = side(s) > 0

    # line-line intersection of each edge (s, e) with the clip line
    dc = cp1 - cp2  # (P, 2)
    dp = s - e
    n1 = cp1[:, 0] * cp2[:, 1] - cp1[:, 1] * cp2[:, 0]  # (P,)
    n2 = s[..., 0] * e[..., 1] - s[..., 1] * e[..., 0]  # (P, V)
    den = dc[:, None, 0] * dp[..., 1] - dc[:, None, 1] * dp[..., 0]
    den = jnp.where(jnp.abs(den) < _EPS, _EPS, den)
    inter = jnp.stack(
        [
            (n1[:, None] * dp[..., 0] - n2 * dc[:, None, 0]) / den,
            (n1[:, None] * dp[..., 1] - n2 * dc[:, None, 1]) / den,
        ],
        axis=-1,
    )  # (P, V, 2)

    # emission schedule per input vertex: intersection first, then e itself
    emit_inter = valid & (inside_e != inside_s)
    emit_e = valid & inside_e
    cand = jnp.stack([inter, e], axis=2).reshape(P, 2 * V, 2)
    flags = jnp.stack([emit_inter, emit_e], axis=2).reshape(P, 2 * V)

    # rank-based compaction: slot_k = (#flags before k); one-hot contraction
    rank = jnp.cumsum(flags, axis=1) - 1  # (P, 2V)
    onehot = (rank[:, :, None] == jnp.arange(V)[None, None, :]) & flags[:, :, None]
    compacted = jnp.einsum(
        "pkv,pkc->pvc", onehot.astype(poly.dtype), cand,
        precision=jax.lax.Precision.HIGHEST,
    )
    new_n = jnp.minimum(jnp.sum(flags, axis=1), V)
    return compacted, new_n


def _poly_area_batched(poly: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of the first n[p] vertices of each poly (P, V, 2)."""
    P, V, _ = poly.shape
    idx = jnp.arange(V)
    valid = idx[None, :] < n[:, None]
    nxt = jnp.roll(poly, -1, axis=1)  # slot k <- k+1 (slot V-1 <- 0, unused)
    first = poly[:, 0, :]
    # successor of the last live vertex wraps to vertex 0
    is_last = idx[None, :] == (n[:, None] - 1)
    nxt = jnp.where(is_last[:, :, None], first[:, None, :], nxt)
    cross = poly[..., 0] * nxt[..., 1] - poly[..., 1] * nxt[..., 0]
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0), axis=1))


def _quad_intersection_area_batched(subject: jnp.ndarray, clip: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas of P pairs of ccw convex quads: (P,4,2)x(P,4,2)->(P,)."""
    P = subject.shape[0]
    poly = jnp.concatenate(
        [subject, jnp.zeros((P, _MAX_VERTS - 4, 2), subject.dtype)], axis=1
    )
    n = jnp.full((P,), 4, jnp.int32)
    for k in range(4):
        poly, n = _clip_by_edge_batched(poly, n, clip[:, (k - 1) % 4], clip[:, k])
    return _poly_area_batched(poly, n)


def _quad_intersection_area(subject: jnp.ndarray, clip: jnp.ndarray) -> jnp.ndarray:
    """Single-pair convenience wrapper."""
    return _quad_intersection_area_batched(subject[None], clip[None])[0]


_BIG = 1e9


def _edge_clip_cross_sum(
    subject: jnp.ndarray, rect: jnp.ndarray, dedup: bool = False
) -> jnp.ndarray:
    """Green's-theorem contribution of subject edges clipped to a rectangle.

    subject: (P, 4, 2) ccw quad whose edges are clipped; rect: (P, 4, 2) ccw
    RECTANGLE (orthogonal edges).  For each subject edge, Liang–Barsky slab
    clipping in rect's local frame yields the sub-segment inside rect; the
    returned (P,) value is sum_e cross(q0_e, q1_e) over those sub-segments,
    with endpoints evaluated in the caller's (common) coordinate frame.

    dedup: a subject edge that lies ON rect's boundary traversed in the
    SAME direction as rect's own edge on that line (interiors on the same
    side — e.g. two boxes sharing part of a face) is emitted by BOTH of the
    symmetric _edge_clip_cross_sum calls; with dedup=True this call
    subtracts its own copy of every such segment, so across the pair of
    calls (dedup on exactly one) each is counted exactly once.  Opposite-
    direction coincident edges (boxes merely touching) are left alone: the
    two copies cancel by sign.
    """
    # rect local frame: origin c0, orthonormal axes u, v; slabs [0,|U|]x[0,|V|]
    c0 = rect[:, 0, :]
    U = rect[:, 1, :] - c0
    V = rect[:, 3, :] - c0
    lu = jnp.sqrt(jnp.sum(U * U, -1))
    lv = jnp.sqrt(jnp.sum(V * V, -1))
    u = U / jnp.maximum(lu, _EPS)[:, None]
    v = V / jnp.maximum(lv, _EPS)[:, None]

    p0 = subject  # (P, 4, 2): edge starts
    p1 = jnp.roll(subject, -1, axis=1)  # edge ends
    d = p1 - p0

    def loc(p, axis):  # project into the slab axis
        return jnp.sum((p - c0[:, None, :]) * axis[:, None, :], -1)

    PAR_EPS = 1e-5

    def slab_interval(p0k, dk, hi):
        """Entry/exit params of the segment for one slab [0, hi], plus
        on-lower/on-upper flags for boundary-collinear parallel edges.

        PAR_EPS is sized for f32 dot-product rounding (~1e-6 at room
        scale): an edge whose projected direction moves < 1e-5 across the
        slab over its whole length IS parallel for area purposes — the
        tight 1e-8 guard would instead divide rounding noise into garbage
        t-values for exactly-collinear (identical-rect) boundaries.  The
        matching boundary tolerance keeps such edges from dropping out;
        the same-direction double counts they cause are removed exactly by
        the dedup subtraction below, opposite-direction (touching)
        overlaps cancel by sign.
        """
        parallel = jnp.abs(dk) < PAR_EPS
        safe = jnp.where(parallel, PAR_EPS, dk)
        t1 = (0.0 - p0k) / safe
        t2 = (hi[:, None] - p0k) / safe
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        par_in = (p0k >= -PAR_EPS) & (p0k <= hi[:, None] + PAR_EPS)
        tmin = jnp.where(parallel, jnp.where(par_in, -_BIG, _BIG), tmin)
        tmax = jnp.where(parallel, jnp.where(par_in, _BIG, -_BIG), tmax)
        on_lo = parallel & (jnp.abs(p0k) <= PAR_EPS)
        on_hi = parallel & (jnp.abs(p0k - hi[:, None]) <= PAR_EPS)
        return tmin, tmax, on_lo, on_hi

    pu0 = loc(p0, u)
    pv0 = loc(p0, v)
    amin, amax, au_lo, au_hi = slab_interval(pu0, loc(p1, u) - pu0, lu)
    bmin, bmax, bv_lo, bv_hi = slab_interval(pv0, loc(p1, v) - pv0, lv)
    t0 = jnp.clip(jnp.maximum(amin, bmin), 0.0, 1.0)
    t1 = jnp.clip(jnp.minimum(amax, bmax), 0.0, 1.0)
    live = t1 > t0  # (P, 4)

    q0 = p0 + t0[..., None] * d
    q1 = p0 + t1[..., None] * d
    cross = q0[..., 0] * q1[..., 1] - q0[..., 1] * q1[..., 0]
    total = jnp.sum(jnp.where(live, cross, 0.0), axis=1)
    if dedup:
        # same-direction test: subject interior is LEFT of d (ccw); rect
        # interior is on the +axis side of a lower slab boundary and the
        # -axis side of an upper one.  left(d).axis == cross2(d, axis).
        cdu = d[..., 0] * u[:, None, 1] - d[..., 1] * u[:, None, 0]
        cdv = d[..., 0] * v[:, None, 1] - d[..., 1] * v[:, None, 0]
        dup = (
            (au_lo & (cdu > 0))
            | (au_hi & (cdu < 0))
            | (bv_lo & (cdv > 0))
            | (bv_hi & (cdv < 0))
        )
        total = total - jnp.sum(jnp.where(live & dup, cross, 0.0), axis=1)
    return total


def _rect_intersection_area_batched(rect1: jnp.ndarray, rect2: jnp.ndarray) -> jnp.ndarray:
    """Exact intersection area of P pairs of ccw RECTANGLES: (P,4,2)x2 -> (P,).

    Green's theorem over the boundary of the intersection: that boundary is
    exactly (rect1-edge parts inside rect2) + (rect2-edge parts inside
    rect1), a closed ccw loop, so the shoelace sum telescopes across the
    sub-segments — no vertex buffers, no compaction, no sorting.  ~6x less
    work than the Sutherland–Hodgman clip with one-hot compaction this
    replaces (the matcher's rotated-GIoU cost matrix went from ~55% to
    ~20% of the SUN RGB-D train step), and exact for the rectangle-only
    BEV case; the generic-polygon SH path remains below for reuse.
    """
    # common translation frame for the telescoping shoelace sum (cross terms
    # are translation-sensitive individually, only the closed loop is not —
    # and f32 benefits from small coordinates)
    center = 0.125 * (jnp.sum(rect1, axis=1) + jnp.sum(rect2, axis=1))
    r1 = rect1 - center[:, None, :]
    r2 = rect2 - center[:, None, :]
    # dedup on exactly ONE of the symmetric calls: shared-face segments
    # (same-direction collinear boundaries — identical rects, a contained
    # rect sharing part of a face, side-by-side rects with flush tops) are
    # emitted by both calls but must enter the loop integral once; see
    # _edge_clip_cross_sum(dedup=...)
    s = _edge_clip_cross_sum(r1, r2, dedup=True) + _edge_clip_cross_sum(r2, r1)

    def rect_area(r):
        U = r[:, 1, :] - r[:, 0, :]
        V = r[:, 3, :] - r[:, 0, :]
        return jnp.abs(U[:, 0] * V[:, 1] - U[:, 1] * V[:, 0])

    # cap at min(area1, area2): with the dedup subtraction the loop integral
    # is already exact for every shared-boundary configuration; the cap
    # remains as a safety net for degenerate zero-size rects (whose local
    # frame axes are ill-defined) and f32 rounding noise.
    return jnp.minimum(0.5 * jnp.abs(s), jnp.minimum(rect_area(r1), rect_area(r2)))


def rotated_bev_intersection_area(rect1: jnp.ndarray, rect2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise BEV intersection areas for rotated rectangles.

    rect1: (..., K1, 4, 2), rect2: (..., K2, 4, 2), ccw ordered.
    Returns (..., K1, K2).
    """
    batch_shape = rect1.shape[:-3]
    K1, K2 = rect1.shape[-3], rect2.shape[-3]
    r1 = jnp.broadcast_to(
        rect1[..., :, None, :, :], batch_shape + (K1, K2, 4, 2)
    ).reshape(-1, 4, 2)
    r2 = jnp.broadcast_to(
        rect2[..., None, :, :, :], batch_shape + (K1, K2, 4, 2)
    ).reshape(-1, 4, 2)
    areas = _rect_intersection_area_batched(r1, r2)
    return areas.reshape(batch_shape + (K1, K2))


# ---------------------------------------------------------------------------
# GIoU
# ---------------------------------------------------------------------------


def _bev_rect(corners: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame corners (..., 8, 3) -> ccw BEV rectangle (..., 4, 2) in (x, z).

    Matches the reference index flip (utils/box_util.py:549-554).
    """
    top = corners[..., jnp.array([3, 2, 1, 0]), :]
    return top[..., jnp.array([0, 2])]


def enclosing_aabb_volume(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """Volume of the axis-aligned box enclosing each (box1, box2) pair.

    corners1 (B, K1, 8, 3), corners2 (B, K2, 8, 3) -> (B, K1, K2).
    Reference utils/box_util.py:466-514.
    """
    mn1 = jnp.min(corners1, axis=2)  # (B, K1, 3)
    mx1 = jnp.max(corners1, axis=2)
    mn2 = jnp.min(corners2, axis=2)
    mx2 = jnp.max(corners2, axis=2)
    mn = jnp.minimum(mn1[:, :, None, :], mn2[:, None, :, :])
    mx = jnp.maximum(mx1[:, :, None, :], mx2[:, None, :, :])
    diff = mx - mn
    return diff[..., 0] * diff[..., 1] * diff[..., 2]


def _pairwise_heights(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """Vertical overlap; up is -Y so corner 0 is the top face, corner 4 bottom.

    Reference utils/box_util.py:543-546.
    """
    ymax = jnp.minimum(corners1[:, :, 0, 1][:, :, None], corners2[:, :, 0, 1][:, None, :])
    ymin = jnp.maximum(corners1[:, :, 4, 1][:, :, None], corners2[:, :, 4, 1][:, None, :])
    return jnp.clip(ymax - ymin, 0.0)


def _axis_aligned_bev_inter(rect1: jnp.ndarray, rect2: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned BEV overlap using rect vertex 1 (min) and 3 (max).

    Exact for unrotated boxes; an upper-bound prefilter otherwise.
    Reference utils/box_util.py:556-560.
    """
    lt = jnp.maximum(rect1[:, :, None, 1, :], rect2[:, None, :, 1, :])
    rb = jnp.minimum(rect1[:, :, None, 3, :], rect2[:, None, :, 3, :])
    wh = jnp.clip(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def generalized_box3d_iou(
    corners1: jnp.ndarray,
    corners2: jnp.ndarray,
    nums_k2: jnp.ndarray | None = None,
    rotated_boxes: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Pairwise generalized IoU between two corner sets.

    corners1: (B, K1, 8, 3) predictions, corners2: (B, K2, 8, 3) targets,
    camera frame (up = -Y), rotation about the vertical axis only.
    nums_k2: (B,) count of valid targets; columns beyond it are zeroed.

    compute_dtype=bfloat16 halves the polygon-clip bandwidth (~2x faster);
    the ~0.4%-relative area error is negligible for matching costs and the
    GIoU loss (golden parity tests use the float32 default).

    Differentiable; runs entirely on device (contrast reference
    utils/box_util.py:717-737 which dispatches to CPU Cython under no_grad).
    """
    from ov3det.geometry.boxes import box_volume_from_corners

    out_dtype = corners1.dtype
    corners1 = corners1.astype(compute_dtype)
    corners2 = corners2.astype(compute_dtype)

    B, K1 = corners1.shape[0], corners1.shape[1]
    K2 = corners2.shape[1]

    height = _pairwise_heights(corners1, corners2)
    rect1 = _bev_rect(corners1)
    rect2 = _bev_rect(corners2)
    non_rot_inter = _axis_aligned_bev_inter(rect1, rect2)

    if nums_k2 is not None:
        k2_mask = jnp.arange(K2)[None, :] < nums_k2[:, None]  # (B, K2)
        non_rot_inter = non_rot_inter * k2_mask[:, None, :]

    enclosing_vols = enclosing_aabb_volume(corners1, corners2)
    vols1 = jnp.clip(box_volume_from_corners(corners1), _EPS)
    vols2 = jnp.clip(box_volume_from_corners(corners2), _EPS)
    sum_vols = vols1[:, :, None] + vols2[:, None, :]
    good_boxes = (enclosing_vols > 2 * _EPS) & (sum_vols > 4 * _EPS)

    if rotated_boxes:
        inter_areas = rotated_bev_intersection_area(rect1, rect2)
        # zero pairs the reference skips (no axis-aligned overlap / padded gt)
        inter_areas = jnp.where(non_rot_inter > 0, inter_areas, 0.0)
    else:
        inter_areas = non_rot_inter

    inter_vols = inter_areas * height
    union_vols = jnp.clip(sum_vols - inter_vols, _EPS)
    ious = inter_vols / union_vols
    gious = ious - (1.0 - union_vols / enclosing_vols)
    gious = gious * good_boxes
    if nums_k2 is not None:
        gious = gious * k2_mask[:, None, :]
    return gious.astype(out_dtype)


def axis_aligned_iou_3d(aabb1: jnp.ndarray, aabb2: jnp.ndarray) -> jnp.ndarray:
    """IoU between (..., K1, 6) and (..., K2, 6) [xmin,ymin,zmin,xmax,ymax,zmax]."""
    mn1, mx1 = aabb1[..., :, None, 0:3], aabb1[..., :, None, 3:6]
    mn2, mx2 = aabb2[..., None, :, 0:3], aabb2[..., None, :, 3:6]
    inter = jnp.clip(jnp.minimum(mx1, mx2) - jnp.maximum(mn1, mn2), 0.0)
    inter_vol = inter[..., 0] * inter[..., 1] * inter[..., 2]
    v1 = jnp.prod(mx1 - mn1, -1)
    v2 = jnp.prod(mx2 - mn2, -1)
    return inter_vol / jnp.clip(v1 + v2 - inter_vol, _EPS)


def box3d_iou_corners(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """Exact rotated 3D IoU of two single boxes (8, 3) each, camera frame.

    Host-side eval parity with reference box3d_iou (utils/box_util.py:116-141):
    BEV polygon-clip intersection x vertical overlap over union.
    """
    rect1 = _bev_rect(corners1[None, None])[0, 0]
    rect2 = _bev_rect(corners2[None, None])[0, 0]
    inter_area = _quad_intersection_area(rect1, rect2)
    ymax = jnp.minimum(corners1[0, 1], corners2[0, 1])
    ymin = jnp.maximum(corners1[4, 1], corners2[4, 1])
    inter_vol = inter_area * jnp.clip(ymax - ymin, 0.0)
    from ov3det.geometry.boxes import box_volume_from_corners

    v1 = box_volume_from_corners(corners1[None])[0]
    v2 = box_volume_from_corners(corners2[None])[0]
    return inter_vol / jnp.clip(v1 + v2 - inter_vol, _EPS)
