"""Tests for point-cloud ops and the in-jit Hungarian solver."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from ov3det.ops import (
    auction_lap,
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
)


def fps_oracle(xyz, k):
    """Greedy maximin FPS in plain numpy (seed = index 0)."""
    N = xyz.shape[0]
    inds = np.zeros(k, np.int32)
    min_d2 = np.full(N, np.inf)
    for i in range(1, k):
        d2 = np.sum((xyz - xyz[inds[i - 1]]) ** 2, axis=-1)
        min_d2 = np.minimum(min_d2, d2)
        inds[i] = int(np.argmax(min_d2))
    return inds


class TestFPS:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        xyz = rng.normal(size=(2, 300, 3)).astype(np.float32)
        inds = np.asarray(furthest_point_sample(jnp.asarray(xyz), 32))
        for b in range(2):
            np.testing.assert_array_equal(inds[b], fps_oracle(xyz[b], 32))

    def test_pallas_shard_map_matches_single_device(self):
        """Under a data mesh the Pallas kernel runs inside shard_map
        (batch-parallel); indices must equal the single-device XLA path
        exactly — the kernel is exact greedy FPS, not an approximation."""
        from ov3det.parallel import make_mesh, set_data_mesh, shard_batch

        rng = np.random.default_rng(7)
        xyz = rng.normal(size=(8, 256, 3)).astype(np.float32)
        want = np.asarray(furthest_point_sample(jnp.asarray(xyz), 32))

        mesh = make_mesh(8)
        try:
            sharded = shard_batch({"x": xyz}, mesh)["x"]
            got = np.asarray(
                furthest_point_sample(sharded, 32, use_pallas=True)
            )
        finally:
            set_data_mesh(None)
        np.testing.assert_array_equal(got, want)

    def test_no_duplicates_and_spread(self):
        rng = np.random.default_rng(1)
        xyz = rng.uniform(size=(1, 500, 3)).astype(np.float32)
        inds = np.asarray(furthest_point_sample(jnp.asarray(xyz), 64))[0]
        assert len(set(inds.tolist())) == 64
        # FPS must beat random sampling on minimum pairwise distance
        sel = xyz[0][inds]
        d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        rand = xyz[0][rng.choice(500, 64, replace=False)]
        dr = np.linalg.norm(rand[:, None] - rand[None, :], axis=-1)
        np.fill_diagonal(dr, np.inf)
        assert d.min() > dr.min()


class TestBallQuery:
    def test_matches_first_k_oracle(self):
        rng = np.random.default_rng(2)
        xyz = rng.uniform(-1, 1, size=(2, 200, 3)).astype(np.float32)
        centers = xyz[:, :16]
        r, K = 0.35, 8
        idx = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(centers), r, K))
        for b in range(2):
            for m in range(16):
                d2 = np.sum((xyz[b] - centers[b, m]) ** 2, -1)
                hits = np.where(d2 < r * r)[0][:K]
                want = np.concatenate([hits, np.full(K - len(hits), hits[0])])
                np.testing.assert_array_equal(idx[b, m], want)

    def test_group_points_layout(self):
        rng = np.random.default_rng(3)
        xyz = rng.uniform(-1, 1, size=(1, 50, 3)).astype(np.float32)
        feat = rng.normal(size=(1, 50, 4)).astype(np.float32)
        centers = xyz[:, :5]
        idx = ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.5, 6)
        grouped = np.asarray(
            group_points(
                jnp.asarray(xyz), jnp.asarray(feat), jnp.asarray(centers), idx, 0.5
            )
        )
        assert grouped.shape == (1, 5, 6, 7)
        i0 = int(np.asarray(idx)[0, 0, 0])
        np.testing.assert_allclose(
            grouped[0, 0, 0, :3], (xyz[0, i0] - centers[0, 0]) / 0.5, atol=1e-6
        )
        np.testing.assert_allclose(grouped[0, 0, 0, 3:], feat[0, i0], atol=1e-6)

    def test_gather_points(self):
        rng = np.random.default_rng(4)
        pts = rng.normal(size=(2, 30, 5)).astype(np.float32)
        inds = rng.integers(0, 30, size=(2, 7)).astype(np.int32)
        out = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(inds)))
        for b in range(2):
            np.testing.assert_array_equal(out[b], pts[b][inds[b]])


class TestAuctionLAP:
    def _check_against_scipy(self, cost, n_persons, tol=0.1):
        B, P, O = cost.shape
        p2o, obj_assigned, o2p = jax.jit(auction_lap)(
            jnp.asarray(cost), jnp.asarray(n_persons)
        )
        p2o = np.asarray(p2o)
        obj_assigned = np.asarray(obj_assigned)
        o2p = np.asarray(o2p)
        for b in range(B):
            n = n_persons[b]
            if n == 0:
                assert obj_assigned[b].sum() == 0
                continue
            rows, cols = linear_sum_assignment(cost[b, :n])
            ref_cost = cost[b, rows, cols].sum()
            objs = p2o[b, :n]
            assert len(set(objs.tolist())) == n, "assignment must be injective"
            ours_cost = cost[b, np.arange(n), objs].sum()
            assert ours_cost <= ref_cost + tol, (b, ours_cost, ref_cost)
            # dense layout consistency
            assert obj_assigned[b].sum() == n
            for p in range(n):
                assert o2p[b, objs[p]] == p

    def test_random_matrices(self):
        rng = np.random.default_rng(5)
        cost = rng.normal(size=(8, 16, 64)).astype(np.float32) * 5
        n_persons = np.array([16, 12, 8, 16, 1, 0, 5, 16], np.int32)
        self._check_against_scipy(cost, n_persons)

    def test_detection_scale_costs(self):
        # magnitudes similar to the real matcher cost (center-L1 * 5 etc.)
        rng = np.random.default_rng(6)
        B, P, O = 4, 32, 128
        cost = (
            rng.uniform(0, 30, size=(B, P, O)) - rng.uniform(0, 2, size=(B, P, O))
        ).astype(np.float32)
        n_persons = np.array([32, 20, 3, 32], np.int32)
        self._check_against_scipy(cost, n_persons)

    def test_exact_on_well_separated(self):
        # when costs are well-separated the argmin assignment must be exact
        rng = np.random.default_rng(7)
        B, P, O = 4, 8, 32
        cost = rng.integers(0, 50, size=(B, P, O)).astype(np.float32)
        n_persons = np.full((B,), P, np.int32)
        p2o, _, _ = auction_lap(jnp.asarray(cost), jnp.asarray(n_persons))
        p2o = np.asarray(p2o)
        for b in range(B):
            rows, cols = linear_sum_assignment(cost[b])
            ref = cost[b][rows, cols].sum()
            ours = cost[b][np.arange(P), p2o[b]].sum()
            assert abs(ours - ref) < 1e-2

    def test_duplicate_rows_terminate(self):
        # adversarial: identical persons trigger eps price wars; must still
        # terminate with a feasible (injective) assignment of bounded cost
        rng = np.random.default_rng(8)
        row = rng.normal(size=(1, 1, 64)).astype(np.float32) * 5
        cost = np.tile(row, (2, 16, 1))
        n_persons = np.array([16, 16], np.int32)
        p2o, obj_assigned, _ = auction_lap(jnp.asarray(cost), jnp.asarray(n_persons))
        p2o = np.asarray(p2o)
        for b in range(2):
            assert len(set(p2o[b].tolist())) == 16
            rows, cols = linear_sum_assignment(cost[b])
            ref = cost[b][rows, cols].sum()
            ours = cost[b][np.arange(16), p2o[b]].sum()
            assert ours <= ref + 0.5

    def test_sharded_quality(self):
        # sharded FPS trades packing for parallelism; what center seeding
        # needs is COVERAGE — fill distance (worst point's distance to its
        # nearest selected center) must stay near exact FPS and beat random
        rng = np.random.default_rng(9)
        xyz = rng.uniform(size=(1, 2048, 3)).astype(np.float32)
        exact = np.asarray(furthest_point_sample(jnp.asarray(xyz), 128, shards=1))[0]
        sharded = np.asarray(furthest_point_sample(jnp.asarray(xyz), 128, shards=4))[0]
        assert len(set(sharded.tolist())) == 128
        assert sharded.max() < 2048 and sharded.min() >= 0

        def fill(sel):
            d = np.linalg.norm(xyz[0][:, None] - xyz[0][sel][None, :], axis=-1)
            return d.min(axis=1).max()

        rand = rng.choice(2048, 128, replace=False)
        assert fill(sharded) < fill(rand)
        assert fill(sharded) < 1.6 * fill(exact)


class TestBallGroup:
    def test_matches_bucketed_query_plus_group(self):
        import jax
        from ov3det.ops import ball_group

        rng = np.random.default_rng(20)
        xyz = rng.uniform(-1, 1, size=(2, 256, 3)).astype(np.float32)
        feat = rng.normal(size=(2, 256, 4)).astype(np.float32)
        centers = xyz[:, :16]
        r, K = 0.5, 8
        idx = ball_query(jnp.asarray(xyz), jnp.asarray(centers), r, K, method="bucketed")
        want = np.asarray(
            group_points(jnp.asarray(xyz), jnp.asarray(feat), jnp.asarray(centers), idx, r)
        )
        got = np.asarray(
            jax.jit(lambda *a: ball_group(*a, r, K))(
                jnp.asarray(xyz), jnp.asarray(feat), jnp.asarray(centers)
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPallasFPS:
    def test_matches_xla_reference_interpret(self):
        from ov3det.ops.pallas.fps_kernel import furthest_point_sample_pallas

        rng = np.random.default_rng(21)
        xyz = jnp.asarray(rng.uniform(-2, 2, size=(2, 512, 3)).astype(np.float32))
        ref = np.asarray(furthest_point_sample(xyz, 64))
        got = np.asarray(furthest_point_sample_pallas(xyz, 64, interpret=True))
        np.testing.assert_array_equal(got, ref)


class TestAuctionAdversarial:
    """Property test for the documented eps-optimality bound on the
    pathological near-duplicate-GT case (the eps price-war regime the
    ops/hungarian.py docstring warns about): total assigned cost must stay
    within P * eps_loose of scipy's optimum, where eps_loose =
    5e-3 * benefit span (the loose-phase epsilon)."""

    def _bound_check(self, cost, n_persons):
        p2o, obj_assigned, _ = jax.jit(auction_lap)(
            jnp.asarray(cost), jnp.asarray(n_persons)
        )
        p2o = np.asarray(p2o)
        B = cost.shape[0]
        for b in range(B):
            n = int(n_persons[b])
            span = float(cost[b, :n].max() - cost[b, :n].min())
            eps_bound = n * 5e-3 * max(span, 1e-3)
            rows, cols = linear_sum_assignment(cost[b, :n])
            ref = cost[b, rows, cols].sum()
            objs = p2o[b, :n]
            assert len(set(objs.tolist())) == n, "must stay injective"
            ours = cost[b, np.arange(n), objs].sum()
            assert ours <= ref + eps_bound + 1e-4, (b, ours, ref, eps_bound)

    def test_near_duplicate_clusters(self):
        # clusters of nearly identical GT rows at detection-cost scale
        for seed in range(6):
            rng = np.random.default_rng(100 + seed)
            B, P, O = 4, 16, 64
            n_clusters = rng.integers(1, 5)
            protos = rng.uniform(0, 30, size=(B, n_clusters, O))
            assign = rng.integers(0, n_clusters, size=P)
            cost = protos[:, assign, :] + rng.normal(size=(B, P, O)) * 1e-5
            cost = cost.astype(np.float32)
            n_persons = np.array([P, P - 3, 2, P], np.int32)
            self._bound_check(cost, n_persons)

    def test_duplicate_block_plus_decoys(self):
        # all-identical rows except one strictly better column per person:
        # the optimum is unique and the auction must find it despite the ties
        rng = np.random.default_rng(200)
        B, P, O = 2, 12, 48
        base = np.tile(rng.uniform(5, 10, size=(B, 1, O)), (1, P, 1))
        cost = base.astype(np.float32)
        for b in range(B):
            cols = rng.choice(O, size=P, replace=False)
            cost[b, np.arange(P), cols] = 0.0  # unique cheap column each
        n_persons = np.full((B,), P, np.int32)
        p2o, _, _ = auction_lap(jnp.asarray(cost), jnp.asarray(n_persons))
        p2o = np.asarray(p2o)
        for b in range(B):
            assert (cost[b, np.arange(P), p2o[b]] == 0.0).all()


class TestPallasBallGroup:
    """The fused VMEM-resident kernel vs the XLA ball_group oracle.

    Layouts differ by design (kernel: (B, K, M, P); XLA: (B, M, K, P)) —
    tests compare after transposition.  Test data keeps points away from
    the exact radius boundary so the kernel's direct-difference distance
    and the oracle's |c|^2+|x|^2-2cx expansion cannot disagree on
    membership.
    """

    def _data(self, seed, B=2, N=250, C=4, M=16):
        rng = np.random.default_rng(seed)
        xyz = rng.uniform(-1, 1, size=(B, N, 3)).astype(np.float32)
        feat = rng.normal(size=(B, N, C)).astype(np.float32)
        centers = xyz[:, :M].copy()
        centers[:, -1] += 50.0  # one center with an empty ball everywhere
        return xyz, feat, centers

    def test_matches_xla_oracle(self):
        from ov3det.ops import ball_group
        from ov3det.ops.pallas.ball_group_kernel import ball_group_pallas

        xyz, feat, centers = self._data(31)
        r, K = 0.5, 8  # N=250 not divisible by K: exercises padding
        want = np.asarray(
            ball_group(jnp.asarray(xyz), jnp.asarray(feat),
                       jnp.asarray(centers), r, K)
        )
        got = np.asarray(
            jax.jit(
                lambda x, f, c: ball_group_pallas(x, f, c, r, K, True, True)
            )(jnp.asarray(xyz), jnp.asarray(feat), jnp.asarray(centers))
        )
        np.testing.assert_allclose(
            got.transpose(0, 2, 1, 3), want, atol=1e-5
        )

    def test_no_features(self):
        from ov3det.ops import ball_group
        from ov3det.ops.pallas.ball_group_kernel import ball_group_pallas

        xyz, _, centers = self._data(32)
        r, K = 0.4, 16
        want = np.asarray(
            ball_group(jnp.asarray(xyz), None, jnp.asarray(centers), r, K,
                       normalize_xyz=False)
        )
        got = np.asarray(
            ball_group_pallas(jnp.asarray(xyz), None, jnp.asarray(centers),
                              r, K, False, True)
        )
        np.testing.assert_allclose(got.transpose(0, 2, 1, 3), want, atol=1e-5)

    def test_feature_grad_matches_xla(self):
        from ov3det.ops import ball_group
        from ov3det.ops.pallas.ball_group_kernel import ball_group_pallas

        xyz, feat, centers = self._data(33, N=128, C=6, M=8)
        r, K = 0.5, 8
        w = np.asarray(
            np.random.default_rng(7).normal(size=(2, 8, K, 9))
        ).astype(np.float32)  # (B, M, K, 3+C) weights

        def loss_xla(f):
            g = ball_group(jnp.asarray(xyz), f, jnp.asarray(centers), r, K)
            return jnp.sum(g * w)

        def loss_pl(f):
            g = ball_group_pallas(jnp.asarray(xyz), f, jnp.asarray(centers),
                                  r, K, True, True)
            return jnp.sum(g * jnp.asarray(w).transpose(0, 2, 1, 3))

        want = np.asarray(jax.grad(loss_xla)(jnp.asarray(feat)))
        got = np.asarray(jax.grad(loss_pl)(jnp.asarray(feat)))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_sa_module_layouts_agree(self, monkeypatch):
        """PointnetSAModule output is identical through the Pallas (K-major)
        and XLA (M-major) grouping paths — the MLP + max-pool are
        layout-agnostic."""
        from ov3det.models.pointnet import PointnetSAModule

        xyz, feat, _ = self._data(34, N=256, C=4)
        sa = PointnetSAModule(npoint=32, radius=0.4, nsample=8,
                              mlp_dims=(16, 32))
        variables = sa.init(jax.random.PRNGKey(0), jnp.asarray(xyz),
                            jnp.asarray(feat))

        def run():
            return sa.apply(variables, jnp.asarray(xyz), jnp.asarray(feat))

        monkeypatch.setenv("OV3DET_BALLGROUP", "xla")
        new_xyz_a, feats_a, inds_a = run()
        monkeypatch.setenv("OV3DET_BALLGROUP", "pallas")
        new_xyz_b, feats_b, inds_b = run()
        np.testing.assert_array_equal(np.asarray(inds_a), np.asarray(inds_b))
        np.testing.assert_allclose(
            np.asarray(feats_a), np.asarray(feats_b), atol=2e-5, rtol=1e-5
        )
