"""Fused-ADMM Pallas kernel (experimental backend) — interpret-mode
differential tests: the kernel must reproduce the dense XLA backend's
iterates bit-for-bat on CPU."""

import numpy as np
import pytest

import spcies_tpu as sp


@pytest.fixture(scope="module")
def fixture():
    return sp.systems.tester_fixture()


def _solvers(sys, param, tol=1e-4, k_max=1000, tile_b=8, **fused_kw):
    opts = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=tol,
                              k_max=k_max, pallas_interpret=True,
                              tile_b=tile_b, **fused_kw)
    opts.precision = "float"
    s_f = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                         backend="fused", options=opts)
    opts_d = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=tol,
                                k_max=k_max)
    opts_d.precision = "float"
    s_d = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                         options=opts_d)
    return s_f, s_d


def test_fused_matches_dense_exactly(fixture):
    sys, param, st = fixture
    s_f, s_d = _solvers(sys, param)
    rng = np.random.default_rng(0)
    B = 8
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    rf = s_f(x0, xr, ur)
    rd = s_d(x0, xr, ur)
    np.testing.assert_array_equal(np.asarray(rf.k), np.asarray(rd.k))
    np.testing.assert_array_equal(np.asarray(rf.e_flag),
                                  np.asarray(rd.e_flag))
    for key in ("z", "v", "lam"):
        np.testing.assert_array_equal(np.asarray(rf.sol[key]),
                                      np.asarray(rd.sol[key]))


def test_fused_exact_k_free_run(fixture):
    """exact_k=True with check_every>1: free-run windows + per-iteration
    replay of each lane's convergence window must reproduce the dense
    masked loop BIT-EXACTLY (k, e_flag, frozen iterates) — the reference
    exit semantics (code_laxMPC_ADMM_C.c:570-631) at free-run speed."""
    sys, param, st = fixture
    s_f, s_d = _solvers(sys, param, check_every=8, exact_k=True)
    rng = np.random.default_rng(2)
    B = 8
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    rf = s_f(x0, xr, ur)
    rd = s_d(x0, xr, ur)
    np.testing.assert_array_equal(np.asarray(rf.k), np.asarray(rd.k))
    np.testing.assert_array_equal(np.asarray(rf.e_flag),
                                  np.asarray(rd.e_flag))
    for key in ("z", "v", "lam", "r_p", "r_d"):
        np.testing.assert_array_equal(np.asarray(rf.sol[key]),
                                      np.asarray(rd.sol[key]))
    # k_max-capped lanes must also match exactly (e_flag -1 path)
    s_f2, s_d2 = _solvers(sys, param, check_every=8, exact_k=True,
                          k_max=37, tol=1e-12)
    rf2 = s_f2(x0, xr, ur)
    rd2 = s_d2(x0, xr, ur)
    np.testing.assert_array_equal(np.asarray(rf2.k), np.asarray(rd2.k))
    np.testing.assert_array_equal(np.asarray(rf2.e_flag),
                                  np.asarray(rd2.e_flag))
    for key in ("z", "v", "lam"):
        np.testing.assert_array_equal(np.asarray(rf2.sol[key]),
                                      np.asarray(rd2.sol[key]))


def test_fused_batch_padding(fixture):
    """Batch sizes that are not tile multiples are padded internally and
    results sliced back."""
    sys, param, st = fixture
    s_f, s_d = _solvers(sys, param)
    B = 5   # not a multiple of tile_b=8
    rng = np.random.default_rng(1)
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B, 1))
    rf = s_f(x0, np.tile(st["xr"], (B, 1)), np.tile(st["ur"], (B, 1)))
    rd = s_d(x0, np.tile(st["xr"], (B, 1)), np.tile(st["ur"], (B, 1)))
    assert rf.u.shape == (B, 2)
    np.testing.assert_array_equal(np.asarray(rf.k), np.asarray(rd.k))


def test_fused_warm_start(fixture):
    sys, param, st = fixture
    s_f, _ = _solvers(sys, param)
    cold = s_f(st["x"], st["xr"], st["ur"])
    init = (cold.sol["z"], cold.sol["v"], cold.sol["lam"])
    warm = s_f(st["x"], st["xr"], st["ur"], init=init)
    assert int(warm.k[0]) < int(cold.k[0])


def test_fused_rejects_fp64(fixture):
    sys, param, st = fixture
    with pytest.raises(ValueError, match="fp32"):
        sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                       backend="fused", rho=15.0)


def test_fused_fixed_iters_matches_dense(fixture):
    """fixed_iters benchmark mode (no exit tests) runs the same iteration
    sequence as the dense engine's fixed mode."""
    sys, param, st = fixture
    s_f, s_d = _solvers(sys, param)
    B = 8
    x0 = np.tile(np.asarray(st["x"]) * 1.3, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    rf = s_f(x0, xr, ur, fixed_iters=50)
    rd = s_d(x0, xr, ur, fixed_iters=50)
    assert np.all(np.asarray(rf.k) == 50)
    assert np.all(np.asarray(rf.e_flag) == 1)
    for key in ("v", "lam"):
        np.testing.assert_allclose(np.asarray(rf.sol[key]),
                                   np.asarray(rd.sol[key]),
                                   rtol=0, atol=1e-6)


def test_fused_check_every_and_relaxation(fixture):
    """check_every > 1 (free-running between convergence checks) and
    relax_alpha: same converged solution as the dense engine; k reported
    at check granularity (within check_every of the exact count)."""
    sys, param, st = fixture
    opts = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-4,
                              k_max=1000, pallas_interpret=True, tile_b=8,
                              check_every=8, relax_alpha=1.8)
    opts.precision = "float"
    s_f = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                         backend="fused", options=opts)
    opts_d = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-4,
                                k_max=1000, relax_alpha=1.8)
    opts_d.precision = "float"
    s_d = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                         options=opts_d)
    rng = np.random.default_rng(2)
    B = 8
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    rf = s_f(x0, xr, ur)
    rd = s_d(x0, xr, ur)
    assert np.all(np.asarray(rf.e_flag) == 1)
    kf, kd = np.asarray(rf.k), np.asarray(rd.k)
    assert np.all(kf >= kd) and np.all(kf <= kd + 8)
    assert np.all(kf % 8 == 0)
    # free-running lanes over-converge: u agrees to tolerance-class accuracy
    assert np.max(np.abs(np.asarray(rf.u) - np.asarray(rd.u))) < 1e-4


@pytest.mark.parametrize("formulation", ["equMPC", "MPCT-cs"])
def test_fused_generalizes_to_other_box_admm(fixture, formulation):
    """The fused backend is formulation-generic over dense box-ADMM:
    equMPC and MPCT-ADMM-cs run the same kernel, matching their dense
    engines exactly at check_every=1 (interpret mode)."""
    sys, param, st = fixture
    p = dict(param)
    kw = dict(rho=15.0, tol=1e-4, k_max=1000)
    if formulation == "equMPC":
        p.pop("T", None)
        fm = dict(formulation="equMPC", method="ADMM")
    else:
        p["T"] = 10.0 * np.asarray(p["Q"])
        p["S"] = np.asarray(p["R"]).copy()
        kw["rho"] = 1e-1
        fm = dict(formulation="MPCT", method="ADMM", submethod="cs")
    opts = sp.default_options(fm["formulation"], fm["method"],
                              fm.get("submethod", ""),
                              pallas_interpret=True, tile_b=8, **kw)
    opts.precision = "float"
    s_f = sp.make_solver(sys, p, backend="fused", options=opts, **fm)
    opts_d = sp.default_options(fm["formulation"], fm["method"],
                                fm.get("submethod", ""), **kw)
    opts_d.precision = "float"
    s_d = sp.make_solver(sys, p, options=opts_d, **fm)
    rng = np.random.default_rng(4)
    B = 8
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    rf = s_f(x0, xr, ur)
    rd = s_d(x0, xr, ur)
    np.testing.assert_array_equal(np.asarray(rf.k), np.asarray(rd.k))
    np.testing.assert_array_equal(np.asarray(rf.e_flag),
                                  np.asarray(rd.e_flag))
    assert np.max(np.abs(np.asarray(rf.u) - np.asarray(rd.u))) < 1e-6


def test_fused_interleave_bit_exact(fixture):
    """interleave=2/4 (independent sub-chains inside the free-run windows,
    the PROFILE_r04 latency-chain attack) must not change ANY result: the
    per-lane recursion is untouched, only the tile's sub-structure changes.
    Bit-exact vs the dense masked loop in exact-k mode, and vs interleave=1
    in plain free-run mode."""
    sys, param, st = fixture
    rng = np.random.default_rng(7)
    B = 16
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    for il in (2, 4):
        opts = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-4,
                                  k_max=1000, pallas_interpret=True,
                                  tile_b=16 * il // 2, check_every=8,
                                  exact_k=True, interleave=il)
        opts.precision = "float"
        s_il = sp.make_solver(sys, param, formulation="laxMPC",
                              method="ADMM", backend="fused", options=opts)
        opts_d = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-4,
                                    k_max=1000)
        opts_d.precision = "float"
        s_d = sp.make_solver(sys, param, formulation="laxMPC",
                             method="ADMM", options=opts_d)
        ri = s_il(x0, xr, ur)
        rd = s_d(x0, xr, ur)
        np.testing.assert_array_equal(np.asarray(ri.k), np.asarray(rd.k))
        np.testing.assert_array_equal(np.asarray(ri.e_flag),
                                      np.asarray(rd.e_flag))
        for key in ("z", "v", "lam"):
            np.testing.assert_array_equal(np.asarray(ri.sol[key]),
                                          np.asarray(rd.sol[key]))
    # free-run (non-exact-k) path: interleave=2 bit-equal to interleave=1
    s1, _ = _solvers(sys, param, check_every=8, tile_b=16)
    s2, _ = _solvers(sys, param, check_every=8, tile_b=16, interleave=2)
    r1, r2 = s1(x0, xr, ur), s2(x0, xr, ur)
    np.testing.assert_array_equal(np.asarray(r1.k), np.asarray(r2.k))
    for key in ("z", "v", "lam"):
        np.testing.assert_array_equal(np.asarray(r1.sol[key]),
                                      np.asarray(r2.sol[key]))


def test_fused_check_every_respects_k_max(fixture):
    """check_every blocks are clamped at k_max: no lane reports k > k_max
    and non-converging runs execute exactly k_max iterations."""
    sys, param, st = fixture
    opts = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-14,
                              k_max=10, pallas_interpret=True, tile_b=8,
                              check_every=8)
    opts.precision = "float"
    s = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                       backend="fused", options=opts)
    B = 8
    x0 = np.tile(np.asarray(st["x"]) * 2.0, (B, 1))
    res = s(x0, np.tile(st["xr"], (B, 1)), np.tile(st["ur"], (B, 1)))
    assert np.all(np.asarray(res.e_flag) == -1)
    assert np.all(np.asarray(res.k) <= 10)


def test_fused_sort_lanes_bit_exact(fixture):
    """sort_lanes (difficulty-ordered tiling, the tile-drain fix): per-
    lane results must be bit-identical to the dense loop in exact-k mode
    — tile composition only changes how long free-run windows run, and
    the replay reconstructs each lane's exit from its own snapshots."""
    sys, param, st = fixture
    rng = np.random.default_rng(9)
    B = 32
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    s_f, s_d = _solvers(sys, param, check_every=8, exact_k=True,
                        sort_lanes=True)
    rf = s_f(x0, xr, ur)
    rd = s_d(x0, xr, ur)
    np.testing.assert_array_equal(np.asarray(rf.k), np.asarray(rd.k))
    np.testing.assert_array_equal(np.asarray(rf.e_flag),
                                  np.asarray(rd.e_flag))
    for key in ("z", "v", "lam"):
        np.testing.assert_array_equal(np.asarray(rf.sol[key]),
                                      np.asarray(rd.sol[key]))
