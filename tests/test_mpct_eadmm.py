"""Differential tests for MPCT-EADMM (tests/test_MPCT_EADMM.m pattern):
tracking formulation on the oscillating-masses fixture with T=10Q, S=R."""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.oracle import mpct_eadmm_oracle
from tests.golden.mpct_eadmm_golden import Z1_OPT


@pytest.fixture(scope="module")
def fixture():
    sys, param, status = sp.systems.tester_fixture()
    param = dict(param)
    param["T"] = 10.0 * np.asarray(param["Q"])   # test_MPCT_EADMM.m:14
    param["S"] = np.asarray(param["R"]).copy()   # test_MPCT_EADMM.m:15
    return sys, param, status


OPTS = dict(rho_base=2.0, rho_mult=20.0, tol=1e-7, k_max=5000)


@pytest.fixture(scope="module")
def solver(fixture):
    sys, param, _ = fixture
    return sp.make_solver(sys, param, formulation="MPCT", method="EADMM",
                          **OPTS)


def test_vs_golden(solver, fixture):
    _, _, st = fixture
    res = solver(st["x"], st["xr"], st["ur"])
    assert int(res.e_flag[0]) == 1
    z1 = np.asarray(res.sol["z1"][0])
    assert np.max(np.abs(z1 - Z1_OPT)) <= 1e-4


def test_vs_oracle(solver, fixture):
    sys, param, st = fixture
    res = solver(st["x"], st["xr"], st["ur"])
    u_o, k_o, e_o, sol_o = mpct_eadmm_oracle(
        sys, param, st["x"], st["xr"], st["ur"], **OPTS)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z1", "z2", "z3", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-9
    assert np.max(np.abs(np.asarray(res.u[0]) - u_o)) < 1e-9


def test_artificial_reference_is_steady_state(solver, fixture):
    """(x_s, u_s) = z2 must satisfy x_s = A x_s + B u_s at convergence."""
    sys, _, st = fixture
    res = solver(st["x"], st["xr"], st["ur"])
    z2 = np.asarray(res.sol["z2"][0])
    n = solver.n
    xs, us = z2[:n], z2[n:]
    resid = np.asarray(sys["A"]) @ xs + np.asarray(sys["B"]) @ us - xs
    assert np.max(np.abs(resid)) < 1e-6


def test_batched_masking(solver, fixture):
    _, _, st = fixture
    rng = np.random.default_rng(7)
    B = 4
    x0s = st["x"][None, :] * rng.uniform(-2.0, 2.0, size=(B, 1))
    batched = solver(x0s, np.tile(st["xr"], (B, 1)),
                     np.tile(st["ur"], (B, 1)))
    for i in range(B):
        solo = solver(x0s[i], st["xr"], st["ur"])
        assert int(batched.k[i]) == int(solo.k[0])
        np.testing.assert_allclose(np.asarray(batched.sol["z1"][i]),
                                   np.asarray(solo.sol["z1"][0]),
                                   rtol=0, atol=1e-12)


def test_rho_scalar_override(fixture):
    """Passing rho= collapses to rho_base=rho, rho_mult=1
    (compute_MPCT_EADMM_ingredients.m:76-79)."""
    sys, param, st = fixture
    s = sp.make_solver(sys, param, formulation="MPCT", method="EADMM",
                       rho=2.0, tol=1e-5, k_max=5000)
    res = s(st["x"], st["xr"], st["ur"])
    u_o, k_o, e_o, _ = mpct_eadmm_oracle(
        sys, param, st["x"], st["xr"], st["ur"],
        rho_base=2.0, rho_mult=1.0, tol=1e-5, k_max=5000)
    assert int(res.k[0]) == k_o
    assert np.max(np.abs(np.asarray(res.u[0]) - u_o)) < 1e-9


# ---------------------------------------------------------------------------
# fused VMEM-resident backend (kernels/fused_eadmm.py)
# ---------------------------------------------------------------------------

def _rand_batch(st, B, seed):
    rng = np.random.default_rng(seed)
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-1.5, 1.5, (B, 1))
    return x0, np.tile(st["xr"], (B, 1)), np.tile(st["ur"], (B, 1))


def test_fused_matches_dense(fixture):
    """backend='fused' (kernels/fused_eadmm.py): same per-lane iteration
    counts as the dense engine and fp32-roundoff iterate agreement
    (interpret mode). The broadcast-layout C2m/C2t fold contracts in a
    different order than the dense couple()/a2t chain, so exits at the
    tolerance boundary may shift by a few iterations."""
    sys, param, st = fixture
    kw = dict(rho_base=2.0, rho_mult=20.0, tol=1e-5, k_max=3000)
    o = sp.default_options("MPCT", "EADMM", pallas_interpret=True,
                           tile_b=8, **kw)
    o.precision = "float"
    s_f = sp.make_solver(sys, param, formulation="MPCT", method="EADMM",
                         backend="fused", options=o)
    od = sp.default_options("MPCT", "EADMM", **kw)
    od.precision = "float"
    s_d = sp.make_solver(sys, param, formulation="MPCT", method="EADMM",
                         options=od)
    x0, xr, ur = _rand_batch(st, 8, 21)
    rf = s_f(x0, xr, ur)
    rd = s_d(x0, xr, ur)
    assert np.all(np.asarray(rf.e_flag) == 1)
    assert np.max(np.abs(np.asarray(rf.k, np.int64)
                         - np.asarray(rd.k, np.int64))) <= 5
    for key in ("z1", "z2", "z3"):
        gap = np.max(np.abs(np.asarray(rf.sol[key])
                            - np.asarray(rd.sol[key])))
        assert gap < 25 * 1e-5, (key, gap)
    gap = np.max(np.abs(np.asarray(rf.sol["lam"])
                        - np.asarray(rd.sol["lam"])))
    assert gap < 100 * 1e-5, ("lam", gap)
    assert np.max(np.abs(np.asarray(rf.u) - np.asarray(rd.u))) < 25 * 1e-5
    # warm start from the dense solution: near-immediate exit
    rws = s_f(x0, xr, ur, init=(rd.sol["z1"], rd.sol["z2"],
                                rd.sol["z3"], rd.sol["lam"]))
    assert int(np.max(np.asarray(rws.k))) <= 20


def test_fused_check_every(fixture):
    """check_every>1 free-runs windows: converged fraction and iterates
    match; k is recorded at window granularity (>= dense k)."""
    sys, param, st = fixture
    kw = dict(rho_base=2.0, rho_mult=20.0, tol=1e-5, k_max=3000)
    o = sp.default_options("MPCT", "EADMM", pallas_interpret=True,
                           tile_b=8, check_every=4, **kw)
    o.precision = "float"
    s_f = sp.make_solver(sys, param, formulation="MPCT", method="EADMM",
                         backend="fused", options=o)
    od = sp.default_options("MPCT", "EADMM", **kw)
    od.precision = "float"
    s_d = sp.make_solver(sys, param, formulation="MPCT", method="EADMM",
                         options=od)
    x0, xr, ur = _rand_batch(st, 8, 22)
    rf = s_f(x0, xr, ur)
    rd = s_d(x0, xr, ur)
    assert np.all(np.asarray(rf.e_flag) == 1)
    assert np.all(np.asarray(rf.k, np.int64)
                  >= np.asarray(rd.k, np.int64) - 5)
    assert np.max(np.abs(np.asarray(rf.u) - np.asarray(rd.u))) < 25 * 1e-5


def test_fused_requires_float(fixture):
    sys, param, _ = fixture
    with pytest.raises(ValueError, match="fp32"):
        sp.make_solver(sys, param, formulation="MPCT", method="EADMM",
                       backend="fused", **OPTS)


def test_eadmm_fused_exact_k(fixture):
    """exact_k for the three-block EADMM kernel: bit-identical to its own
    check_every=1 exact mode (full 9-leaf state snapshot + replay),
    including the k_max-capped path."""
    sys, param, st = fixture

    def build(**extra):
        kw = dict(rho_base=2.0, rho_mult=20.0, tol=1e-5, k_max=3000)
        o = sp.default_options("MPCT", "EADMM", "",
                               pallas_interpret=True, tile_b=8,
                               **{**kw, **extra})
        o.precision = "float"
        return sp.make_solver(sys, param, formulation="MPCT",
                              method="EADMM", backend="fused", options=o)

    import numpy as np
    B = 8
    rng = np.random.default_rng(23)
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    r1 = build()(x0, xr, ur)
    r2 = build(check_every=8, exact_k=True)(x0, xr, ur)
    np.testing.assert_array_equal(np.asarray(r1.k), np.asarray(r2.k))
    np.testing.assert_array_equal(np.asarray(r1.e_flag),
                                  np.asarray(r2.e_flag))
    for key in ("z1", "z2", "z3", "lam"):
        np.testing.assert_array_equal(np.asarray(r1.sol[key]),
                                      np.asarray(r2.sol[key]))
    r1c = build(tol=1e-13, k_max=19)(x0, xr, ur)
    r2c = build(tol=1e-13, k_max=19, check_every=8, exact_k=True)(
        x0, xr, ur)
    np.testing.assert_array_equal(np.asarray(r1c.k), np.asarray(r2c.k))
    for key in ("z1", "z2", "z3", "lam"):
        np.testing.assert_array_equal(np.asarray(r1c.sol[key]),
                                      np.asarray(r2c.sol[key]))
