"""Differential tests for MPCT-ADMM-semiband. The reference harness does
not cover this solver (SURVEY.md §4), so the oracle here is the in-repo
dense mirror of spcies_MPCT_ADMM_semiband_solver.m, exercised across the
solver's option matrix: hard/soft constraints x plain/constrained output."""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.oracle import mpct_admm_semiband_oracle


@pytest.fixture(scope="module")
def fixture():
    sys, param, status = sp.systems.tester_fixture()
    param = dict(param)
    param["T"] = 10.0 * np.asarray(param["Q"])
    param["S"] = np.asarray(param["R"]).copy()
    return sys, param, status


OPTS = dict(rho=0.5, tol_p=1e-7, tol_d=1e-7, k_max=5000)


def _run_pair(sys, param, st, **extra):
    opts = {**OPTS, **extra}
    s = sp.make_solver(sys, param, formulation="MPCT", method="ADMM",
                       submethod="semiband", **opts)
    res = s(st["x"], st["xr"], st["ur"])
    u_o, k_o, e_o, sol_o = mpct_admm_semiband_oracle(
        sys, param, st["x"], st["xr"], st["ur"], **opts)
    return s, res, (u_o, k_o, e_o, sol_o)


def test_hard_vs_oracle(fixture):
    sys, param, st = fixture
    s, res, (u_o, k_o, e_o, sol_o) = _run_pair(sys, param, st)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-9
    assert np.max(np.abs(np.asarray(res.u[0]) - u_o)) < 1e-9


def test_hard_u_matches_eadmm(fixture):
    """semiband solves the same MPCT QP as EADMM: control actions agree."""
    sys, param, st = fixture
    _, res, _ = _run_pair(sys, param, st)
    s_ea = sp.make_solver(sys, param, formulation="MPCT", method="EADMM",
                          rho_base=2.0, rho_mult=20.0, tol=1e-7, k_max=5000)
    u_ea = np.asarray(s_ea(st["x"], st["xr"], st["ur"]).u[0])
    assert np.max(np.abs(np.asarray(res.u[0]) - u_ea)) < 1e-4


def test_soft_vs_oracle(fixture):
    sys, param, st = fixture
    s, res, (u_o, k_o, e_o, sol_o) = _run_pair(sys, param, st,
                                               soft_constraints=True,
                                               beta=1.0)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-9


def test_soft_allows_violation_with_infeasible_x0(fixture):
    """With an initial state outside the feasible tube, soft constraints
    must still converge (the hard version may not)."""
    sys, param, st = fixture
    x_bad = np.asarray(st["x"]) * 20.0   # positions beyond the 0.3 bound
    s = sp.make_solver(sys, param, formulation="MPCT", method="ADMM",
                       submethod="semiband", rho=0.5, tol_p=1e-5,
                       tol_d=1e-5, k_max=5000, soft_constraints=True,
                       beta=1.0)
    res = s(x_bad, st["xr"], st["ur"])
    assert int(res.e_flag[0]) == 1


def test_constrained_output_vs_oracle(fixture):
    sys, param, st = fixture
    sys = dict(sys)
    n, m = len(st["x"]), 2
    # constrain the three mass positions as outputs y = C x
    sys["C"] = np.eye(3, n)
    sys["D"] = np.zeros((3, m))
    sys["LBy"] = -0.25 * np.ones(3)
    sys["UBy"] = 0.25 * np.ones(3)
    s, res, (u_o, k_o, e_o, sol_o) = _run_pair(sys, param, st,
                                               constrained_output=True)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-9
    # the output bound must bind tighter than the state bound it shadows
    v = np.asarray(res.sol["v"][0])
    sv = s.n + s.m + 3
    for l in range(1, s.N):
        y_l = v[l * sv + s.n + s.m: (l + 1) * sv]
        assert np.all(y_l <= 0.25 + 1e-8)


def test_soft_constrained_output_vs_oracle(fixture):
    sys, param, st = fixture
    sys = dict(sys)
    n, m = len(st["x"]), 2
    sys["C"] = np.eye(3, n)
    sys["D"] = np.zeros((3, m))
    sys["LBy"] = -0.25 * np.ones(3)
    sys["UBy"] = 0.25 * np.ones(3)
    s, res, (u_o, k_o, e_o, sol_o) = _run_pair(
        sys, param, st, constrained_output=True, soft_constraints=True,
        beta=2.0)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-9


# ---------------------------------------------------------------------------
# O(N)-memory structured backend (two-level Woodbury, backend='banded')
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("extra", [
    dict(),
    dict(soft_constraints=True, beta=1.0),
    dict(constrained_output=True),
    dict(soft_constraints=True, constrained_output=True, beta=2.0),
])
def test_banded_backend_matches_dense(fixture, extra):
    """backend='banded' (stage-local two-level Woodbury,
    compute_MPCT_ADMM_semiband_ingredients.m:163-227 structure) must
    reproduce the dense affine-map backend iterate-for-iterate."""
    sys, param, st = fixture
    if extra.get("constrained_output"):
        sys = dict(sys)
        n, m = len(st["x"]), 2
        sys["C"] = np.eye(3, n)
        sys["D"] = np.zeros((3, m))
        sys["LBy"] = -0.25 * np.ones(3)
        sys["UBy"] = 0.25 * np.ones(3)
    opts = {**OPTS, **extra}
    sd = sp.make_solver(sys, param, formulation="MPCT", method="ADMM",
                        submethod="semiband", **opts)
    sb = sp.make_solver(sys, param, formulation="MPCT", method="ADMM",
                        submethod="semiband", backend="banded", **opts)
    rd = sd(st["x"], st["xr"], st["ur"])
    rb = sb(st["x"], st["xr"], st["ur"])
    assert int(rb.e_flag[0]) == 1
    assert int(rb.k[0]) == int(rd.k[0])
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(rb.sol[key])
                             - np.asarray(rd.sol[key]))) < 1e-8
    assert np.max(np.abs(np.asarray(rb.u) - np.asarray(rd.u))) < 1e-9


def test_banded_backend_long_horizon(fixture):
    """N=120: the horizon regime the reference's semiband structure exists
    for (O(N) memory; the dense M_q would be (121*8)^2). Banded matches
    dense and every stored banded array stays O(N)."""
    sys, param, st = fixture
    param = dict(param)
    param["N"] = 120
    opts = dict(rho=0.5, tol_p=1e-6, tol_d=1e-6, k_max=3000)
    sd = sp.make_solver(sys, param, formulation="MPCT", method="ADMM",
                        submethod="semiband", **opts)
    sb = sp.make_solver(sys, param, formulation="MPCT", method="ADMM",
                        submethod="semiband", backend="banded", **opts)
    rd = sd(st["x"], st["xr"], st["ur"])
    rb = sb(st["x"], st["xr"], st["ur"])
    assert int(rb.e_flag[0]) == 1
    assert int(rb.k[0]) == int(rd.k[0])
    assert np.max(np.abs(np.asarray(rb.u) - np.asarray(rd.u))) < 1e-9
    # memory contract: nothing O(N^2) in the banded ingredient set
    ing = sb.ingredients
    assert ing["M_q"] is None
    nz = ing["nz"]
    for key in ("blocks_inv", "Gu", "Gv", "Alpha", "BetaInv", "Pu", "Vt"):
        assert np.asarray(ing[key]).size < nz * 20 * (ing["n"] + ing["m"])


def test_banded_backend_vector_rho(fixture):
    """Per-entry rho (force_vector_rho analogue) through the structured
    stage blocks."""
    sys, param, st = fixture
    n, m, N = len(st["x"]), 2, int(param["N"])
    nv = (N + 1) * (n + m)
    rng = np.random.default_rng(3)
    rho_vec = 0.3 + 0.4 * rng.random(nv)
    opts = dict(rho=rho_vec, tol_p=1e-7, tol_d=1e-7, k_max=5000)
    sd = sp.make_solver(sys, param, formulation="MPCT", method="ADMM",
                        submethod="semiband", **opts)
    sb = sp.make_solver(sys, param, formulation="MPCT", method="ADMM",
                        submethod="semiband", backend="banded", **opts)
    rd = sd(st["x"], st["xr"], st["ur"])
    rb = sb(st["x"], st["xr"], st["ur"])
    assert int(rb.e_flag[0]) == 1
    assert int(rb.k[0]) == int(rd.k[0])
    assert np.max(np.abs(np.asarray(rb.u) - np.asarray(rd.u))) < 1e-9


def test_banded_parallel_scan_matches_sequential(fixture):
    """band_parallel_scan=True: the semiband structured backend's
    Gamma_tilde band solve through the O(log N)-depth associative scan
    must reproduce the sequential banded backend."""
    sys, param, st = fixture
    p = dict(param)
    p["N"] = 40
    opts = dict(rho=0.5, tol_p=1e-6, tol_d=1e-6, k_max=3000)
    s_seq = sp.make_solver(sys, p, formulation="MPCT", method="ADMM",
                           submethod="semiband", backend="banded", **opts)
    s_par = sp.make_solver(sys, p, formulation="MPCT", method="ADMM",
                           submethod="semiband", backend="banded",
                           band_parallel_scan=True, **opts)
    rs = s_seq(st["x"], st["xr"], st["ur"])
    rp = s_par(st["x"], st["xr"], st["ur"])
    assert int(rs.e_flag[0]) == int(rp.e_flag[0]) == 1
    assert int(rs.k[0]) == int(rp.k[0])
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(rs.sol[key][0])
                             - np.asarray(rp.sol[key][0]))) < 1e-8
