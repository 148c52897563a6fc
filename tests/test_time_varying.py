"""Tests for time-varying mode (examples/t01_time_varying_MPC.m workflow):
per-call (A, B, Qdiag, Rdiag, LB, UB) with online band-Cholesky ingredient
recomputation. Differential oracle: the static-ingredient oracle rebuilt
with the same per-call data (its ingredient path recomputes everything per
call anyway, like the reference MATLAB mirrors)."""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.config import Options
from spcies_tpu.oracle import laxmpc_admm_oracle, equmpc_admm_oracle


@pytest.fixture(scope="module")
def fixture():
    sys, param, status = sp.systems.tester_fixture()
    param = dict(param)
    param["T"] = np.diag(np.sum(param["T"], axis=1))
    return sys, param, status


OPTS = dict(rho=15.0, tol=1e-7, k_max=5000)


def _tv_inputs(sys, param, st, scale_A=1.0):
    A = scale_A * np.asarray(sys["A"])
    B = np.asarray(sys["B"])
    Qd = np.diag(np.asarray(param["Q"]))
    Rd = np.diag(np.asarray(param["R"]))
    LB = np.concatenate([sys["LBx"], sys["LBu"]])
    UB = np.concatenate([sys["UBx"], sys["UBu"]])
    return (st["x"], st["xr"], st["ur"], A, B, Qd, Rd, LB, UB)


@pytest.mark.parametrize("formulation", ["laxMPC", "equMPC"])
def test_tv_matches_static_at_nominal(fixture, formulation):
    """With the nominal (A, B, Q, R, LB, UB), the time-varying solver must
    reproduce the static solver's iterates exactly."""
    sys, param, st = fixture
    p = dict(param)
    if formulation == "equMPC":
        p.pop("T")
    opt = sp.default_options(formulation, "ADMM", **OPTS)
    opt.time_varying = True
    s_tv = sp.make_solver(sys, p, formulation=formulation, method="ADMM",
                          options=opt)
    s_st = sp.make_solver(sys, p, formulation=formulation, method="ADMM",
                          **OPTS)
    res_tv = s_tv(*_tv_inputs(sys, param, st))
    res_st = s_st(st["x"], st["xr"], st["ur"])
    assert int(res_tv.e_flag[0]) == int(res_st.e_flag[0]) == 1
    assert int(res_tv.k[0]) == int(res_st.k[0])
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(res_tv.sol[key][0])
                             - np.asarray(res_st.sol[key][0]))) < 1e-9


@pytest.mark.parametrize("formulation,oracle",
                         [("laxMPC", laxmpc_admm_oracle),
                          ("equMPC", equmpc_admm_oracle)])
def test_tv_perturbed_model_vs_oracle(fixture, formulation, oracle):
    """With a perturbed A, the time-varying solver must match the oracle
    rebuilt with the perturbed model."""
    sys, param, st = fixture
    p = dict(param)
    if formulation == "equMPC":
        p.pop("T")
    opt = sp.default_options(formulation, "ADMM", **OPTS)
    opt.time_varying = True
    s_tv = sp.make_solver(sys, p, formulation=formulation, method="ADMM",
                          options=opt)
    scale = 0.97
    res = s_tv(*_tv_inputs(sys, param, st, scale_A=scale))
    sys_pert = dict(sys, A=scale * np.asarray(sys["A"]))
    u_o, k_o, e_o, sol_o = oracle(sys_pert, p, st["x"], st["xr"], st["ur"],
                                  **OPTS)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-8


def test_tv_heterogeneous_models_per_lane(fixture):
    """Every lane may carry a DIFFERENT model — a capability the reference
    cannot express (one baked model per binary). Each lane must match its
    own solo solve."""
    sys, param, st = fixture
    opt = sp.default_options("laxMPC", "ADMM", **OPTS)
    opt.time_varying = True
    s = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                       options=opt)
    scales = [1.0, 0.95, 1.02]
    B_ = len(scales)
    base = _tv_inputs(sys, param, st)
    A_b = np.stack([s_ * base[3] for s_ in scales])
    args = (np.tile(base[0], (B_, 1)), np.tile(base[1], (B_, 1)),
            np.tile(base[2], (B_, 1)), A_b,
            np.tile(base[4], (B_, 1, 1)), np.tile(base[5], (B_, 1)),
            np.tile(base[6], (B_, 1)), np.tile(base[7], (B_, 1)),
            np.tile(base[8], (B_, 1)))
    batched = s(*args)
    for i, s_ in enumerate(scales):
        solo = s(*_tv_inputs(sys, param, st, scale_A=s_))
        assert int(batched.k[i]) == int(solo.k[0])
        np.testing.assert_allclose(np.asarray(batched.sol["z"][i]),
                                   np.asarray(solo.sol["z"][0]),
                                   rtol=0, atol=1e-12)


def test_tv_receding_horizon_warm_start(fixture):
    """t01-style closed loop: simulate a few steps with a slowly drifting
    model, warm-starting each solve from the previous iterates."""
    sys, param, st = fixture
    opt = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-5,
                             k_max=5000)
    opt.time_varying = True
    s = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                       options=opt)
    x = np.asarray(st["x"], float)
    init = None
    ks = []
    for step in range(4):
        scale = 1.0 - 0.01 * step
        args = _tv_inputs(sys, param, st, scale_A=scale)
        args = (x,) + args[1:]
        res = s(*args, init=init)
        assert int(res.e_flag[0]) == 1
        ks.append(int(res.k[0]))
        u = np.asarray(res.u[0])
        x = scale * np.asarray(sys["A"]) @ x + np.asarray(sys["B"]) @ u
        init = (res.sol["z"], res.sol["v"], res.sol["lam"])
    # warm-started later steps should converge faster than the cold start
    assert min(ks[1:]) < ks[0]


@pytest.mark.parametrize("formulation", ["laxMPC", "equMPC"])
def test_tv_fista_matches_static(fixture, formulation):
    """Time-varying FISTA at nominal data reproduces the static FISTA."""
    sys, param, st = fixture
    p = dict(param)
    if formulation == "equMPC":
        p.pop("T")
    opt = sp.default_options(formulation, "FISTA", tol=1e-7, k_max=5000)
    opt.time_varying = True
    s_tv = sp.make_solver(sys, p, formulation=formulation, method="FISTA",
                          options=opt)
    s_st = sp.make_solver(sys, p, formulation=formulation, method="FISTA",
                          tol=1e-7, k_max=5000)
    res_tv = s_tv(*_tv_inputs(sys, param, st))
    res_st = s_st(st["x"], st["xr"], st["ur"])
    assert int(res_tv.e_flag[0]) == int(res_st.e_flag[0]) == 1
    assert int(res_tv.k[0]) == int(res_st.k[0])
    for key in ("z", "lam"):
        assert np.max(np.abs(np.asarray(res_tv.sol[key][0])
                             - np.asarray(res_st.sol[key][0]))) < 1e-9


def test_tv_fista_perturbed_vs_oracle(fixture):
    from spcies_tpu.oracle import laxmpc_fista_oracle
    sys, param, st = fixture
    opt = sp.default_options("laxMPC", "FISTA", tol=1e-7, k_max=5000)
    opt.time_varying = True
    s = sp.make_solver(sys, param, formulation="laxMPC", method="FISTA",
                       options=opt)
    res = s(*_tv_inputs(sys, param, st, scale_A=0.96))
    sys_pert = dict(sys, A=0.96 * np.asarray(sys["A"]))
    u_o, k_o, e_o, sol_o = laxmpc_fista_oracle(
        sys_pert, param, st["x"], st["xr"], st["ur"], tol=1e-7, k_max=5000)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-8


@pytest.mark.parametrize("formulation,extra", [
    ("laxMPC", dict(tv_dense_w=True)),
    ("equMPC", dict(tv_dense_w=True)),
    ("laxMPC", dict(band_parallel_scan=True)),
])
def test_tv_solve_variants_match_banded(fixture, formulation, extra):
    """tv_dense_w (per-lane dense W + batched Cholesky — the
    structure-oblivious [B, Nn, Nn] path) and band_parallel_scan
    (associative-scan band solve) must reproduce the banded TV solver."""
    sys, param, st = fixture
    p = dict(param)
    if formulation == "equMPC":
        p.pop("T")
    opt_b = sp.default_options(formulation, "ADMM", **OPTS)
    opt_b.time_varying = True
    opt_v = sp.default_options(formulation, "ADMM", **OPTS, **extra)
    opt_v.time_varying = True
    s_b = sp.make_solver(sys, p, formulation=formulation, method="ADMM",
                         options=opt_b)
    s_v = sp.make_solver(sys, p, formulation=formulation, method="ADMM",
                         options=opt_v)
    inputs = _tv_inputs(sys, param, st, scale_A=1.03)
    rb = s_b(*inputs)
    rv = s_v(*inputs)
    assert int(rb.e_flag[0]) == int(rv.e_flag[0]) == 1
    assert int(rb.k[0]) == int(rv.k[0])
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(rb.sol[key][0])
                             - np.asarray(rv.sol[key][0]))) < 1e-8


def test_tv_mpct_cs_matches_static_at_nominal(fixture):
    """Per-lane time-varying MPCT-ADMM-cs (VERDICT r4 next-#6, beyond the
    reference — it has no MPCT TV mode): at the nominal model the TV
    solver must reproduce the static banded solver's iterates/k exactly,
    and per-lane models must match their solo solves."""
    sys, param, st = fixture
    p = dict(param)
    p.pop("T", None)
    p["T"] = 10.0 * np.asarray(param["Q"])
    p["S"] = np.asarray(param["R"]).copy()
    kw = dict(rho=2.0, tol=1e-6, k_max=5000)
    opt = sp.default_options("MPCT", "ADMM", "cs", **kw)
    opt.time_varying = True
    s_tv = sp.make_solver(sys, p, formulation="MPCT", method="ADMM",
                          submethod="cs", options=opt)
    s_st = sp.make_solver(sys, p, formulation="MPCT", method="ADMM",
                          submethod="cs", backend="banded", **kw)
    res_tv = s_tv(*_tv_inputs(sys, p, st))
    res_st = s_st(st["x"], st["xr"], st["ur"])
    assert int(res_tv.e_flag[0]) == 1
    assert int(res_tv.k[0]) == int(res_st.k[0])
    for key in ("z", "v", "lam"):
        np.testing.assert_allclose(np.asarray(res_tv.sol[key]),
                                   np.asarray(res_st.sol[key]),
                                   rtol=0, atol=1e-9)

    # heterogeneous per-lane models: each lane equals its solo solve
    x0, xr, ur, A, B, Qd, Rd, LB, UB = _tv_inputs(sys, p, st)
    scales = np.array([1.0, 0.95, 1.05])
    Ab = np.stack([s * A for s in scales])
    Bb = np.tile(B, (3, 1, 1))
    batch = (np.tile(x0, (3, 1)), np.tile(xr, (3, 1)), np.tile(ur, (3, 1)),
             Ab, Bb, np.tile(Qd, (3, 1)), np.tile(Rd, (3, 1)),
             np.tile(LB, (3, 1)), np.tile(UB, (3, 1)))
    rb = s_tv(*batch)
    for i, s_ in enumerate(scales):
        solo = s_tv(x0, xr, ur, s_ * A, B, Qd, Rd, LB, UB)
        assert int(rb.k[i]) == int(solo.k[0])
        np.testing.assert_allclose(np.asarray(rb.sol["z"][i]),
                                   np.asarray(solo.sol["z"][0]),
                                   rtol=0, atol=1e-11)


def test_tv_mpct_cs_long_horizon_parity(fixture):
    """N=120 parity (the VERDICT r4 next-#6 'done' bar): the TV banded
    path at a long horizon agrees with the static banded solver at the
    nominal model — the regime where any dense per-lane W is infeasible
    (BENCH_LONGN memory-wall cells)."""
    sys, param, st = fixture
    p = dict(param)
    p.pop("T", None)
    p["T"] = 10.0 * np.asarray(param["Q"])
    p["S"] = np.asarray(param["R"]).copy()
    p["N"] = 120
    kw = dict(rho=2.0, tol=1e-5, k_max=5000)
    opt = sp.default_options("MPCT", "ADMM", "cs", **kw)
    opt.time_varying = True
    s_tv = sp.make_solver(sys, p, formulation="MPCT", method="ADMM",
                          submethod="cs", options=opt)
    s_st = sp.make_solver(sys, p, formulation="MPCT", method="ADMM",
                          submethod="cs", backend="banded", **kw)
    res_tv = s_tv(*_tv_inputs(sys, p, st))
    res_st = s_st(st["x"], st["xr"], st["ur"])
    assert int(res_tv.e_flag[0]) == 1
    assert int(res_tv.k[0]) == int(res_st.k[0])
    np.testing.assert_allclose(np.asarray(res_tv.u),
                               np.asarray(res_st.u), rtol=0, atol=1e-9)
