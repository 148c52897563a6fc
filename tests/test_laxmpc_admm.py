"""Differential tests for laxMPC-ADMM, replicating the reference's test
architecture (tests/spcies_tester.m + tests/test_laxMPC_ADMM.m): the same
oscillating-masses fixture and scenario, compared against (a) the golden
optimum pasted in the reference test and (b) the in-repo dense fp64 oracle,
plus batching/masking invariants the reference cannot express.
"""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.oracle import laxmpc_admm_oracle
from tests.golden.laxmpc_admm_golden import Z_OPT


@pytest.fixture(scope="module")
def fixture():
    sys, param, status = sp.systems.tester_fixture()
    # the reference test diagonalizes the terminal cost
    # (tests/test_laxMPC_ADMM.m:15): T = diag(sum(T, 2))
    param = dict(param)
    param["T"] = np.diag(np.sum(param["T"], axis=1))
    return sys, param, status


SOLVER_OPTS = dict(rho=15.0, tol=1e-7, k_max=5000)  # test_laxMPC_ADMM.m:6-8


@pytest.fixture(scope="module", params=["dense", "banded"])
def solver(request, fixture):
    sys, param, _ = fixture
    return sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                          backend=request.param, **SOLVER_OPTS)


def test_vs_golden_optimum(solver, fixture):
    """z* within 1e-4 of the reference's hardcoded optimum
    (tests/spcies_tester.m:261 tol_opt)."""
    _, _, st = fixture
    res = solver(st["x"], st["xr"], st["ur"])
    z = np.asarray(res.sol["z"][0])
    assert int(res.e_flag[0]) == 1
    assert np.max(np.abs(z - Z_OPT)) <= 1e-4


def test_vs_oracle(solver, fixture):
    """Batched TPU solver vs dense numpy oracle: same iterates to 1e-9
    (the reference's sparse-vs-nonsparse differential contract,
    spcies_tester.m:260 tol 1e-10; we allow 1e-9 for fp reassociation)."""
    sys, param, st = fixture
    res = solver(st["x"], st["xr"], st["ur"])
    u_o, k_o, e_o, sol_o = laxmpc_admm_oracle(
        sys, param, st["x"], st["xr"], st["ur"], **SOLVER_OPTS)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-9
    assert np.max(np.abs(np.asarray(res.u[0]) - u_o)) < 1e-9


def test_batched_masking_matches_solo(solver, fixture):
    """Each lane of a heterogeneous batch must match its solo solve exactly
    (freeze-masked termination preserves per-lane k and iterates)."""
    _, _, st = fixture
    rng = np.random.default_rng(0)
    B = 5
    x0s = st["x"][None, :] * rng.uniform(-2.0, 2.0, size=(B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    batched = solver(x0s, xr, ur)
    ks = []
    for i in range(B):
        solo = solver(x0s[i], st["xr"], st["ur"])
        ks.append(int(solo.k[0]))
        assert int(batched.k[i]) == int(solo.k[0])
        assert int(batched.e_flag[i]) == int(solo.e_flag[0])
        np.testing.assert_allclose(np.asarray(batched.sol["z"][i]),
                                   np.asarray(solo.sol["z"][0]),
                                   rtol=0, atol=1e-12)
    assert len(set(ks)) > 1, "test should cover heterogeneous exit"


def test_warm_start_reduces_iterations(solver, fixture):
    """Warm starting from the converged iterates must converge immediately
    (SURVEY.md §5: warm start is new capability vs the reference's
    cold-start-only C, code_laxMPC_ADMM_C.c:58-71)."""
    _, _, st = fixture
    import jax.numpy as jnp
    cold = solver(st["x"], st["xr"], st["ur"])
    init = (cold.sol["z"], cold.sol["v"], cold.sol["lam"])
    warm = solver(st["x"], st["xr"], st["ur"], init=init)
    assert int(warm.k[0]) < int(cold.k[0])
    assert int(warm.e_flag[0]) == 1


def test_fixed_iters_mode(solver, fixture):
    """Benchmark mode runs exactly k iterations without convergence checks."""
    _, _, st = fixture
    res = solver(st["x"], st["xr"], st["ur"], fixed_iters=50)
    assert int(res.k[0]) == 50


def test_unconverged_flag(fixture):
    """k_max exhaustion must return e_flag = -1 with the current iterate
    (code_laxMPC_ADMM_C.c:622-631)."""
    sys, param, st = fixture
    s = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                       rho=15.0, tol=1e-12, k_max=10)
    res = s(st["x"], st["xr"], st["ur"])
    assert int(res.e_flag[0]) == -1
    assert int(res.k[0]) == 10


def test_bf16_delta_accuracy(fixture):
    """The bf16 delta path must preserve iteration counts and meet the
    1e-4-class solution accuracy vs the fp64 solve (the delta correction
    shrinks to zero, so bf16 rounding does not accumulate)."""
    sys, param, st = fixture
    opts = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-4,
                              k_max=1000, bf16_delta=True)
    opts.precision = "float"
    s_bf = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                          options=opts)
    s_64 = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                          rho=15.0, tol=1e-4, k_max=1000)
    rng = np.random.default_rng(3)
    B = 16
    x0 = st["x"][None, :] * rng.uniform(-2.0, 2.0, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    r_bf = s_bf(x0, xr, ur)
    r_64 = s_64(x0, xr, ur)
    assert np.all(np.asarray(r_bf.e_flag) == 1)
    # iterations-to-tol stay in the same band (exact counts shift slightly
    # near the threshold across precisions); the returned control matches
    # the fp64 solve far inside the 1e-4 contract
    k_bf, k_64 = np.asarray(r_bf.k, float), np.asarray(r_64.k, float)
    assert np.max(np.abs(k_bf - k_64) / k_64) < 0.25
    assert np.max(np.abs(np.asarray(r_bf.u) - np.asarray(r_64.u))) < 5e-4


def test_over_relaxation(fixture):
    """relax_alpha != 1 (standard over-relaxation, opt-in — the reference
    has no relaxation) reaches the same optimum in fewer iterations."""
    sys, param, st = fixture
    s_plain = sp.make_solver(sys, param, formulation="laxMPC",
                             method="ADMM", rho=15.0, tol=1e-6, k_max=5000)
    s_relax = sp.make_solver(sys, param, formulation="laxMPC",
                             method="ADMM", rho=15.0, tol=1e-6, k_max=5000,
                             relax_alpha=1.8)
    rp = s_plain(st["x"], st["xr"], st["ur"])
    rr = s_relax(st["x"], st["xr"], st["ur"])
    assert int(rp.e_flag[0]) == int(rr.e_flag[0]) == 1
    assert int(rr.k[0]) < int(rp.k[0])
    assert np.max(np.abs(np.asarray(rr.u[0]) - np.asarray(rp.u[0]))) < 1e-5


def test_banded_parallel_scan_matches_sequential(fixture):
    """band_parallel_scan=True (associative-scan band solve for long
    horizons) reproduces the sequential banded backend's results."""
    sys, param, st = fixture
    p = dict(param)
    p["N"] = 40
    s_seq = sp.make_solver(sys, p, formulation="laxMPC", method="ADMM",
                           backend="banded", rho=15.0, tol=1e-6, k_max=5000)
    s_par = sp.make_solver(sys, p, formulation="laxMPC", method="ADMM",
                           backend="banded", rho=15.0, tol=1e-6, k_max=5000,
                           band_parallel_scan=True)
    rs = s_seq(st["x"], st["xr"], st["ur"])
    rp = s_par(st["x"], st["xr"], st["ur"])
    assert int(rs.e_flag[0]) == int(rp.e_flag[0]) == 1
    assert int(rs.k[0]) == int(rp.k[0])
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(rs.sol[key][0])
                             - np.asarray(rp.sol[key][0]))) < 1e-9


def test_genhist_level2_full_traces(fixture):
    """options.debug = 2 records full per-iteration z/v/lam traces (the
    reference's genHist=2, spcies_laxMPC_ADMM_solver.m:340-349), frozen at
    each lane's exit."""
    sys, param, st = fixture
    opt = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-4,
                             k_max=200)
    opt.debug = 2
    s = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                       options=opt)
    res = s(st["x"], st["xr"], st["ur"])
    for key in ("hRp", "hRd", "hZ", "hV", "hLam"):
        assert key in res.sol, key
    hV = np.asarray(res.sol["hV"][0])       # [k_max, nz]
    assert hV.shape == (200, s.nz)
    k = int(res.k[0])
    # the trace at the lane's exit equals the returned iterate
    np.testing.assert_allclose(hV[k - 1], np.asarray(res.sol["v"][0]),
                               rtol=0, atol=0)
    # residual trace decreases overall (skip the leading iterations where
    # z is still feasible and r_p is exactly 0)
    hRp = np.asarray(res.sol["hRp"][0])
    assert hRp[k - 1] < np.max(hRp)


def test_straggler_polish_fixes_fp32_floor(fixture):
    """fp32 convergence-floor fix (VERDICT r4 next-#3): this mid-transient
    state (captured from a cold closed-loop rollout) reaches an fp32 fixed
    point with max|z - v| frozen at ~1.0049e-4 — just above tol=1e-4 — for
    thousands of iterations, while fp64 converges (k=1448). With
    straggler_polish, lanes that exhaust k_max continue with compensated
    f32x2 (double-word) accumulators and converge; already-converged lanes
    in the same batch are bit-untouched."""
    # raw tester fixture (full dlqr T, not the diagonalized test variant):
    # the stall was captured on the bench problem, which uses the full T
    sys, param, st = sp.systems.tester_fixture()
    p30 = dict(param)
    p30["N"] = 30
    x_hard = np.array([0.18785244226455688, 0.28975582122802734,
                       0.1878533512353897, 0.19296741485595703,
                       0.12776263058185577, 0.1929691731929779])
    xb = np.stack([np.asarray(st["x"]), x_hard])
    xr = np.tile(st["xr"], (2, 1))
    ur = np.tile(st["ur"], (2, 1))

    def solve(polish):
        o = sp.default_options("laxMPC", "ADMM", rho=10.0, tol=1e-4,
                               k_max=1000, relax_alpha=1.9,
                               straggler_polish=polish)
        o.precision = "float"
        s = sp.make_solver(sys, p30, formulation="laxMPC", method="ADMM",
                           options=o)
        return s(xb, xr, ur)

    r0 = solve(0)
    assert int(r0.e_flag[1]) == -1          # the floor, reproduced
    assert int(r0.e_flag[0]) == 1
    r1 = solve(2000)
    assert int(r1.e_flag[1]) == 1           # polished lane converges
    assert int(r1.k[1]) > 1000              # counted total iterations
    assert float(r1.sol["r_p"][1]) <= 1e-4
    # converged lane is bit-identical with and without the polish stage
    assert int(r1.k[0]) == int(r0.k[0])
    np.testing.assert_array_equal(np.asarray(r1.sol["z"][0]),
                                  np.asarray(r0.sol["z"][0]))
    np.testing.assert_array_equal(np.asarray(r1.sol["lam"][0]),
                                  np.asarray(r0.sol["lam"][0]))


def test_straggler_polish_continues_exact_recursion(fixture):
    """The compensated continuation must consume the PREPARED iterate
    (state['z_next']) — seeding from the stale consumed z carries a
    permanent -M_q dq offset and converges to a perturbed problem's
    fixed point while reporting e_flag=1 (r05 review finding; reproduced
    at |z - z_ref| = 0.259 before the fix). With the fix, a polished
    run from a tiny k_max must land on the same solution as one
    uninterrupted long run, and total iteration counts must agree to
    the fp64-vs-compensated-f64 rounding level."""
    sys, param, st = fixture
    rng = np.random.default_rng(3)
    B = 4
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))

    def solve(k_max, polish):
        s = sp.make_solver(sys, param, formulation="laxMPC",
                           method="ADMM", rho=15.0, tol=1e-9,
                           k_max=k_max, straggler_polish=polish)
        return s(x0, xr, ur)

    ref = solve(20000, 0)
    pol = solve(50, 20000)
    assert np.all(np.asarray(pol.e_flag) == 1)
    # identical recursion => identical exit points (fp64 + exact
    # two-sum continuation: bit-level agreement expected; allow ulp)
    np.testing.assert_allclose(np.asarray(pol.sol["z"]),
                               np.asarray(ref.sol["z"]),
                               rtol=0, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(pol.k), np.asarray(ref.k))
