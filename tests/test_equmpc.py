"""Differential tests for equMPC (ADMM + FISTA), replicating the reference's
test architecture (tests/test_equMPC_ADMM.m, tests/test_equMPC_FISTA.m):
oscillating-masses fixture, golden optimum, plus oracle differential and
batching invariants.
"""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.oracle import equmpc_admm_oracle, equmpc_fista_oracle
from tests.golden.equmpc_golden import Z_OPT


@pytest.fixture(scope="module")
def fixture():
    sys, param, status = sp.systems.tester_fixture()
    param = dict(param)
    param.pop("T", None)  # equMPC has no terminal cost
    return sys, param, status


ADMM_OPTS = dict(rho=15.0, tol=1e-7, k_max=5000)   # test_equMPC_ADMM.m:6-8
FISTA_OPTS = dict(tol=1e-7, k_max=5000)            # test_equMPC_FISTA.m:6-7


@pytest.fixture(scope="module", params=["dense", "banded"])
def admm_solver(request, fixture):
    sys, param, _ = fixture
    return sp.make_solver(sys, param, formulation="equMPC", method="ADMM",
                          backend=request.param, **ADMM_OPTS)


@pytest.fixture(scope="module", params=["dense", "banded"])
def fista_solver(request, fixture):
    sys, param, _ = fixture
    return sp.make_solver(sys, param, formulation="equMPC", method="FISTA",
                          backend=request.param, **FISTA_OPTS)


def test_admm_vs_golden(admm_solver, fixture):
    _, _, st = fixture
    res = admm_solver(st["x"], st["xr"], st["ur"])
    assert int(res.e_flag[0]) == 1
    assert np.max(np.abs(np.asarray(res.sol["z"][0]) - Z_OPT)) <= 1e-4


def test_admm_vs_oracle(admm_solver, fixture):
    sys, param, st = fixture
    res = admm_solver(st["x"], st["xr"], st["ur"])
    u_o, k_o, e_o, sol_o = equmpc_admm_oracle(
        sys, param, st["x"], st["xr"], st["ur"], **ADMM_OPTS)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-9
    assert np.max(np.abs(np.asarray(res.u[0]) - u_o)) < 1e-9


def test_admm_terminal_state_reaches_xr(admm_solver, fixture):
    """The terminal equality x_N = xr must hold at the solution: propagate
    the dynamics from the last stage and compare."""
    sys, _, st = fixture
    res = admm_solver(st["x"], st["xr"], st["ur"])
    z = np.asarray(res.sol["z"][0])
    n, m = admm_solver.n, admm_solver.m
    xl = z[-(n + m):-m]
    ul = z[-m:]
    xN = np.asarray(sys["A"]) @ xl + np.asarray(sys["B"]) @ ul
    assert np.max(np.abs(xN - st["xr"])) < 1e-5


def test_fista_vs_golden(fista_solver, fixture):
    _, _, st = fixture
    res = fista_solver(st["x"], st["xr"], st["ur"])
    assert int(res.e_flag[0]) == 1
    assert np.max(np.abs(np.asarray(res.sol["z"][0]) - Z_OPT)) <= 1e-4


def test_fista_vs_oracle(fista_solver, fixture):
    sys, param, st = fixture
    res = fista_solver(st["x"], st["xr"], st["ur"])
    u_o, k_o, e_o, sol_o = equmpc_fista_oracle(
        sys, param, st["x"], st["xr"], st["ur"], **FISTA_OPTS)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-9
    assert np.max(np.abs(np.asarray(res.u[0]) - u_o)) < 1e-9


def test_admm_batched_masking(admm_solver, fixture):
    _, _, st = fixture
    rng = np.random.default_rng(1)
    B = 4
    x0s = st["x"][None, :] * rng.uniform(-2.0, 2.0, size=(B, 1))
    batched = admm_solver(x0s, np.tile(st["xr"], (B, 1)),
                          np.tile(st["ur"], (B, 1)))
    for i in range(B):
        solo = admm_solver(x0s[i], st["xr"], st["ur"])
        assert int(batched.k[i]) == int(solo.k[0])
        np.testing.assert_allclose(np.asarray(batched.sol["z"][i]),
                                   np.asarray(solo.sol["z"][0]),
                                   rtol=0, atol=1e-12)
