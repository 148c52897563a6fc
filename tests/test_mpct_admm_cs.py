"""Differential tests for MPCT-ADMM-cs (tests/test_MPCT_ADMM.m pattern):
extended-state-space ADMM on the oscillating-masses fixture."""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.oracle import mpct_admm_cs_oracle
from tests.golden.mpct_admm_cs_golden import Z_OPT


@pytest.fixture(scope="module")
def fixture():
    sys, param, status = sp.systems.tester_fixture()
    param = dict(param)
    param["T"] = 10.0 * np.asarray(param["Q"])
    param["S"] = np.asarray(param["R"]).copy()
    return sys, param, status


OPTS = dict(rho=1e-2, tol=1e-7, k_max=5000)


@pytest.fixture(scope="module")
def solver(fixture):
    sys, param, _ = fixture
    return sp.make_solver(sys, param, formulation="MPCT", method="ADMM",
                          submethod="cs", **OPTS)


def test_vs_golden(solver, fixture):
    _, _, st = fixture
    res = solver(st["x"], st["xr"], st["ur"])
    assert int(res.e_flag[0]) == 1
    z = np.asarray(res.sol["z"][0])
    assert np.max(np.abs(z - Z_OPT)) <= 1e-4


def test_vs_oracle(solver, fixture):
    sys, param, st = fixture
    res = solver(st["x"], st["xr"], st["ur"])
    u_o, k_o, e_o, sol_o = mpct_admm_cs_oracle(
        sys, param, st["x"], st["xr"], st["ur"], **OPTS)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-9
    assert np.max(np.abs(np.asarray(res.u[0]) - u_o)) < 1e-9


def test_u_matches_eadmm(fixture):
    """cs and EADMM solve the same MPCT QP: the control actions must agree
    to optimization tolerance."""
    sys, param, st = fixture
    s_cs = sp.make_solver(sys, param, formulation="MPCT", method="ADMM",
                          submethod="cs", **OPTS)
    s_ea = sp.make_solver(sys, param, formulation="MPCT", method="EADMM",
                          rho_base=2.0, rho_mult=20.0, tol=1e-7, k_max=5000)
    u_cs = np.asarray(s_cs(st["x"], st["xr"], st["ur"]).u[0])
    u_ea = np.asarray(s_ea(st["x"], st["xr"], st["ur"]).u[0])
    assert np.max(np.abs(u_cs - u_ea)) < 1e-4


def test_batched_masking(solver, fixture):
    _, _, st = fixture
    rng = np.random.default_rng(9)
    B = 3
    x0s = st["x"][None, :] * rng.uniform(-2.0, 2.0, size=(B, 1))
    batched = solver(x0s, np.tile(st["xr"], (B, 1)),
                     np.tile(st["ur"], (B, 1)))
    for i in range(B):
        solo = solver(x0s[i], st["xr"], st["ur"])
        assert int(batched.k[i]) == int(solo.k[0])
        np.testing.assert_allclose(np.asarray(batched.sol["z"][i]),
                                   np.asarray(solo.sol["z"][0]),
                                   rtol=0, atol=1e-12)
