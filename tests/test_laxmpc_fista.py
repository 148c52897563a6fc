"""Differential tests for laxMPC-FISTA (tests/test_laxMPC_FISTA.m pattern):
golden optimum (same optimum as ADMM — identical QP), oracle differential,
batching invariant."""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.oracle import laxmpc_fista_oracle
from tests.golden.laxmpc_admm_golden import Z_OPT


@pytest.fixture(scope="module")
def fixture():
    sys, param, status = sp.systems.tester_fixture()
    # FISTA requires diagonal T (tests/test_laxMPC_FISTA.m:15)
    param = dict(param)
    param["T"] = np.diag(np.sum(param["T"], axis=1))
    return sys, param, status


OPTS = dict(tol=1e-7, k_max=5000)  # test_laxMPC_FISTA.m:6-7


@pytest.fixture(scope="module", params=["dense", "banded"])
def solver(request, fixture):
    sys, param, _ = fixture
    return sp.make_solver(sys, param, formulation="laxMPC", method="FISTA",
                          backend=request.param, **OPTS)


def test_vs_golden(solver, fixture):
    _, _, st = fixture
    res = solver(st["x"], st["xr"], st["ur"])
    assert int(res.e_flag[0]) == 1
    assert np.max(np.abs(np.asarray(res.sol["z"][0]) - Z_OPT)) <= 1e-4


def test_vs_oracle(solver, fixture):
    sys, param, st = fixture
    res = solver(st["x"], st["xr"], st["ur"])
    u_o, k_o, e_o, sol_o = laxmpc_fista_oracle(
        sys, param, st["x"], st["xr"], st["ur"], **OPTS)
    assert int(res.e_flag[0]) == e_o == 1
    assert int(res.k[0]) == k_o
    for key in ("z", "lam"):
        assert np.max(np.abs(np.asarray(res.sol[key][0]) - sol_o[key])) < 1e-9
    assert np.max(np.abs(np.asarray(res.u[0]) - u_o)) < 1e-9


def test_batched_masking(solver, fixture):
    _, _, st = fixture
    rng = np.random.default_rng(2)
    B = 4
    x0s = st["x"][None, :] * rng.uniform(-2.0, 2.0, size=(B, 1))
    batched = solver(x0s, np.tile(st["xr"], (B, 1)),
                     np.tile(st["ur"], (B, 1)))
    for i in range(B):
        solo = solver(x0s[i], st["xr"], st["ur"])
        assert int(batched.k[i]) == int(solo.k[0])
        np.testing.assert_allclose(np.asarray(batched.sol["z"][i]),
                                   np.asarray(solo.sol["z"][0]),
                                   rtol=0, atol=1e-12)


def test_nondiagonal_T_rejected(fixture):
    sys, param, _ = fixture
    param = dict(param)
    T = np.asarray(param["T"]).copy()
    T[0, 1] = T[1, 0] = 0.5
    param["T"] = T
    with pytest.raises(ValueError, match="diagonal"):
        sp.make_solver(sys, param, formulation="laxMPC", method="FISTA")


def test_adaptive_restart(fixture):
    """restart=True (adaptive momentum restart, opt-in — no reference
    counterpart) converges to the same optimum; never slower on the
    fixture, and exact reference iterates are preserved at the default."""
    sys, param, st = fixture
    s_plain = sp.make_solver(sys, param, formulation="laxMPC",
                             method="FISTA", tol=1e-7, k_max=10000)
    s_rst = sp.make_solver(sys, param, formulation="laxMPC",
                           method="FISTA", tol=1e-7, k_max=10000,
                           restart=True)
    x0 = np.asarray(st["x"]) * 1.5
    rp = s_plain(x0, st["xr"], st["ur"])
    rr = s_rst(x0, st["xr"], st["ur"])
    assert int(rp.e_flag[0]) == int(rr.e_flag[0]) == 1
    assert int(rr.k[0]) <= int(rp.k[0])
    assert np.max(np.abs(np.asarray(rr.u[0]) - np.asarray(rp.u[0]))) < 1e-5
