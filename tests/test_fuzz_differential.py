"""Differential fuzzing over random plants — beyond the reference's single
shared fixture (SURVEY.md §4 notes the reference has no fuzzing): random
stable controllable systems of varied dimensions, solver vs dense fp64
oracle to the 1e-9 differential contract, across the main engine families.
Seeds are fixed so the suite is deterministic.
"""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.oracle import (laxmpc_admm_oracle, equmpc_fista_oracle,
                               mpct_admm_cs_oracle)


def _random_system(seed, n, m):
    """Random stable (spectral radius < 1) controllable-ish plant with
    bounds wide enough to keep the fixed scenarios feasible."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    A *= 0.9 / max(np.abs(np.linalg.eigvals(A)))
    B = rng.standard_normal((n, m))
    sys = dict(A=A, B=B,
               LBx=-2.0 * np.ones(n), UBx=2.0 * np.ones(n),
               LBu=-1.5 * np.ones(m), UBu=1.5 * np.ones(m))
    Qd = rng.uniform(0.5, 5.0, n)
    Rd = rng.uniform(0.1, 1.0, m)
    param = dict(Q=np.diag(Qd), R=np.diag(Rd), N=int(rng.integers(6, 14)))
    x0 = rng.uniform(-0.5, 0.5, n)
    ur = rng.uniform(-0.2, 0.2, m)
    xr = np.linalg.solve(np.eye(n) - A, B @ ur)   # consistent steady state
    return sys, param, x0, xr, ur


DIMS = [(3, 1, 0), (5, 2, 1), (8, 3, 2)]


@pytest.mark.parametrize("n,m,seed", DIMS)
def test_fuzz_laxmpc_admm(n, m, seed):
    sys, param, x0, xr, ur = _random_system(100 + seed, n, m)
    param = dict(param, T=2.0 * np.asarray(param["Q"]))
    opts = dict(rho=1.0, tol=1e-7, k_max=20000)
    s = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                       **opts)
    r = s(x0, xr, ur)
    u_o, k_o, e_o, sol_o = laxmpc_admm_oracle(sys, param, x0, xr, ur,
                                              **opts)
    assert int(r.e_flag[0]) == e_o == 1
    assert int(r.k[0]) == k_o
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(r.sol[key][0]) - sol_o[key])) < 1e-9


@pytest.mark.parametrize("n,m,seed", DIMS)
def test_fuzz_equmpc_fista(n, m, seed):
    sys, param, x0, xr, ur = _random_system(200 + seed, n, m)
    opts = dict(tol=1e-7, k_max=20000)
    s = sp.make_solver(sys, param, formulation="equMPC", method="FISTA",
                       **opts)
    r = s(x0, xr, ur)
    u_o, k_o, e_o, sol_o = equmpc_fista_oracle(sys, param, x0, xr, ur,
                                               **opts)
    assert int(r.e_flag[0]) == e_o == 1
    assert int(r.k[0]) == k_o
    for key in ("z", "lam"):
        assert np.max(np.abs(np.asarray(r.sol[key][0]) - sol_o[key])) < 1e-9


@pytest.mark.parametrize("n,m,seed", DIMS)
def test_fuzz_mpct_cs(n, m, seed):
    sys, param, x0, xr, ur = _random_system(300 + seed, n, m)
    param = dict(param, T=5.0 * np.asarray(param["Q"]),
                 S=2.0 * np.asarray(param["R"]))
    opts = dict(rho=0.5, tol=1e-7, k_max=20000)
    s = sp.make_solver(sys, param, formulation="MPCT", method="ADMM",
                       submethod="cs", **opts)
    r = s(x0, xr, ur)
    u_o, k_o, e_o, sol_o = mpct_admm_cs_oracle(sys, param, x0, xr, ur,
                                               **opts)
    assert int(r.e_flag[0]) == e_o == 1
    assert int(r.k[0]) == k_o
    for key in ("z", "v", "lam"):
        assert np.max(np.abs(np.asarray(r.sol[key][0]) - sol_o[key])) < 1e-9


@pytest.mark.parametrize("n,m,seed", DIMS[:2])
def test_fuzz_c_codegen_matches(n, m, seed, tmp_path):
    """Generated-C differential on a random plant (not just the shared
    fixture): emitted constants and iteration must track the JAX engine
    on arbitrary well-posed problems."""
    from spcies_tpu.codegen import generate_c_solver, CompiledCSolver
    sys, param, x0, xr, ur = _random_system(400 + seed, n, m)
    param = dict(param, T=2.0 * np.asarray(param["Q"]))
    opts = dict(rho=1.0, tol=1e-7, k_max=20000)
    d = str(tmp_path)
    generate_c_solver(sys, param, formulation="laxMPC", directory=d,
                      **opts)
    s = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                       **opts)
    c = CompiledCSolver("laxmpc_admm", n=s.n, m=s.m, nz=s.nz, directory=d)
    u_c, k_c, e_c, sol_c = c(x0, xr, ur)
    r = s(x0, xr, ur)
    assert e_c == int(r.e_flag[0]) == 1
    assert k_c == int(r.k[0])
    assert np.max(np.abs(u_c - np.asarray(r.u[0]))) < 1e-10


@pytest.mark.parametrize("n,m,seed", DIMS)
def test_fuzz_hmpc_banded_structure(n, m, seed):
    """The banded HMPC backends' structural assumptions (arrowhead
    Hessian, tail coupling only through the last dynamics row) must hold
    for arbitrary stable plants and harmonic frequencies, not just the
    tester fixture: banded vs dense on random systems, identical per-lane
    k and 1e-9-class iterates."""
    sys, param, x0, xr, ur = _random_system(400 + seed, n, m)
    rng = np.random.default_rng(900 + seed)
    param = dict(param)
    param["w"] = float(rng.uniform(0.3, 1.5))
    param["Te"] = 5.0 * param["N"] * np.asarray(param["Q"])
    param["Th"] = param["Te"]
    param["Se"] = np.asarray(param["R"]).copy()
    param["Sh"] = 0.5 * param["Se"]
    kw = dict(rho=2.0, sigma=5.0, tol_p=1e-6, tol_d=1e-6, k_max=20000)
    for submethod in ("", "split"):
        s_b = sp.make_solver(sys, param, formulation="HMPC",
                             method="ADMM", submethod=submethod,
                             backend="banded", **kw)
        s_d = sp.make_solver(sys, param, formulation="HMPC",
                             method="ADMM", submethod=submethod, **kw)
        rb = s_b(x0, xr, ur)
        rd = s_d(x0, xr, ur)
        assert int(rb.e_flag[0]) == int(rd.e_flag[0]) == 1, submethod
        assert int(rb.k[0]) == int(rd.k[0]), submethod
        for key in ("z", "s", "lam"):
            gap = np.max(np.abs(np.asarray(rb.sol[key][0])
                                - np.asarray(rd.sol[key][0])))
            assert gap < 1e-9, (submethod, key, gap)
