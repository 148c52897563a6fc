"""Differential tests for the generated plain-C solvers: generate C from
the tester fixture, compile with cc, run through the ctypes bridge, and
compare iterates against the JAX solver (both fp64) — the reference's
sparse-vs-oracle 1e-10 contract (tests/spcies_tester.m:260) applied to the
C backend."""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.codegen import (generate_c_solver, clear_generated,
                                CompiledCSolver)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    sys, param, status = sp.systems.tester_fixture()
    param = dict(param)
    param["T"] = np.diag(np.sum(param["T"], axis=1))
    outdir = str(tmp_path_factory.mktemp("generated_solvers"))
    return sys, param, status, outdir


OPTS = dict(rho=15.0, tol=1e-7, k_max=5000)


@pytest.mark.parametrize("formulation", ["laxMPC", "equMPC"])
def test_c_solver_matches_jax(fixture, formulation):
    sys, param, st, outdir = fixture
    p = dict(param)
    if formulation == "equMPC":
        p.pop("T")
    c_path = generate_c_solver(sys, p, formulation=formulation,
                               directory=outdir, **OPTS)
    assert c_path.endswith(".c")
    s_jax = sp.make_solver(sys, p, formulation=formulation, method="ADMM",
                           **OPTS)
    c = CompiledCSolver(f"{formulation.lower()}_admm", n=s_jax.n,
                        m=s_jax.m, nz=s_jax.nz, directory=outdir)

    rng = np.random.default_rng(5)
    for trial in range(3):
        x0 = np.asarray(st["x"]) * rng.uniform(-2.0, 2.0)
        u_c, k_c, e_c, sol_c = c(x0, st["xr"], st["ur"])
        r = s_jax(x0, st["xr"], st["ur"])
        assert e_c == int(r.e_flag[0]) == 1
        assert k_c == int(r.k[0])
        for key in ("z", "v", "lam"):
            gap = np.max(np.abs(sol_c[key] - np.asarray(r.sol[key][0])))
            assert gap < 1e-10, (key, gap)
        assert np.max(np.abs(u_c - np.asarray(r.u[0]))) < 1e-10
        assert sol_c["run_time_ms"] > 0.0


def test_generated_source_is_selfcontained(fixture):
    """The emitted C must carry its own data (static const) and compile
    with no includes beyond libc."""
    sys, param, st, outdir = fixture
    c_path = generate_c_solver(sys, param, formulation="laxMPC",
                               directory=outdir, **OPTS)
    src = open(c_path).read()
    assert "static const double ALPHA" in src
    assert "static const double BETAINV" in src
    for inc in ("math.h", "string.h", "time.h"):
        assert f"#include <{inc}>" in src
    # no external data dependencies
    assert "extern" not in src


def test_clear_generated(fixture, tmp_path):
    sys, param, st, _ = fixture
    d = str(tmp_path / "gen")
    generate_c_solver(sys, param, formulation="laxMPC", directory=d, **OPTS)
    import os
    assert os.path.isdir(d)
    clear_generated(d)
    assert not os.path.isdir(d)


@pytest.mark.parametrize("formulation", ["laxMPC", "equMPC"])
def test_c_fista_solver_matches_jax(fixture, formulation):
    from spcies_tpu.codegen import (generate_c_fista_solver,
                                    CompiledCFistaSolver)
    sys, param, st, outdir = fixture
    p = dict(param)
    if formulation == "equMPC":
        p.pop("T")
    opts = dict(tol=1e-7, k_max=5000)
    generate_c_fista_solver(sys, p, formulation=formulation,
                            directory=outdir, **opts)
    s_jax = sp.make_solver(sys, p, formulation=formulation, method="FISTA",
                           **opts)
    c = CompiledCFistaSolver(f"{formulation.lower()}_fista", n=s_jax.n,
                             m=s_jax.m, N=s_jax.N, nz=s_jax.nz,
                             directory=outdir)
    rng = np.random.default_rng(6)
    for trial in range(3):
        x0 = np.asarray(st["x"]) * rng.uniform(-2.0, 2.0)
        u_c, k_c, e_c, sol_c = c(x0, st["xr"], st["ur"])
        r = s_jax(x0, st["xr"], st["ur"])
        assert e_c == int(r.e_flag[0]) == 1
        assert k_c == int(r.k[0])
        for key in ("z", "lam"):
            gap = np.max(np.abs(sol_c[key] - np.asarray(r.sol[key][0])))
            assert gap < 1e-10, (key, gap)
        assert np.max(np.abs(u_c - np.asarray(r.u[0]))) < 1e-10


def test_c_ellipmpc_solver_matches_jax(fixture):
    """ellipMPC-ADMM C backend vs the JAX solver: P-weighted terminal
    q_hat, exact ellipsoid projection and P_half dual scaling must all
    agree to the 1e-10 differential contract — with an ACTIVE terminal
    constraint (small r) so the projection branch is exercised."""
    sys, param, st, outdir = fixture
    p = dict(param)
    n = len(np.asarray(st["xr"]))
    # non-identity SPD P so the P-norm projection is nontrivial
    rng = np.random.default_rng(11)
    M = rng.standard_normal((n, n))
    p["P"] = np.eye(n) + 0.1 * (M @ M.T)
    p["c"] = np.asarray(st["xr"])
    p["r"] = 0.05
    c_path = generate_c_solver(sys, p, formulation="ellipMPC",
                               directory=outdir, **OPTS)
    src = open(c_path).read()
    assert "PINVHALF" in src and "RADIUS" in src
    s_jax = sp.make_solver(sys, p, formulation="ellipMPC", method="ADMM",
                           **OPTS)
    c = CompiledCSolver("ellipmpc_admm", n=s_jax.n, m=s_jax.m,
                        nz=s_jax.nz, directory=outdir)
    projected = 0
    for trial in range(3):
        x0 = np.asarray(st["x"]) * rng.uniform(-2.0, 2.0)
        u_c, k_c, e_c, sol_c = c(x0, st["xr"], st["ur"])
        r = s_jax(x0, st["xr"], st["ur"])
        assert e_c == int(r.e_flag[0]) == 1
        assert k_c == int(r.k[0])
        for key in ("z", "v", "lam"):
            gap = np.max(np.abs(sol_c[key] - np.asarray(r.sol[key][0])))
            assert gap < 1e-10, (key, gap)
        # terminal state satisfies the ellipsoid constraint
        d = sol_c["v"][-s_jax.n:] - p["c"]
        val = d @ (p["P"] @ d)
        assert val <= p["r"] ** 2 + 1e-8
        if val > 0.5 * p["r"] ** 2:
            projected += 1
    assert projected >= 1  # the constraint was genuinely active


def test_c_mpct_eadmm_solver_matches_jax(fixture):
    """MPCT-EADMM C backend (3-block iteration, structured rho, dense
    W2/M3) vs the JAX engine to the 1e-10 differential contract."""
    from spcies_tpu.codegen import (generate_c_mpct_eadmm_solver,
                                    CompiledCMpctEadmmSolver)
    sys, param, st, outdir = fixture
    p = dict(param)
    p["T"] = 10.0 * np.asarray(p["Q"])   # test_MPCT_EADMM.m:14-15
    p["S"] = np.asarray(p["R"]).copy()
    opts = dict(rho_base=2.0, rho_mult=20.0, tol=1e-7, k_max=5000)
    generate_c_mpct_eadmm_solver(sys, p, directory=outdir, **opts)
    s_jax = sp.make_solver(sys, p, formulation="MPCT", method="EADMM",
                           **opts)
    c = CompiledCMpctEadmmSolver("mpct_eadmm", n=s_jax.n, m=s_jax.m,
                                 N=s_jax.N, directory=outdir)
    rng = np.random.default_rng(7)
    for trial in range(3):
        x0 = np.asarray(st["x"]) * rng.uniform(-2.0, 2.0)
        u_c, k_c, e_c, sol_c = c(x0, st["xr"], st["ur"])
        r = s_jax(x0, st["xr"], st["ur"])
        assert e_c == int(r.e_flag[0]) == 1
        assert k_c == int(r.k[0])
        for key in ("z1", "z2", "z3", "lam"):
            gap = np.max(np.abs(sol_c[key] - np.asarray(r.sol[key][0])))
            assert gap < 1e-10, (key, gap)
        assert np.max(np.abs(u_c - np.asarray(r.u[0]))) < 1e-10


@pytest.mark.parametrize("use_soc", [False, True])
def test_c_hmpc_solver_matches_jax(fixture, use_soc):
    """HMPC single-split ADMM C backend (harmonic KKT, SOC3/diamond cone
    projections) vs the JAX engine to the differential contract."""
    from spcies_tpu.codegen import (generate_c_hmpc_solver,
                                    CompiledCHmpcSolver)
    sys, param, st, outdir = fixture
    p = dict(param)
    p.pop("T", None)
    p["w"] = 3 * 1.627 * 0.2                     # test_HMPC_ADMM.m:14-21
    p["Te"] = 10 * p["N"] * np.asarray(p["Q"])
    p["Th"] = p["Te"]
    p["Se"] = np.asarray(p["R"]).copy()
    p["Sh"] = 0.5 * p["Se"]
    opts = dict(rho=2.0, tol_p=1e-7, tol_d=1e-7, k_max=5000,
                use_soc=use_soc)
    name = f"hmpc_admm_{'soc' if use_soc else 'd'}"
    generate_c_hmpc_solver(sys, p, directory=outdir, save_name=name, **opts)
    s_jax = sp.make_solver(sys, p, formulation="HMPC", method="ADMM",
                           **opts)
    ing = s_jax.ingredients
    c = CompiledCHmpcSolver(name, n=s_jax.n, m=s_jax.m, dim=ing["dim"],
                            n_s=ing["n_s"], directory=outdir)
    rng = np.random.default_rng(9)
    for trial in range(2):
        x0 = np.asarray(st["x"]) * rng.uniform(-2.0, 2.0)
        u_c, k_c, e_c, sol_c = c(x0, st["xr"], st["ur"])
        r = s_jax(x0, st["xr"], st["ur"])
        assert e_c == int(r.e_flag[0]) == 1
        assert k_c == int(r.k[0])
        for key in ("z", "s", "lam"):
            gap = np.max(np.abs(sol_c[key] - np.asarray(r.sol[key][0])))
            assert gap < 1e-10, (key, gap)
        assert np.max(np.abs(u_c - np.asarray(r.u[0]))) < 1e-10
