"""API-surface tests: CLI dispatcher, formulation auto-detection, the
`personal` formulation escape hatch, and the tutorial examples."""

import os
import subprocess
import sys as _sys

import numpy as np
import pytest

import spcies_tpu as sp


def test_determine_formulation():
    assert sp.determine_formulation(dict(Q=1, R=1, T=1, S=1)) == "MPCT"
    assert sp.determine_formulation(dict(Q=1, R=1, w=0.5)) == "HMPC"
    assert sp.determine_formulation(dict(Q=1, R=1, P=1, c=0)) == "ellipMPC"
    assert sp.determine_formulation(dict(Q=1, R=1, P=1)) == "laxMPC"
    assert sp.determine_formulation(dict(Q=1, R=1, T=1)) == "laxMPC"
    with pytest.raises(ValueError, match="not recognized"):
        sp.determine_formulation(dict(Q=1, R=1))


def test_make_solver_autodetects(tmp_path):
    sys, param, st = sp.systems.tester_fixture()
    s = sp.make_solver(sys, param, rho=15.0, tol=1e-4, k_max=1000)
    assert s.options.formulation == "laxMPC"
    res = s(st["x"], st["xr"], st["ur"])
    assert int(res.e_flag[0]) == 1


def test_personal_formulation_hatch():
    """A user-registered formulation builds and solves through make_solver
    (the reference's formulations/+personal/ plugin dir,
    spcies_gen_controller.m:101)."""
    from spcies_tpu.formulations import register_builder, BUILDERS
    from spcies_tpu.api import BatchedSolver
    from spcies_tpu.solvers.common import SolveResult
    import jax.numpy as jnp

    key = ("personal", "gradientDescent", "")
    if key in BUILDERS:
        del BUILDERS[key]

    @register_builder("personal", "gradientDescent")
    def build(sys, param, opt, backend="dense"):
        n = np.asarray(sys["A"]).shape[0]

        def _solve(x0, xr, ur, init, fixed_iters):
            u = -0.5 * x0[:, :2]
            B = x0.shape[0]
            return SolveResult(u=u, k=jnp.ones(B, jnp.int32),
                               e_flag=jnp.ones(B, jnp.int32), sol={})
        return BatchedSolver(_solve, {}, opt, n=n, m=2, N=1, nz=n,
                             dtype=jnp.float64)

    sys, param, st = sp.systems.tester_fixture()
    s = sp.make_solver(sys, param, formulation="personal",
                       method="gradientDescent")
    res = s(st["x"], st["xr"], st["ur"])
    np.testing.assert_allclose(np.asarray(res.u[0]),
                               -0.5 * np.asarray(st["x"][:2]))
    del BUILDERS[key]


def _run_cli(*args, cwd=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([_sys.executable, "-m", "spcies_tpu", *args],
                          capture_output=True, text=True, cwd=cwd, env=env)


def test_cli_version_root_help(tmp_path):
    out = _run_cli("version")
    assert out.returncode == 0 and sp.__version__ in out.stdout
    out = _run_cli("root")
    assert out.returncode == 0 and "spcies_tpu" in out.stdout
    out = _run_cli("help")
    assert out.returncode == 0 and "help topics" in out.stdout
    out = _run_cli("help", "codegen")
    assert out.returncode == 0 and "generate_c_solver" in out.stdout
    out = _run_cli("help", "nonexistent_topic")
    assert out.returncode == 1


def test_cli_gen_demo(tmp_path):
    out = _run_cli("gen", "--demo", "--directory", str(tmp_path / "g"),
                   "--rho", "15.0")
    assert out.returncode == 0, out.stderr
    assert os.path.exists(tmp_path / "g" / "laxmpc_admm.c")
    assert os.path.exists(tmp_path / "g" / "liblaxmpc_admm.so")
    # the dispatcher covers all 11 triples; spot-check a submethod route
    out = _run_cli("gen", "--demo", "--formulation", "MPCT",
                   "--method", "ADMM", "--submethod", "cs",
                   "--directory", str(tmp_path / "g"))
    assert out.returncode == 0, out.stderr
    assert os.path.exists(tmp_path / "g" / "mpct_admm_cs.c")


def test_cli_declare_license_install(tmp_path):
    out = _run_cli("declare", "KVEC", "1.0,2.0", str(tmp_path))
    assert out.returncode == 0, out.stderr
    txt = open(tmp_path / "KVEC_declaration.txt").read()
    assert "static const double KVEC[2]" in txt
    out = _run_cli("license")
    assert out.returncode == 0 and "Apache License" in out.stdout
    for cmd in ("install", "uninstall"):
        out = _run_cli(cmd)
        assert out.returncode == 0 and "pip" in out.stdout


@pytest.mark.parametrize("script", [
    "t00_basic_tutorial.py", "t01_time_varying.py", "t02_plain_c.py",
    "t03_real_systems.py", "t04_dev_solver_versions.py"])
def test_examples_run(script, tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1",
               PYTHONPATH=root)
    out = subprocess.run(
        [_sys.executable, os.path.join(root, "examples", script)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600)
    assert out.returncode == 0, (out.stdout, out.stderr)


def test_debug_history_traces():
    """options.debug records per-iteration residual histories (the
    genHist analogue, spcies_laxMPC_ADMM_solver.m:308-319)."""
    sys, param, st = sp.systems.tester_fixture()
    opt = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-5,
                             k_max=2000)
    opt.debug = True
    s = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                       options=opt)
    res = s(st["x"], st["xr"], st["ur"])
    k = int(res.k[0])
    hRp = np.asarray(res.sol["hRp"][0])
    hRd = np.asarray(res.sol["hRd"][0])
    assert hRp.shape == (2000,)
    # the recorded trace must end at the final residuals and be below tol
    # at the lane's exit iteration
    assert hRp[k - 1] <= 1e-5 and hRd[k - 1] <= 1e-5
    assert hRd[0] > 1e-5            # not converged at iteration 1
    np.testing.assert_allclose(hRp[k - 1], float(res.sol["r_p"][0]))

    # MPCT-EADMM history (three residual traces)
    p2 = dict(param, T=10 * np.asarray(param["Q"]),
              S=np.asarray(param["R"]))
    opt2 = sp.default_options("MPCT", "EADMM", rho_base=2.0, rho_mult=20.0,
                              tol=1e-5, k_max=2000)
    opt2.debug = True
    s2 = sp.make_solver(sys, p2, formulation="MPCT", method="EADMM",
                        options=opt2)
    r2 = s2(st["x"], st["xr"], st["ur"])
    k2 = int(r2.k[0])
    for key in ("hRpf", "hRz2", "hRz3"):
        assert np.asarray(r2.sol[key][0])[k2 - 1] <= 1e-5


def test_sp_utils_parity():
    """Numerics utilities mirroring +sp_utils: CSR/CSC round trips, sparse
    matvec, LDL factor+solve."""
    from spcies_tpu.utils import linalg
    rng = np.random.default_rng(11)
    M = rng.standard_normal((6, 8))
    M[np.abs(M) < 0.7] = 0.0
    val, col, ptr = linalg.full2csr(M)
    x = rng.standard_normal(8)
    np.testing.assert_allclose(linalg.csr_matvec(val, col, ptr, x), M @ x,
                               atol=1e-12)
    val_c, row_c, cptr = linalg.full2csc(M)
    # CSC of M == CSR of M.T
    val_t, col_t, ptr_t = linalg.full2csr(M.T)
    np.testing.assert_array_equal(val_c, val_t)
    np.testing.assert_array_equal(row_c, col_t)
    np.testing.assert_array_equal(cptr, ptr_t)

    A = rng.standard_normal((7, 7))
    W = A @ A.T + 7 * np.eye(7)
    L, d = linalg.ldl_factor(W)
    np.testing.assert_allclose(L @ np.diag(d) @ L.T, W, atol=1e-10)
    b = rng.standard_normal(7)
    np.testing.assert_allclose(linalg.ldl_solve(L, d, b),
                               np.linalg.solve(W, b), atol=1e-10)


def test_problem_recipe(tmp_path):
    """Problem recipe (Spcies_problem.m analogue): bundles sys/param/
    options, copy() isolates mutations, and both build arms work."""
    sys, param, st = sp.systems.tester_fixture()
    opt = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-4,
                             k_max=500)
    prob = sp.Problem(sys=dict(sys), param=dict(param), options=opt)
    p2 = prob.copy()
    p2.options.solver["rho"] = 99.0
    p2.param["N"] = 5
    assert prob.options.solver["rho"] == 15.0 and prob.param["N"] != 5

    s = prob.solver()
    res = s(st["x"], st["xr"], st["ur"])
    assert int(res.e_flag[0]) == 1

    c_path = prob.generate_c(directory=str(tmp_path), compile=False)
    assert c_path.endswith(".c") and os.path.exists(c_path)


def test_auto_backend_selection():
    """backend='auto' probes the available backends at build time and
    returns the fastest (VERDICT r3 next-#2: fused must never silently
    underperform; at tiny nz the 128-lane padding penalty makes dense the
    right choice, at long horizons banded/fused win)."""
    import spcies_tpu as sp
    import numpy as np
    sys_, param, st = sp.systems.tester_fixture()
    s = sp.make_solver(sys_, param, formulation="laxMPC", method="ADMM",
                       backend="auto", rho=15.0, tol=1e-6, k_max=5000,
                       auto_probe_batch=64, auto_probe_iters=5,
                       auto_probe_reps=1)
    assert s.backend_choice in ("dense", "fused", "banded")
    assert set(s.backend_probe_s) >= {"dense", "banded"}
    # the chosen solver still solves correctly
    res = s(st["x"], st["xr"], st["ur"])
    assert int(res.e_flag[0]) == 1
    s_ref = sp.make_solver(sys_, param, formulation="laxMPC",
                           method="ADMM", rho=15.0, tol=1e-6, k_max=5000)
    r_ref = s_ref(st["x"], st["xr"], st["ur"])
    assert np.max(np.abs(np.asarray(res.u[0])
                         - np.asarray(r_ref.u[0]))) < 1e-6


def test_auto_backend_single_candidate():
    """Triples with one backend (no probe needed) still work under
    'auto' and record the choice."""
    import spcies_tpu as sp
    import numpy as np
    sys_, param, st = sp.systems.tester_fixture()
    p = dict(param)
    p["T"] = 10.0 * np.asarray(p["Q"])
    p["S"] = np.asarray(p["R"]).copy()
    s = sp.make_solver(sys_, p, formulation="MPCT", method="ADMM",
                       submethod="semiband", backend="auto", rho=0.5,
                       tol_p=1e-6, tol_d=1e-6, k_max=3000,
                       auto_probe_batch=64, auto_probe_iters=5,
                       auto_probe_reps=1)
    assert s.backend_choice in ("dense", "banded")
    res = s(st["x"], st["xr"], st["ur"])
    assert int(res.e_flag[0]) == 1


def test_auto_backend_probe_cache(tmp_path, monkeypatch):
    """The auto-backend decision persists on disk keyed by (triple, dims,
    chip kind, probe config) — a second make_solver for the same shape
    skips the probe and builds ONLY the winning backend, even in a fresh
    process (VERDICT r4 next-#7; the reference's offline-once codegen
    economics, spcies_gen_controller.m:72-135)."""
    import spcies_tpu as sp
    from spcies_tpu.formulations import base as fbase
    import numpy as np
    monkeypatch.setenv("SPCIES_AUTO_CACHE_DIR", str(tmp_path))
    sys_, param, st = sp.systems.tester_fixture()
    kw = dict(formulation="laxMPC", method="ADMM", backend="auto",
              rho=15.0, tol=1e-6, k_max=5000, auto_probe_batch=64,
              auto_probe_iters=5, auto_probe_reps=1)

    builds = []
    real = fbase.get_builder("laxMPC", "ADMM")

    def counting(sys, param, opt, backend="dense"):
        builds.append(backend)
        return real(sys, param, opt, backend=backend)

    monkeypatch.setitem(fbase.BUILDERS, ("laxMPC", "ADMM", ""), counting)

    s1 = sp.make_solver(sys_, param, **kw)
    assert not s1.backend_probe_cached
    n_first = len(builds)
    assert n_first >= 2                       # probed several backends
    assert (tmp_path / "spcies_auto_backend.json").exists()

    s2 = sp.make_solver(sys_, param, **kw)    # same shape: cache hit
    assert s2.backend_probe_cached
    assert s2.backend_probe_s == {}
    assert s2.backend_choice == s1.backend_choice
    assert len(builds) == n_first + 1         # built ONLY the winner

    # refresh forces a re-probe
    s3 = sp.make_solver(sys_, param, auto_probe_refresh=True, **kw)
    assert not s3.backend_probe_cached
    assert len(builds) > n_first + 1

    # a different shape misses the cache
    p2 = dict(param)
    p2["N"] = 12
    s4 = sp.make_solver(sys_, p2, **kw)
    assert not s4.backend_probe_cached
    res = s2(st["x"], st["xr"], st["ur"])
    assert int(res.e_flag[0]) == 1
