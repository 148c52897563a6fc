"""Direct coverage of the BASELINE.json contract configs that the
per-solver suites don't already pin:

  - "equMPC + FISTA on Duffing oscillator (linearized), terminal equality
    constraint"
  - "HMPC + SADMM with shifted-SOC constraints, 10k-scenario batch across
    hosts" (run here at a CPU-affordable batch on the virtual 8-device
    mesh; the sharding/collective path is identical at 10k lanes)
"""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.systems import duffing_to_ss
from spcies_tpu.utils import linalg


def test_equmpc_fista_duffing():
    """equMPC-FISTA drives the linearized Duffing oscillator to the
    terminal-equality reference; cross-checked against the ADMM engine on
    the same QP."""
    x_op = np.array([0.0, 1.0])
    u_op = np.array([0.3 * 0.0 + -1.0 * 1.0 + 1.0 * 1.0])
    Ac, Bc = duffing_to_ss(x_op, u_op, alpha=-1.0, beta=1.0, delta=0.3,
                           gamma=1.0)
    A, B = linalg.c2d_zoh(Ac, Bc, 0.1)
    sys = dict(A=A, B=B, LBx=-0.5 * np.ones(2), UBx=0.5 * np.ones(2),
               LBu=-1.0 * np.ones(1), UBu=1.0 * np.ones(1))
    param = dict(Q=np.diag([1.0, 10.0]), R=np.eye(1), N=15)

    s_f = sp.make_solver(sys, param, formulation="equMPC", method="FISTA",
                         tol=1e-8, k_max=20000)
    s_a = sp.make_solver(sys, param, formulation="equMPC", method="ADMM",
                         rho=1.0, tol=1e-8, k_max=20000)
    x0 = np.array([0.1, -0.2])
    xr = np.zeros(2)
    ur = np.zeros(1)
    rf = s_f(x0, xr, ur)
    ra = s_a(x0, xr, ur)
    assert int(rf.e_flag[0]) == int(ra.e_flag[0]) == 1
    # same QP optimum from both engines
    assert np.max(np.abs(np.asarray(rf.u[0]) - np.asarray(ra.u[0]))) < 1e-5
    # terminal equality holds: simulate the open-loop plan to x_N ~= xr
    z = np.asarray(rf.sol["z"][0])
    n, m, N = 2, 1, 15
    x = x0.copy()
    u0 = z[:m]
    x = A @ x + B @ u0
    for l in range(N - 1):
        blk = z[m + l * (n + m): m + (l + 1) * (n + m)]
        x = A @ blk[:n] + B @ blk[n:]
    assert np.max(np.abs(x - xr)) < 1e-5


def test_hmpc_sadmm_sharded_batch():
    """HMPC-SADMM-split at a sharded scenario batch on the device mesh
    with psum'd fleet metrics — the BASELINE '10k-scenario batch across
    hosts' path (batch scaled to CPU-test size; the sharding is
    batch-dim-only so the collective pattern is size-independent)."""
    sys, param, st = sp.systems.tester_fixture()
    p = dict(param)
    p.pop("T", None)
    p["w"] = 3 * 1.627 * 0.2
    p["Te"] = 10 * p["N"] * np.asarray(p["Q"])
    p["Th"] = p["Te"]
    p["Se"] = np.asarray(p["R"]).copy()
    p["Sh"] = 0.5 * p["Se"]
    s = sp.make_solver(sys, p, formulation="HMPC", method="SADMM",
                       submethod="split", rho=2.0, sigma=20.0,
                       tol_p=1e-5, tol_d=1e-5, k_max=2000, use_soc=True)
    mesh = sp.parallel.batch_mesh()
    n_dev = len(mesh.devices.ravel())
    B = 64 * n_dev
    rng = np.random.default_rng(13)
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-1.5, 1.5, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    out = sp.parallel.sharded_solver(s, mesh)(x0, xr, ur)
    m = sp.parallel.fleet_metrics(out)
    assert m["n_lanes"] == B
    assert m["n_converged"] == B
    # inputs really were partitioned over the mesh batch axis
    assert "batch" in str(out.u.sharding)
