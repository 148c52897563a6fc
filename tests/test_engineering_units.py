"""Engineering-units mode (t03 workflow, examples/t03_real_systems.m):
Duffing oscillator linearized about an operating point, scaled to
incremental units via scale_ss, then solved with in_engineering=True —
inputs in engineering units, u_opt returned in engineering units
(code_laxMPC_ADMM_C.c:82-115 scaling, :642-651 de-scaling)."""

import numpy as np
import pytest

import spcies_tpu as sp
from spcies_tpu.systems import duffing_to_ss, scale_ss
from spcies_tpu.utils import linalg


DUFFING = dict(alpha=-1.0, beta=1.0, delta=0.3, gamma=1.0)


@pytest.fixture(scope="module")
def fixture():
    x_op = np.array([0.0, 1.0])     # linearize about (v, p) = (0, 1)
    u_op = np.array([DUFFING["delta"] * 0.0 + DUFFING["alpha"] * 1.0
                     + DUFFING["beta"] * 1.0])  # steady input at x_op
    Ac, Bc = duffing_to_ss(x_op, u_op, **DUFFING)
    A, B = linalg.c2d_zoh(Ac, Bc, 0.1)
    Nx = np.array([2.0, 0.5])
    Nu = np.array([4.0])
    scaled = scale_ss(A, B, UBx=x_op + 0.5, LBx=x_op - 0.5,
                      UBu=u_op + 1.0, LBu=u_op - 1.0,
                      x0=x_op, u0=u_op, Nx=Nx, Nu=Nu)
    sys = dict(scaled)
    param = dict(Q=np.diag([1.0, 10.0]), R=np.eye(1),
                 T=np.diag([5.0, 50.0]), N=12)
    return sys, param, x_op, u_op, Nx, Nu


def test_engineering_matches_manual_incremental(fixture):
    sys, param, x_op, u_op, Nx, Nu = fixture
    x_eng = x_op + np.array([0.05, -0.1])
    xr_eng = x_op
    ur_eng = u_op

    opt = sp.default_options("laxMPC", "ADMM", rho=1.0, tol=1e-7,
                             k_max=5000)
    opt.in_engineering = True
    s_eng = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                           options=opt)
    s_inc = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                           rho=1.0, tol=1e-7, k_max=5000)

    res_eng = s_eng(x_eng, xr_eng, ur_eng)
    res_inc = s_inc(Nx * (x_eng - x_op), Nx * (xr_eng - x_op),
                    Nu * (ur_eng - u_op))
    assert int(res_eng.e_flag[0]) == int(res_inc.e_flag[0]) == 1
    assert int(res_eng.k[0]) == int(res_inc.k[0])
    # sol iterates stay incremental; u is de-scaled to engineering units
    np.testing.assert_allclose(np.asarray(res_eng.sol["z"][0]),
                               np.asarray(res_inc.sol["z"][0]),
                               rtol=0, atol=1e-12)
    u_expected = np.asarray(res_inc.u[0]) / Nu + u_op
    np.testing.assert_allclose(np.asarray(res_eng.u[0]), u_expected,
                               rtol=0, atol=1e-12)


def test_engineering_closed_loop_regulates_to_op(fixture):
    """Closed loop in engineering units: the nonlinear Duffing plant driven
    by the engineering-units MPC should approach the operating point."""
    from spcies_tpu.systems import duffing_ode
    sys, param, x_op, u_op, Nx, Nu = fixture
    opt = sp.default_options("laxMPC", "ADMM", rho=1.0, tol=1e-5,
                             k_max=5000)
    opt.in_engineering = True
    s = sp.make_solver(sys, param, formulation="laxMPC", method="ADMM",
                       options=opt)
    Ts = 0.1
    x = x_op + np.array([0.1, -0.2])
    err0 = np.linalg.norm(x - x_op)
    for _ in range(100):
        res = s(x, x_op, u_op)
        assert int(res.e_flag[0]) == 1
        u = float(np.asarray(res.u[0])[0])
        # RK4 integration of the true nonlinear plant
        f = lambda xx: duffing_ode(0.0, xx, u, **DUFFING)
        k1 = f(x); k2 = f(x + Ts / 2 * k1)
        k3 = f(x + Ts / 2 * k2); k4 = f(x + Ts * k3)
        x = x + Ts / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    assert np.linalg.norm(x - x_op) < 0.2 * err0
