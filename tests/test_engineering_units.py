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


# ---------------------------------------------------------------------------
# Engineering-units mode across the solver families (VERDICT r3 next-#7):
# the reference exercises scaling in every formulation (e.g.
# cons_MPCT_EADMM_C.m:109, code_HMPC_ADMM_C.c scaling blocks). Differential:
# in_engineering solve on engineering-unit inputs must equal the plain
# incremental solve on manually scaled inputs, with u de-scaled back.
# ---------------------------------------------------------------------------

_ENG_TRIPLES = [
    ("laxMPC", "FISTA", ""), ("equMPC", "ADMM", ""),
    ("ellipMPC", "ADMM", ""), ("ellipMPC", "ADMM", "soc"),
    ("MPCT", "EADMM", ""), ("MPCT", "ADMM", "cs"),
    ("MPCT", "ADMM", "semiband"),
    ("HMPC", "ADMM", ""), ("HMPC", "ADMM", "split"),
    ("ellipHMPC", "ADMM", ""),
]


@pytest.mark.parametrize("triple", _ENG_TRIPLES,
                         ids=["-".join(filter(None, t))
                              for t in _ENG_TRIPLES])
def test_engineering_mode_all_families(triple):
    from tests.test_codegen_c_ext import _float_setup
    f, m_, sm = triple
    sys0, param, st = sp.systems.tester_fixture()
    sysd, p, kw, _ = _float_setup(triple, sys0, param, st)
    n = len(st["x"])
    mdim = sysd["B"].shape[1]
    Nx, Nu = np.full(n, 1.5), np.full(mdim, 0.8)
    x_op, u_op = 0.01 * np.ones(n), 0.02 * np.ones(mdim)
    sys_eng = dict(sysd, Nx=Nx, Nu=Nu, x0=x_op, u0=u_op)
    for key in ("tol", "tol_p", "tol_d"):
        if key in kw:
            kw[key] = 1e-7

    opt = sp.default_options(f, m_, sm, **kw)
    opt.in_engineering = True
    s_eng = sp.make_solver(sys_eng, p, formulation=f, method=m_,
                           submethod=sm, options=opt)
    s_inc = sp.make_solver(sysd, p, formulation=f, method=m_,
                           submethod=sm, **kw)

    x0e = np.asarray(st["x"]) / Nx + x_op
    xre = np.asarray(st["xr"]) / Nx + x_op
    ure = np.asarray(st["ur"]) / Nu + u_op
    if f == "ellipHMPC":
        za, zu = np.zeros(n), np.zeros(mdim)
        r_eng = s_eng(x0e, xre, za, za, ure, zu, zu)
        r_inc = s_inc(st["x"], st["xr"], za, za, st["ur"], zu, zu)
    elif (f, sm) == ("ellipMPC", "soc"):
        r_eng = s_eng(x0e, xre, ure, np.array([0.5]))
        r_inc = s_inc(st["x"], st["xr"], st["ur"], np.array([0.5]))
    else:
        r_eng = s_eng(x0e, xre, ure)
        r_inc = s_inc(st["x"], st["xr"], st["ur"])
    assert int(r_eng.e_flag[0]) == int(r_inc.e_flag[0]) == 1, triple
    assert int(r_eng.k[0]) == int(r_inc.k[0]), triple
    zkey = "z1" if m_ == "EADMM" else "z"   # 3-block EADMM sol layout
    np.testing.assert_allclose(np.asarray(r_eng.sol[zkey][0]),
                               np.asarray(r_inc.sol[zkey][0]),
                               rtol=0, atol=1e-10)
    u_expected = np.asarray(r_inc.u[0]) / Nu + u_op
    np.testing.assert_allclose(np.asarray(r_eng.u[0]), u_expected,
                               rtol=0, atol=1e-10)


def test_engineering_harmonic_amplitude_scaling():
    """Amplitude inputs (xrs/xrc/urs/urc) scale WITHOUT the operating-point
    offset: x_eng(t) = xre + xrs sin + xrc cos maps to
    Nx(xre - opx) + (Nx xrs) sin + (Nx xrc) cos."""
    sys0, param, st = sp.systems.tester_fixture()
    from tests.test_codegen_c_ext import _float_setup
    sysd, p, kw, _ = _float_setup(("ellipHMPC", "ADMM", ""), sys0, param,
                                  st)
    n, mdim = len(st["x"]), sysd["B"].shape[1]
    Nx, Nu = np.full(n, 2.0), np.full(mdim, 0.5)
    x_op, u_op = 0.02 * np.ones(n), 0.01 * np.ones(mdim)
    sys_eng = dict(sysd, Nx=Nx, Nu=Nu, x0=x_op, u0=u_op)
    opt = sp.default_options("ellipHMPC", "ADMM", **kw)
    opt.in_engineering = True
    s_eng = sp.make_solver(sys_eng, p, formulation="ellipHMPC",
                           method="ADMM", options=opt)
    s_inc = sp.make_solver(sysd, p, formulation="ellipHMPC",
                           method="ADMM", **kw)
    xrs_i = 0.02 * np.ones(n)     # incremental sine amplitude
    urs_i = 0.05 * np.ones(mdim)
    r_eng = s_eng(np.asarray(st["x"]) / Nx + x_op,
                  np.asarray(st["xr"]) / Nx + x_op,
                  xrs_i / Nx, np.zeros(n),
                  np.asarray(st["ur"]) / Nu + u_op,
                  urs_i / Nu, np.zeros(mdim))
    r_inc = s_inc(st["x"], st["xr"], xrs_i, np.zeros(n),
                  st["ur"], urs_i, np.zeros(mdim))
    assert int(r_eng.k[0]) == int(r_inc.k[0])
    np.testing.assert_allclose(np.asarray(r_eng.sol["z"][0]),
                               np.asarray(r_inc.sol["z"][0]),
                               rtol=0, atol=1e-10)
