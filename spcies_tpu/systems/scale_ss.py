"""Engineering-units scaling of a discrete state-space model.

Transforms (x_o, u_o) to incremental scaled units x = Nx*(x_o - x0),
u = Nu*(u_o - u0), scaling A/B and the box constraints accordingly.
Reference: +sp_utils/scale_ss.m:27-41; consumed by the `in_engineering`
option (solvers then de-scale u_opt on output,
code_laxMPC_ADMM_C.c:642-651).
"""

from __future__ import annotations

import numpy as np


def scale_ss(A, B, UBx, LBx, UBu, LBu, x0, u0, Nx, Nu):
    Nx = np.asarray(Nx, dtype=float).ravel()
    Nu = np.asarray(Nu, dtype=float).ravel()
    x0 = np.asarray(x0, dtype=float).ravel()
    u0 = np.asarray(u0, dtype=float).ravel()
    As = np.diag(Nx) @ np.asarray(A, dtype=float) @ np.diag(1.0 / Nx)
    Bs = np.diag(Nx) @ np.asarray(B, dtype=float) @ np.diag(1.0 / Nu)
    return dict(
        A=As, B=Bs,
        UBx=Nx * (np.asarray(UBx, float) - x0),
        LBx=Nx * (np.asarray(LBx, float) - x0),
        UBu=Nu * (np.asarray(UBu, float) - u0),
        LBu=Nu * (np.asarray(LBu, float) - u0),
        x0=x0, u0=u0, Nx=Nx, Nu=Nu,
    )
