"""Single-split ADMM engine.

The shared iteration skeleton of the reference's laxMPC/equMPC/ellipMPC/
MPCT-cs ADMM solvers (canonical version: code_laxMPC_ADMM_C.c:308-633):

    q_hat = q_ref + lambda - rho .* v          (dual-adjusted linear cost)
    z     = argmin_z 0.5 z'Hhat z + q_hat'z  s.t. G z = beq   (z_step)
    v     = proj(z + rho^{-1} .* lambda)                       (projection)
    lambda += rho .* (z - v)
    converged per-lane iff  ||z - v||_inf <= tol  (primal feasibility)
                        and ||v - v_prev||_inf <= tol  (fixed point)

The engine is generic over `z_step` (the equality-QP solve — dense affine
map, banded Alpha/Beta scan, or a Pallas kernel) and `proj` (box /
box+ellipsoid / cone projections), which is exactly the axis along which
the reference formulations differ.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from spcies_tpu.solvers.common import inf_norm
from spcies_tpu.solvers.loop import run_masked_loop


def admm_solve(
    z_step: Callable,          # z_step(q_hat[B, nz]) -> z[B, nz]
    proj: Callable,            # proj(y[B, nz]) -> v[B, nz]
    q_ref,                     # [B, nz] or [nz]
    rho,                       # scalar or [nz]
    rho_i,                     # scalar or [nz] (elementwise 1/rho)
    tol_p: float,
    tol_d: float,
    k_max: int,
    batch: int,
    nz: int,
    dtype,
    init=None,                 # optional (z0, v0, lam0) warm start
    fixed_iters: int | None = None,
):
    """Run batched single-split ADMM; returns (z, v, lam, k, e_flag, r_p, r_d)."""
    if init is None:
        zeros = jnp.zeros((batch, nz), dtype=dtype)
        z0, v0, lam0 = zeros, zeros, zeros
    else:
        z0, v0, lam0 = init

    state0 = dict(
        z=z0, v=v0, lam=lam0,
        r_p=jnp.full((batch,), jnp.inf, dtype=dtype),
        r_d=jnp.full((batch,), jnp.inf, dtype=dtype),
    )

    def body(state, _it):
        v_prev = state["v"]
        q_hat = q_ref + state["lam"] - rho * v_prev
        z = z_step(q_hat)
        v = proj(z + rho_i * state["lam"])
        lam = state["lam"] + rho * (z - v)
        r_p = inf_norm(z - v)
        r_d = inf_norm(v - v_prev)
        conv = jnp.logical_and(r_p <= tol_p, r_d <= tol_d)
        return dict(z=z, v=v, lam=lam, r_p=r_p, r_d=r_d), conv

    state, k, e_flag = run_masked_loop(body, state0, k_max, batch,
                                       fixed_iters=fixed_iters)
    return (state["z"], state["v"], state["lam"], k, e_flag,
            state["r_p"], state["r_d"])
