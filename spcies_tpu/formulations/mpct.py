"""MPCT formulation — MPC for tracking with artificial references
(arXiv:2008.09071).

    min  sum_{i=0}^{N} (||x_i - x_s||_Q^2 + ||u_i - u_s||_R^2)
         + ||x_s - xr||_T^2 + ||u_s - ur||_S^2
    s.t. x_0 = x(t), x_{i+1} = A x_i + B u_i, (x_s, u_s) steady state,
         x_N = x_s, u_N = u_s, LB <= (x_i, u_i) <= UB (eps-tightened at N)

EADMM solver — three-block extended ADMM
(compute_MPCT_EADMM_ingredients.m, code_MPCT_EADMM_C.c:85-459,
platforms/Matlab/spcies_MPCT_EADMM_solver.m):
  z1 = (x_i, u_i) box-clipped diagonal QP,
  z2 = (x_s, u_s) dense W2 multiply,
  z3 = (hat x_i, hat u_i) equality-QP over the prediction dynamics.
The coupling matrices A1/A2/A3 are never materialized — their structure
(identity stacks / ones-kron) is applied as reshapes and reductions, which
is the TPU-native replacement for the reference's baked sparse constants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from spcies_tpu.config import Options
from spcies_tpu.formulations.base import (register_builder, get_sys_matrices,
                                          get_bounds)
from spcies_tpu.utils import linalg
from spcies_tpu.utils.projections import proj_box
from spcies_tpu.solvers.common import SolveResult, inf_norm
from spcies_tpu.solvers.loop import run_masked_loop
from spcies_tpu.api import BatchedSolver


def _mpct_rho_vector(n, m, N, rho_base, rho_mult):
    """Structured penalty vector emphasizing the initial/terminal equality
    rows (compute_MPCT_EADMM_ingredients.m:81-91)."""
    nm = n + m
    nrow = (N + 1) * nm + n + nm
    rho = np.full(nrow, rho_base, dtype=float)
    hi = rho_mult * rho_base
    rho[:2 * n] = hi                          # x_0 = x and (6i) i=0 x-part
    rho[nrow - 2 * nm:] = hi                  # final coupling + (xs,us) rows
    return rho


def mpct_eadmm_ingredients(sys: dict, param: dict, opt: Options) -> dict:
    """Offline ingredients (compute_MPCT_EADMM_ingredients.m:60-316)."""
    A, B, n, m = get_sys_matrices(sys)
    N = int(param["N"])
    Q = np.asarray(param["Q"], dtype=float)
    R = np.asarray(param["R"], dtype=float)
    T = np.asarray(param["T"], dtype=float)
    S = np.asarray(param["S"], dtype=float)
    nm = n + m
    nz1 = (N + 1) * nm
    nrow = nz1 + n + nm

    if "rho" in opt.solver:
        rho_base = float(opt.solver["rho"])
        rho_mult = 1.0
    else:
        rho_base = float(opt.solver["rho_base"])
        rho_mult = float(opt.solver["rho_mult"])
    rho = _mpct_rho_vector(n, m, N, rho_base, rho_mult)
    # rho partitioned along the constraint rows: head n, middle (N+1)(n+m),
    # tail (n+m)
    rho_mid = rho[n:n + nz1]
    rho_head = rho[:n]
    rho_tail = rho[-nm:]

    # P1: H1 = (rho.*A1)'A1 is diagonal; diag = rho_mid + head/tail additions
    h1_diag = rho_mid.copy()
    h1_diag[:n] += rho_head
    h1_diag[-nm:] += rho_tail
    H1i = 1.0 / h1_diag

    # P2: H2 = blkdiag(T, S) + (rho.*A2)'A2; A2'diag(rho)A2 =
    # (sum of middle rho blocks + tail block) * I pattern
    r2 = rho_mid.reshape(N + 1, nm).sum(axis=0) + rho_tail
    H2 = linalg.blkdiag(T, S) + np.diag(r2)
    H2i = np.linalg.inv(H2)
    Az2 = np.hstack([A - np.eye(n), B])
    W2 = H2i @ Az2.T @ np.linalg.inv(Az2 @ H2i @ Az2.T) @ Az2 @ H2i - H2i

    # P3: H3 = kron(I_{N+1}, blkdiag(Q, R)) + diag(rho_mid)
    H3 = linalg.blkdiag(*([linalg.blkdiag(Q, R)] * (N + 1))) + np.diag(rho_mid)
    H3inv = np.linalg.inv(H3)
    # Az3: hat-dynamics A x_i + B u_i - x_{i+1} = 0 over N row blocks,
    # z3 stage-ordered (x_i, u_i) for i = 0..N
    Az3 = np.zeros((N * n, nz1))
    for i in range(N):
        Az3[i * n:(i + 1) * n, i * nm:i * nm + n] = A
        Az3[i * n:(i + 1) * n, i * nm + n:(i + 1) * nm] = B
        Az3[i * n:(i + 1) * n, (i + 1) * nm:(i + 1) * nm + n] = -np.eye(n)
    W3 = Az3 @ H3inv @ Az3.T
    W3inv = np.linalg.inv(W3)
    M3 = H3inv @ Az3.T @ W3inv @ Az3 @ H3inv - H3inv  # z3 = M3 q3

    # z1 bounds: x_0 free, stages 1..N-1 plain, stage N eps-tightened
    # (vars_nonsparse.LB/UB, compute_MPCT_EADMM_ingredients.m:295-296)
    LBx, UBx, LBu, UBu = get_bounds(sys, n, m, opt.inf_value)
    eps_x = float(opt.solver.get("epsilon_x", 1e-6))
    eps_u = float(opt.solver.get("epsilon_u", 1e-6))
    inf_v = opt.inf_value
    LB0 = np.concatenate([-inf_v * np.ones(n), LBu])
    UB0 = np.concatenate([inf_v * np.ones(n), UBu])
    LBmid = np.concatenate([LBx, LBu])
    UBmid = np.concatenate([UBx, UBu])
    LBs = np.concatenate([LBx + eps_x, LBu + eps_u])
    UBs = np.concatenate([UBx - eps_x, UBu - eps_u])
    LB = np.concatenate([LB0] + [LBmid] * (N - 1) + [LBs])
    UB = np.concatenate([UB0] + [UBmid] * (N - 1) + [UBs])

    return dict(
        n=n, m=m, N=N, nm=nm, nz1=nz1, nrow=nrow,
        A=A, B=B, T=T, S=S,
        rho=rho, H1i=H1i, W2=W2, M3=M3, H3inv=H3inv, Az3=Az3, W3=W3,
        LB=LB, UB=UB,
    )


@register_builder("MPCT", "EADMM")
def build_mpct_eadmm(sys: dict, param: dict, opt: Options,
                     backend: str = "dense") -> BatchedSolver:
    if backend not in ("dense",):
        raise ValueError("MPCT/EADMM has a dense backend")
    ing = mpct_eadmm_ingredients(sys, param, opt)
    dtype = jnp.float64 if opt.precision == "double" else jnp.float32
    n, m, N, nm = ing["n"], ing["m"], ing["N"], ing["nm"]
    nz1, nrow = ing["nz1"], ing["nrow"]
    tol = float(opt.solver["tol"])
    k_max = int(opt.solver["k_max"])

    rho = jnp.asarray(ing["rho"], dtype)
    H1i = jnp.asarray(ing["H1i"], dtype)
    W2 = jnp.asarray(ing["W2"], dtype)
    M3 = jnp.asarray(ing["M3"], dtype)
    LB = jnp.asarray(ing["LB"], dtype)
    UB = jnp.asarray(ing["UB"], dtype)
    T = jnp.asarray(ing["T"], dtype)
    S = jnp.asarray(ing["S"], dtype)

    # Matrix-free applies of the coupling matrices
    # (compute_MPCT_EADMM_ingredients.m:95-105): constraint rows split into
    # head [B, n] (x_0 = x), middle [B, N+1, nm] (-z1 + z2 + z3 = 0),
    # tail [B, nm] (z2 = (x_N, u_N)).
    def couple(z1, z2, z3, b0):
        """A1 z1 + A2 z2 + A3 z3 - b as (head, mid, tail)."""
        z1b = z1.reshape(-1, N + 1, nm)
        head = z1b[:, 0, :n] - b0
        mid = -z1b + z2[:, None, :] + z3.reshape(-1, N + 1, nm)
        tail = z2 - z1b[:, N, :]
        return head, mid, tail

    def a1t(head, mid, tail):
        """A1' applied to rows -> [B, nz1]."""
        out = -mid
        out = out.at[:, 0, :n].add(head)
        out = out.at[:, N, :].add(-tail)
        return out.reshape(-1, nz1)

    def a2t(head, mid, tail):
        """A2' applied to rows -> [B, nm]."""
        return mid.sum(axis=1) + tail

    def a3t(head, mid, tail):
        """A3' applied to rows -> [B, nz1]."""
        return mid.reshape(-1, nz1)

    def _solve(x0, xr, ur, init, fixed_iters):
        Bsz = x0.shape[0]
        q2_ref = -jnp.concatenate([xr @ T.T, ur @ S.T], axis=-1)
        rho_head = rho[:n]
        rho_mid = rho[n:n + nz1].reshape(N + 1, nm)
        rho_tail = rho[-nm:]

        if init is None:
            z1_0 = jnp.zeros((Bsz, nz1), dtype)
            z2_0 = jnp.zeros((Bsz, nm), dtype)
            z3_0 = jnp.zeros((Bsz, nz1), dtype)
            lam0 = jnp.zeros((Bsz, nrow), dtype)
        else:
            z1_0, z2_0, z3_0, lam0 = init

        rinf = jnp.full((Bsz,), jnp.inf, dtype=dtype)
        state0 = dict(z1=z1_0, z2=z2_0, z3=z3_0, lam=lam0,
                      r_pf=rinf, r_z2=rinf, r_z3=rinf)

        def lam_split(lam):
            return (lam[:, :n], lam[:, n:n + nz1].reshape(-1, N + 1, nm),
                    lam[:, -nm:])

        def body(state, _it):
            z2, z3, lam = state["z2"], state["z3"], state["lam"]
            lh, lm, lt = lam_split(lam)
            # P1 (spcies_MPCT_EADMM_solver.m:183-189): couple() with z1=0
            # gives A2 z2 + A3 z3 - b rows
            zeros1 = jnp.zeros((Bsz, nz1), dtype)
            h, mid, t = couple(zeros1, z2, z3, x0)
            q1 = (a1t(rho_head * h, rho_mid * mid, rho_tail * t)
                  + a1t(lh, lm, lt))
            z1 = proj_box(-q1 * H1i, LB, UB)
            # P2 (:194-198): A1 z1 + A3 z3 rows (b excluded: A2' rows of b
            # are zero since b is nonzero only in the head... b head IS in
            # A2' support? A2 head block is zero -> excluded correctly)
            h, mid, t = couple(z1, jnp.zeros((Bsz, nm), dtype), z3,
                               jnp.zeros((Bsz, n), dtype))
            q2 = (q2_ref + a2t(rho_head * h, rho_mid * mid, rho_tail * t)
                  + a2t(lh, lm, lt))
            z2_new = q2 @ W2.T
            # P3 (:203-210): A1 z1 + A2 z2 rows
            h, mid, t = couple(z1, z2_new, zeros1, jnp.zeros((Bsz, n), dtype))
            q3 = (a3t(rho_head * h, rho_mid * mid, rho_tail * t)
                  + a3t(lh, lm, lt))
            z3_new = q3 @ M3.T
            # residuals + dual update (:213-228)
            h, mid, t = couple(z1, z2_new, z3_new, x0)
            res_flat = jnp.concatenate(
                [h, mid.reshape(Bsz, -1), t], axis=-1)
            lam_new = lam + rho * res_flat
            r_pf = inf_norm(res_flat)
            r_z2 = inf_norm(z2_new - z2)
            r_z3 = inf_norm(z3_new - z3)
            conv = (r_pf <= tol) & (r_z2 <= tol) & (r_z3 <= tol)
            return (dict(z1=z1, z2=z2_new, z3=z3_new, lam=lam_new,
                         r_pf=r_pf, r_z2=r_z2, r_z3=r_z3), conv)

        state, k, e_flag = run_masked_loop(body, state0, k_max, Bsz,
                                           fixed_iters=fixed_iters)
        u = state["z1"][:, n:n + m]
        return SolveResult(u=u, k=k, e_flag=e_flag,
                           sol=dict(z1=state["z1"], z2=state["z2"],
                                    z3=state["z3"], lam=state["lam"],
                                    r_pf=state["r_pf"], r_z2=state["r_z2"],
                                    r_z3=state["r_z3"]))

    return BatchedSolver(_solve, ing, opt, n=n, m=m, N=N, nz=nz1,
                         dtype=dtype)
