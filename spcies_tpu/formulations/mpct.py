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
import jax
import jax.numpy as jnp

from spcies_tpu.config import Options
from spcies_tpu.formulations.base import (register_builder, get_sys_matrices,
                                          get_bounds)
from spcies_tpu.utils import linalg
from spcies_tpu.utils.projections import proj_box
from spcies_tpu.solvers.admm import admm_solve
from spcies_tpu.solvers.common import (SolveResult, inf_norm,
                                        hist_sol_entries,
                                        delta_dot)
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
    # force_diagonal (reference compute_MPCT_EADMM_ingredients.m:142-155):
    # when requested AND Q/R actually diagonal, H3^{-1} is taken as the
    # elementwise reciprocal of its diagonal (the reference's H3i / IS_DIAG
    # representation); non-diagonal Q/R silently falls back to the general
    # dense inverse, exactly like the reference's auto-detect. The online
    # z3 map M3 is baked offline either way, so the solve is identical —
    # this knob only selects the offline factorization path.
    is_diag = (np.allclose(Q, np.diag(np.diag(Q)))
               and np.allclose(R, np.diag(np.diag(R))))
    if opt.force_diagonal and is_diag:
        H3inv = np.diag(1.0 / np.diag(H3))
    else:
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


def _build_mpct_eadmm_fused(ing, opt):
    """'fused' backend for the 3-block EADMM loop (kernels/fused_eadmm.py):
    the whole iteration VMEM-resident in the broadcast lane layout, the
    A1/A3 coupling applies elementwise and the A2/W2 block folded into
    two offline Z x Z constants."""
    from spcies_tpu.kernels.fused_admm import _round_up
    from spcies_tpu.kernels.fused_eadmm import fused_eadmm_solve

    if opt.precision != "float":
        raise ValueError("the fused backend is the fp32 production path; "
                         "use backend='dense' for fp64 verification")
    n, m, N, nm = ing["n"], ing["m"], ing["N"], ing["nm"]
    nz1 = ing["nz1"]
    tol = float(opt.solver["tol"])
    k_max = int(opt.solver["k_max"])
    tile_b = int(opt.solver.get("tile_b", 256))
    check_every = int(opt.solver.get("check_every", 1))
    interpret = bool(opt.solver.get("pallas_interpret", False))

    Z = _round_up(nz1, 128)
    rho = ing["rho"]
    # z2 block folded offline: v(mid rows) @ C2m + v(tail rows) @ C2t =
    # tile(W2 (A2' v), N+1)  — blocksum (A2mid), W2 map, broadcast (BC)
    W2BC = ing["W2"].T @ np.tile(np.eye(nm), (1, N + 1))    # [nm, nz1]
    A2mid = np.tile(np.eye(nm), (N + 1, 1))                 # [nz1, nm]
    C2m = np.zeros((Z, Z), np.float32)
    C2m[:nz1, :nz1] = A2mid @ W2BC
    C2t = np.zeros((Z, Z), np.float32)
    C2t[N * nm:nz1, :nz1] = W2BC
    M3p = np.zeros((Z, Z), np.float32)
    M3p[:nz1, :nz1] = ing["M3"].T

    def _rowz():
        return np.zeros((1, Z), np.float32)

    rm_row = _rowz()
    rm_row[0, :nz1] = rho[n:n + nz1]
    rht_row = _rowz()
    rht_row[0, :n] = rho[:n]
    rht_row[0, N * nm:nz1] = rho[-nm:]
    mh_row = _rowz()
    mh_row[0, :n] = 1.0
    mt_row = _rowz()
    mt_row[0, N * nm:nz1] = 1.0
    mr_row = _rowz()
    mr_row[0, :nz1] = 1.0
    h1i_row = _rowz()
    h1i_row[0, :nz1] = ing["H1i"]
    lb_row = _rowz()
    lb_row[0, :nz1] = np.maximum(ing["LB"], -1e30)
    ub_row = _rowz()
    ub_row[0, :nz1] = np.minimum(ing["UB"], 1e30)
    consts = tuple(jnp.asarray(a) for a in (
        C2m, C2t, M3p, rm_row, rht_row, mh_row, mt_row, mr_row,
        h1i_row, lb_row, ub_row))
    W2j = jnp.asarray(ing["W2"], jnp.float32)
    Tj = jnp.asarray(ing["T"], jnp.float32)
    Sj = jnp.asarray(ing["S"], jnp.float32)

    def _solve(x0, xr, ur, init, fixed_iters):
        if fixed_iters is not None:
            raise ValueError("fixed_iters is not supported by the fused "
                             "EADMM backend; use backend='dense'")
        Bsz = x0.shape[0]
        q2_ref = -jnp.concatenate([xr @ Tj.T, ur @ Sj.T], axis=-1)
        z2ref = q2_ref @ W2j.T             # highest-precision context
        Bp = _round_up(Bsz, tile_b)

        def padB(a):
            return jnp.pad(a, ((0, Bp - Bsz), (0, Z - a.shape[1])))

        x0b = padB(x0)                     # x0 at the head lanes
        z2refb = padB(jnp.tile(z2ref, (1, N + 1)))
        if init is None:
            z2b0 = jnp.zeros((Bp, Z), jnp.float32)
            z30 = jnp.zeros((Bp, Z), jnp.float32)
            lm0 = jnp.zeros((Bp, Z), jnp.float32)
            lht0 = jnp.zeros((Bp, Z), jnp.float32)
        else:
            _z1i, z2i, z3i, lami = init
            z2b0 = padB(jnp.tile(z2i, (1, N + 1)))
            z30 = padB(z3i)
            lm0 = padB(lami[:, n:n + nz1])
            lht0 = (jnp.zeros((Bp, Z), jnp.float32)
                    .at[:Bsz, :n].set(lami[:, :n])
                    .at[:Bsz, N * nm:nz1].set(lami[:, -nm:]))
        import jax as _jax
        with _jax.default_matmul_precision("default"):
            (z1, z2b, z3, lm, lht, k, e_flag,
             r_pf, r_z2, r_z3) = fused_eadmm_solve(
                x0b, z2refb, z2b0, z30, lm0, lht0, *consts,
                tol=tol, k_max=k_max, tile_b=tile_b,
                check_every=check_every,
                exact_k=bool(opt.solver.get("exact_k", False)),
                interpret=interpret)
        lam = jnp.concatenate(
            [lht[:Bsz, :n], lm[:Bsz, :nz1], lht[:Bsz, N * nm:nz1]],
            axis=-1)
        return SolveResult(
            u=z1[:Bsz, n:n + m], k=k[:Bsz], e_flag=e_flag[:Bsz],
            sol=dict(z1=z1[:Bsz, :nz1], z2=z2b[:Bsz, :nm],
                     z3=z3[:Bsz, :nz1], lam=lam,
                     r_pf=r_pf[:Bsz], r_z2=r_z2[:Bsz], r_z3=r_z3[:Bsz]))

    return _solve


@register_builder("MPCT", "EADMM")
def build_mpct_eadmm(sys: dict, param: dict, opt: Options,
                     backend: str = "dense") -> BatchedSolver:
    if backend not in ("dense", "fused"):
        raise ValueError("MPCT/EADMM has dense and fused backends")
    ing = mpct_eadmm_ingredients(sys, param, opt)
    dtype = jnp.float64 if opt.precision == "double" else jnp.float32
    n, m, N, nm = ing["n"], ing["m"], ing["N"], ing["nm"]
    nz1, nrow = ing["nz1"], ing["nrow"]
    if backend == "fused":
        _solve_f = _build_mpct_eadmm_fused(ing, opt)
        return BatchedSolver(_solve_f, ing, opt, n=n, m=m, N=N, nz=nz1,
                             dtype=dtype)
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

        if opt.debug:
            state, k, e_flag, hist = run_masked_loop(
                body, state0, k_max, Bsz, fixed_iters=fixed_iters,
                history_keys=("r_pf", "r_z2", "r_z3")
                + (("z1", "z2", "z3", "lam")
                   if int(opt.debug) >= 2 else ()))
        else:
            state, k, e_flag = run_masked_loop(body, state0, k_max, Bsz,
                                               fixed_iters=fixed_iters)
            hist = None
        u = state["z1"][:, n:n + m]
        return SolveResult(u=u, k=k, e_flag=e_flag,
                           sol=dict(z1=state["z1"], z2=state["z2"],
                                    z3=state["z3"], lam=state["lam"],
                                    r_pf=state["r_pf"], r_z2=state["r_z2"],
                                    r_z3=state["r_z3"],
                                    **({"hRpf": hist["r_pf"],
                                        "hRz2": hist["r_z2"],
                                        "hRz3": hist["r_z3"]}
                                       if hist else {})))

    return BatchedSolver(_solve, ing, opt, n=n, m=m, N=N, nz=nz1,
                         dtype=dtype)


# ---------------------------------------------------------------------------
# ADMM-cs: compact/extended state space
# ---------------------------------------------------------------------------

def mpct_cs_equality_matrix(A: np.ndarray, B: np.ndarray, N: int):
    """Equality matrix over the extended stage variables
    z_j = (x_j, x_s, u_j, u_s), j = 0..N-1
    (compute_MPCT_ADMM_cs_ingredients.m:96-113):
      rows 0..n:      x_0 = x(t)
      rows n..2n:     (A - I) x_s + B u_s = 0
      per transition: A x_j + B u_j - x_{j+1} = 0; x_s, u_s constant
      last n rows:    A x_{N-1} + B u_{N-1} = x_s
    """
    n, m = A.shape[0], B.shape[1]
    sd = 2 * (n + m)                    # stage dim
    neq = 2 * n + (2 * n + m) * (N - 1) + n
    Aeq = np.zeros((neq, N * sd))
    # init condition + steady-state condition on stage 0
    Aeq[:n, :n] = np.eye(n)
    Aeq[n:2 * n, n:2 * n] = A - np.eye(n)
    Aeq[n:2 * n, 2 * n + m:sd] = B
    r = 2 * n
    for j in range(N - 1):
        c = j * sd
        # A x_j + B u_j - x_{j+1} = 0
        Aeq[r:r + n, c:c + n] = A
        Aeq[r:r + n, c + 2 * n:c + 2 * n + m] = B
        Aeq[r:r + n, c + sd:c + sd + n] = -np.eye(n)
        # x_s carried: x_s_j - x_s_{j+1} = 0
        Aeq[r + n:r + 2 * n, c + n:c + 2 * n] = np.eye(n)
        Aeq[r + n:r + 2 * n, c + sd + n:c + sd + 2 * n] = -np.eye(n)
        # u_s carried
        Aeq[r + 2 * n:r + 2 * n + m, c + 2 * n + m:c + sd] = np.eye(m)
        Aeq[r + 2 * n:r + 2 * n + m, c + sd + 2 * n + m:c + 2 * sd] = -np.eye(m)
        r += 2 * n + m
    # terminal: A x_{N-1} + B u_{N-1} - x_s = 0
    c = (N - 1) * sd
    Aeq[r:r + n, c:c + n] = A
    Aeq[r:r + n, c + n:c + 2 * n] = -np.eye(n)
    Aeq[r:r + n, c + 2 * n:c + 2 * n + m] = B
    return Aeq


def mpct_admm_cs_ingredients(sys: dict, param: dict, opt: Options) -> dict:
    """Offline ingredients (compute_MPCT_ADMM_cs_ingredients.m:83-141).
    TPU-native: the reference's CSR SpMV + sparse LDL pipeline collapses
    into the dense affine map z = M_q q_hat + M_b x0."""
    A, B, n, m = get_sys_matrices(sys)
    N = int(param["N"])
    Q = np.asarray(param["Q"], dtype=float)
    R = np.asarray(param["R"], dtype=float)
    T = np.asarray(param["T"], dtype=float)
    S = np.asarray(param["S"], dtype=float)
    sd = 2 * (n + m)
    nz = N * sd

    rho = np.asarray(opt.solver["rho"], dtype=float)
    force_vec = bool(opt.solver.get("force_vector_rho", False))
    rho_is_scalar = rho.ndim == 0 and not force_vec
    rho_vec = np.full(nz, float(rho)) if rho.ndim == 0 else rho.ravel().copy()
    if rho_vec.size != nz:
        raise ValueError(f"rho vector must have length {nz}")

    Qz = np.block([[Q, -Q], [-Q, Q + T / N]])
    Rz = np.block([[R, -R], [-R, R + S / N]])
    H = linalg.blkdiag(*([linalg.blkdiag(Qz, Rz)] * N))
    Hhat = H + np.diag(rho_vec)
    Hinv = np.linalg.inv(Hhat)

    G = mpct_cs_equality_matrix(A, B, N)
    W = G @ Hinv @ G.T
    GH = G @ Hinv
    Winv = np.linalg.inv(W)
    M_q = GH.T @ (Winv @ GH) - Hinv
    M_b = GH.T @ Winv[:, :n]          # beq nonzero only in x_0 = x(t) rows

    # eps-tightened bounds on every stage (:115-122)
    LBx, UBx, LBu, UBu = get_bounds(sys, n, m, opt.inf_value)
    eps_x = float(opt.solver["epsilon_x"])
    eps_u = float(opt.solver["epsilon_u"])
    LBst = np.concatenate([LBx, LBx + eps_x, LBu, LBu + eps_u])
    UBst = np.concatenate([UBx, UBx - eps_x, UBu, UBu - eps_u])
    LB = np.tile(LBst, N)
    UB = np.tile(UBst, N)

    return dict(
        n=n, m=m, N=N, nz=nz, rho_is_scalar=rho_is_scalar,
        A=A, B=B, T=T, S=S,
        rho_vec=rho_vec, rho_inv_vec=1.0 / rho_vec,
        rho_scalar=float(rho) if rho.ndim == 0 else None,
        M_q=M_q, M_b=M_b, LB=LB, UB=UB,
    )


def mpct_cs_banded_ingredients(sys: dict, param: dict, opt: Options) -> dict:
    """O(N)-memory structured ingredients for MPCT ADMM-cs — the
    long-horizon path (the role the reference's CSR/LDL sparsity plays,
    compute_MPCT_ADMM_cs_ingredients.m:124-141, done the TPU way: stacked
    stage blocks + a block-tridiagonal Cholesky, never forming dense
    H/G/W/M_q).

    The multiplier rows partition into Nb = N+1 blocks of non-uniform
    size — 2n (init + steady-state on stage 0), 2n+m per transition,
    n (terminal x_s coupling) — padded to bmax = 2n+m with identity
    diagonal pads (zero rhs pads keep the padded mu entries exactly 0).
    Memory: O(N (2(n+m))^2) vs the dense path's O((N 2(n+m))^2) M_q.
    """
    A, B, n, m = get_sys_matrices(sys)
    N = int(param["N"])
    Q = np.asarray(param["Q"], dtype=float)
    R = np.asarray(param["R"], dtype=float)
    T = np.asarray(param["T"], dtype=float)
    S = np.asarray(param["S"], dtype=float)
    sd = 2 * (n + m)
    nz = N * sd
    bmax = 2 * n + m

    rho = np.asarray(opt.solver["rho"], dtype=float)
    force_vec = bool(opt.solver.get("force_vector_rho", False))
    rho_is_scalar = rho.ndim == 0 and not force_vec
    rho_vec = np.full(nz, float(rho)) if rho.ndim == 0 else rho.ravel().copy()
    if rho_vec.size != nz:
        raise ValueError(f"rho vector must have length {nz}")

    # per-stage Hessian blocks + inverses [N, sd, sd]
    Qz = np.block([[Q, -Q], [-Q, Q + T / N]])
    Rz = np.block([[R, -R], [-R, R + S / N]])
    Hs = linalg.blkdiag(Qz, Rz)
    Hinv_st = np.empty((N, sd, sd))
    for j in range(N):
        Hinv_st[j] = np.linalg.inv(Hs + np.diag(rho_vec[j * sd:(j + 1) * sd]))

    # stage coefficient matrices of the equality rows
    # (mpct_cs_equality_matrix layout: z_j = (x_j, x_s, u_j, u_s))
    E0 = np.zeros((2 * n, sd))               # stage 0: init + steady state
    E0[:n, :n] = np.eye(n)
    E0[n:, n:2 * n] = A - np.eye(n)
    E0[n:, 2 * n + m:] = B
    C = np.zeros((bmax, sd))                 # transition rows on stage j-1
    C[:n, :n] = A
    C[:n, 2 * n:2 * n + m] = B
    C[n:2 * n, n:2 * n] = np.eye(n)
    C[2 * n:, 2 * n + m:] = np.eye(m)
    D = np.zeros((bmax, sd))                 # transition rows on stage j
    D[:n, :n] = -np.eye(n)
    D[n:2 * n, n:2 * n] = -np.eye(n)
    D[2 * n:, 2 * n + m:] = -np.eye(m)
    F = np.zeros((n, sd))                    # terminal rows on stage N-1
    F[:, :n] = A
    F[:, n:2 * n] = -np.eye(n)
    F[:, 2 * n:2 * n + m] = B

    # padded block-tridiagonal W blocks (identity on pad diagonals)
    Nb = N + 1
    Wd = np.zeros((Nb, bmax, bmax))
    Wu = np.zeros((Nb - 1, bmax, bmax))
    Wd[0, :2 * n, :2 * n] = E0 @ Hinv_st[0] @ E0.T
    Wd[0, 2 * n:, 2 * n:] = np.eye(m)
    Wu[0, :2 * n, :] = E0 @ Hinv_st[0] @ C.T
    for j in range(1, N):
        Wd[j] = C @ Hinv_st[j - 1] @ C.T + D @ Hinv_st[j] @ D.T
        if j < N - 1:
            Wu[j] = D @ Hinv_st[j] @ C.T
    Wu[N - 1, :, :n] = D @ Hinv_st[N - 1] @ F.T
    Wd[N, :n, :n] = F @ Hinv_st[N - 1] @ F.T
    Wd[N, n:, n:] = np.eye(bmax - n)
    Alpha, BetaInv = linalg.band_chol_blocks_tridiag(Wd, Wu)

    LBx, UBx, LBu, UBu = get_bounds(sys, n, m, opt.inf_value)
    eps_x = float(opt.solver["epsilon_x"])
    eps_u = float(opt.solver["epsilon_u"])
    LBst = np.concatenate([LBx, LBx + eps_x, LBu, LBu + eps_u])
    UBst = np.concatenate([UBx, UBx - eps_x, UBu, UBu - eps_u])
    LB = np.tile(LBst, N)
    UB = np.tile(UBst, N)

    return dict(
        n=n, m=m, N=N, nz=nz, sd=sd, bmax=bmax,
        rho_is_scalar=rho_is_scalar,
        A=A, B=B, T=T, S=S,
        rho_vec=rho_vec, rho_inv_vec=1.0 / rho_vec,
        rho_scalar=float(rho) if rho.ndim == 0 else None,
        Hinv_st=Hinv_st, E0=E0, Cst=C, Dst=D, Fst=F,
        Alpha=Alpha, BetaInv=BetaInv, LB=LB, UB=UB,
    )


def _make_cs_banded_z_step(ing, dtype, parallel_scan=False):
    """z_step(q_hat, x0 | None) for the structured MPCT-cs backend:
    z = -Hinv(q_hat + G'mu), W mu = -G Hinv q_hat - beq, all ops
    stage-local, the band solve through the Alpha/BetaInv scan.
    parallel_scan routes it through the O(log N)-depth associative-scan
    variant (kernels.band_chol.band_chol_solve_scan) for long horizons."""
    from spcies_tpu.kernels.band_chol import (band_chol_solve,
                                              band_chol_solve_scan)
    band_solve = band_chol_solve_scan if parallel_scan else band_chol_solve
    n, m, N = ing["n"], ing["m"], ing["N"]
    sd, bmax = ing["sd"], ing["bmax"]
    Hinv_st = jnp.asarray(ing["Hinv_st"], dtype)
    E0 = jnp.asarray(ing["E0"], dtype)
    C = jnp.asarray(ing["Cst"], dtype)
    D = jnp.asarray(ing["Dst"], dtype)
    F = jnp.asarray(ing["Fst"], dtype)
    Alpha = jnp.asarray(ing["Alpha"], dtype)
    BetaInv = jnp.asarray(ing["BetaInv"], dtype)

    def hinv_apply(q):
        return jnp.einsum("bls,lts->blt", q, Hinv_st)

    def g_apply(h):
        """G h -> padded [B, Nb, bmax] row blocks."""
        Bsz = h.shape[0]
        blk0 = jnp.pad(h[:, 0] @ E0.T, ((0, 0), (0, bmax - 2 * n)))
        mid = (jnp.einsum("bls,rs->blr", h[:, :N - 1], C)
               + jnp.einsum("bls,rs->blr", h[:, 1:], D))
        blkN = jnp.pad(h[:, N - 1] @ F.T, ((0, 0), (0, bmax - n)))
        return jnp.concatenate(
            [blk0[:, None], mid, blkN[:, None]], axis=1)

    def gt_apply(mu):
        """G' mu -> [B, N, sd] stage contributions."""
        out = jnp.einsum("blr,rs->bls", mu[:, 1:N], C)        # stage j-1
        out = jnp.zeros(out.shape[:1] + (N, sd), dtype).at[:, :N - 1].set(
            out)
        out = out.at[:, 1:N].add(jnp.einsum("blr,rs->bls", mu[:, 1:N], D))
        out = out.at[:, 0].add(mu[:, 0, :2 * n] @ E0)
        out = out.at[:, N - 1].add(mu[:, N, :n] @ F)
        return out

    def z_step(q_hat, x0=None):
        Bsz = q_hat.shape[0]
        q = q_hat.reshape(Bsz, N, sd)
        h = hinv_apply(q)
        rhs = -g_apply(h)
        if x0 is not None:
            # beq nonzero only in the x_0 = x(t) rows (rhs -= beq)
            rhs = rhs.at[:, 0, :n].add(-x0)
        mu = band_solve(rhs, Alpha, BetaInv)
        z = -(h + hinv_apply(gt_apply(mu)))
        return z.reshape(Bsz, -1)

    return z_step


@register_builder("MPCT", "ADMM", "cs")
def build_mpct_admm_cs(sys: dict, param: dict, opt: Options,
                       backend: str = "dense") -> BatchedSolver:
    """MPCT via ADMM on the extended (x_i, x_s, u_i, u_s) state space
    (code_MPCT_ADMM_cs_C.c:94-218, spcies_MPCT_ADMM_cs_solver.m).
    backend='banded' is the O(N)-memory long-horizon path (stage-local
    ops + block-tridiagonal Cholesky scan, mpct_cs_banded_ingredients)."""
    if backend not in ("dense", "fused", "banded"):
        raise ValueError(
            "MPCT/ADMM-cs has dense, banded and fused backends")
    if opt.time_varying:
        # per-lane time-varying models (VERDICT r4 next-#6): beyond the
        # reference, which has no TV mode for MPCT at all — the SURVEY §7
        # "TV for free on every solver" design note, delivered through
        # the O(N) banded path (the only feasible one at long horizons,
        # BENCH_LONGN memory-wall measurement)
        return _tv_cs_banded_solver(sys, param, opt)
    if backend == "banded":
        return _build_mpct_cs_banded(sys, param, opt)
    ing = mpct_admm_cs_ingredients(sys, param, opt)
    dtype = jnp.float64 if opt.precision == "double" else jnp.float32
    n, m, N, nz = ing["n"], ing["m"], ing["N"], ing["nz"]
    tol = float(opt.solver["tol"])
    k_max = int(opt.solver["k_max"])

    rho = (dtype(ing["rho_scalar"]) if ing["rho_is_scalar"]
           else jnp.asarray(ing["rho_vec"], dtype))
    rho_i = (dtype(1.0 / ing["rho_scalar"]) if ing["rho_is_scalar"]
             else jnp.asarray(ing["rho_inv_vec"], dtype))
    LB = jnp.asarray(ing["LB"], dtype)
    UB = jnp.asarray(ing["UB"], dtype)
    M_q = jnp.asarray(ing["M_q"], dtype)
    M_b = jnp.asarray(ing["M_b"], dtype)
    T = jnp.asarray(ing["T"], dtype)
    S = jnp.asarray(ing["S"], dtype)

    def make_z_step(x0):
        if x0 is None:
            return lambda dq: delta_dot(dq, M_q.T)
        return lambda q_hat: q_hat @ M_q.T + x0 @ M_b.T

    def _cs_q_ref(x0, xr, ur):
        qstage = jnp.concatenate(
            [jnp.zeros_like(x0), -(xr @ T.T) / N,
             jnp.zeros_like(ur), -(ur @ S.T) / N], axis=-1)
        return jnp.tile(qstage, (1, N))

    if backend == "fused":
        from spcies_tpu.solvers.fused_backend import (
            build_fused_box_admm_solve)
        _solve_f = build_fused_box_admm_solve(
            ing, opt, dtype, make_q_ref=_cs_q_ref,
            make_aux_b=lambda x0, xr, ur: x0 @ M_b.T,
            u_start=2 * n, lb_key="LB", ub_key="UB")
        return BatchedSolver(_solve_f, ing, opt, n=n, m=m, N=N, nz=nz,
                             dtype=dtype)

    def proj(y):
        return proj_box(y, LB, UB)

    def _solve(x0, xr, ur, init, fixed_iters):
        # per-stage linear cost [0; -(T/N) xr; 0; -(S/N) ur]
        # (spcies_MPCT_ADMM_cs_solver.m:172 with vars.Tz = -T/N)
        q_ref = _cs_q_ref(x0, xr, ur)
        z, v, lam, k, e_flag, r_p, r_d, hist = admm_solve(
            make_z_step(x0), proj, q_ref, rho, rho_i, tol, tol, k_max,
            batch=x0.shape[0], nz=nz, dtype=dtype, init=init,
            fixed_iters=fixed_iters,
            relax_alpha=float(opt.solver.get("relax_alpha", 1.0)),
            freeze_converged=bool(opt.solver.get("freeze_converged", True)),
            straggler_polish=int(opt.solver.get("straggler_polish", 0)),
            z_lin=make_z_step(None),
            history=opt.debug)
        u = v[:, 2 * n:2 * n + m]
        return SolveResult(u=u, k=k, e_flag=e_flag,
                           sol=dict(z=z, v=v, lam=lam, r_p=r_p, r_d=r_d,
                                    **hist_sol_entries(hist)))

    return BatchedSolver(_solve, ing, opt, n=n, m=m, N=N, nz=nz, dtype=dtype)


def _build_mpct_cs_banded(sys: dict, param: dict,
                          opt: Options) -> BatchedSolver:
    ing = mpct_cs_banded_ingredients(sys, param, opt)
    dtype = jnp.float64 if opt.precision == "double" else jnp.float32
    n, m, N, nz = ing["n"], ing["m"], ing["N"], ing["nz"]
    tol = float(opt.solver["tol"])
    k_max = int(opt.solver["k_max"])
    rho = (dtype(ing["rho_scalar"]) if ing["rho_is_scalar"]
           else jnp.asarray(ing["rho_vec"], dtype))
    rho_i = (dtype(1.0 / ing["rho_scalar"]) if ing["rho_is_scalar"]
             else jnp.asarray(ing["rho_inv_vec"], dtype))
    LB = jnp.asarray(ing["LB"], dtype)
    UB = jnp.asarray(ing["UB"], dtype)
    T = jnp.asarray(ing["T"], dtype)
    S = jnp.asarray(ing["S"], dtype)
    z_step = _make_cs_banded_z_step(
        ing, dtype,
        parallel_scan=bool(opt.solver.get("band_parallel_scan", False)))

    def _solve(x0, xr, ur, init, fixed_iters):
        qstage = jnp.concatenate(
            [jnp.zeros_like(x0), -(xr @ T.T) / N,
             jnp.zeros_like(ur), -(ur @ S.T) / N], axis=-1)
        q_ref = jnp.tile(qstage, (1, N))
        z, v, lam, k, e_flag, r_p, r_d, hist = admm_solve(
            lambda q_hat: z_step(q_hat, x0),
            lambda y: proj_box(y, LB, UB), q_ref, rho, rho_i, tol, tol,
            k_max, batch=x0.shape[0], nz=nz, dtype=dtype, init=init,
            fixed_iters=fixed_iters,
            relax_alpha=float(opt.solver.get("relax_alpha", 1.0)),
            freeze_converged=bool(opt.solver.get("freeze_converged", True)),
            straggler_polish=int(opt.solver.get("straggler_polish", 0)),
            z_lin=lambda dq: z_step(dq, None),
            history=opt.debug)
        return SolveResult(u=v[:, 2 * n:2 * n + m], k=k, e_flag=e_flag,
                           sol=dict(z=z, v=v, lam=lam, r_p=r_p, r_d=r_d,
                                    **hist_sol_entries(hist)))

    return BatchedSolver(_solve, ing, opt, n=n, m=m, N=N, nz=nz,
                         dtype=dtype)


def _tv_cs_banded_solver(sys: dict, param: dict,
                         opt: Options) -> BatchedSolver:
    """Per-lane time-varying MPCT-ADMM-cs through the O(N) banded path.

    9-input signature matching the laxMPC/equMPC TV convention
    (x0, xr, ur, A, B, Qdiag, Rdiag, LB, UB): every lane carries its OWN
    model and single-stage bounds [LBx; LBu]. T and S stay offline
    constants (the laxMPC TV mode's T treatment,
    compute_laxMPC_ADMM_ingredients.m:109-118); scalar rho only. All
    per-lane ingredients — the stage Hessian inverse, the E0/C/D/F
    equality stage maps, and the block-tridiagonal W factors — are
    rebuilt inside the jitted solve (kernels.online_band_chol.
    online_band_chol_tridiag), so memory stays O(B N (2n+m)^2): the
    regime where any dense per-lane W is infeasible (BENCH_LONGN
    memory-wall cells). No reference counterpart: the reference has no
    TIME_VARYING mode for MPCT (cons_laxMPC_ADMM_C.m:47-52 scope).
    """
    from spcies_tpu.kernels.band_chol import (band_chol_solve,
                                              band_chol_solve_scan)
    from spcies_tpu.kernels.online_band_chol import online_band_chol_tridiag

    A0, B0, n, m = get_sys_matrices(sys)
    N = int(param["N"])
    T = np.asarray(param["T"], dtype=float)
    S = np.asarray(param["S"], dtype=float)
    sd = 2 * (n + m)
    bmax = 2 * n + m
    nz = N * sd
    Nb = N + 1
    dtype = jnp.float64 if opt.precision == "double" else jnp.float32
    tol = float(opt.solver["tol"])
    k_max = int(opt.solver["k_max"])
    rho_f = opt.solver["rho"]
    if np.ndim(rho_f) != 0:
        raise ValueError("time-varying mode requires scalar rho "
                         "(cons_laxMPC_ADMM_C.m:47-52 convention)")
    rho = dtype(float(rho_f))
    rho_i = dtype(1.0 / float(rho_f))
    eps_x = float(opt.solver["epsilon_x"])
    eps_u = float(opt.solver["epsilon_u"])
    Tj = jnp.asarray(T, dtype)
    Sj = jnp.asarray(S, dtype)
    TN = jnp.asarray(T / N, dtype)
    SN = jnp.asarray(S / N, dtype)
    band_solve = (band_chol_solve_scan
                  if bool(opt.solver.get("band_parallel_scan", False))
                  else band_chol_solve)

    def _solve(x0, xr, ur, A, B, Qd, Rd, LB1, UB1, init, fixed_iters):
        Bsz = x0.shape[0]
        # per-lane stage Hessian Hhat = blkdiag(Qz, Rz) + rho I and its
        # inverse (one sd x sd per lane; every stage shares it)
        dQ = jax.vmap(jnp.diag)(Qd)               # [B, n, n]
        dR = jax.vmap(jnp.diag)(Rd)
        Qz = jnp.concatenate(
            [jnp.concatenate([dQ, -dQ], axis=-1),
             jnp.concatenate([-dQ, dQ + TN], axis=-1)], axis=-2)
        Rz = jnp.concatenate(
            [jnp.concatenate([dR, -dR], axis=-1),
             jnp.concatenate([-dR, dR + SN], axis=-1)], axis=-2)
        Hs = jnp.zeros((Bsz, sd, sd), x0.dtype)
        Hs = Hs.at[:, :2 * n, :2 * n].set(Qz)
        Hs = Hs.at[:, 2 * n:, 2 * n:].set(Rz)
        Hinv = jnp.linalg.inv(Hs + rho * jnp.eye(sd, dtype=x0.dtype))

        # per-lane equality stage maps (mpct_cs_banded_ingredients layout)
        eyen = jnp.eye(n, dtype=x0.dtype)
        eyem = jnp.eye(m, dtype=x0.dtype)
        E0 = jnp.zeros((Bsz, 2 * n, sd), x0.dtype)
        E0 = E0.at[:, :n, :n].set(eyen)
        E0 = E0.at[:, n:, n:2 * n].set(A - eyen)
        E0 = E0.at[:, n:, 2 * n + m:].set(B)
        C = jnp.zeros((Bsz, bmax, sd), x0.dtype)
        C = C.at[:, :n, :n].set(A)
        C = C.at[:, :n, 2 * n:2 * n + m].set(B)
        C = C.at[:, n:2 * n, n:2 * n].set(eyen)
        C = C.at[:, 2 * n:, 2 * n + m:].set(eyem)
        D = jnp.zeros((Bsz, bmax, sd), x0.dtype)
        D = D.at[:, :n, :n].set(-eyen)
        D = D.at[:, n:2 * n, n:2 * n].set(-eyen)
        D = D.at[:, 2 * n:, 2 * n + m:].set(-eyem)
        F = jnp.zeros((Bsz, n, sd), x0.dtype)
        F = F.at[:, :, :n].set(A)
        F = F.at[:, :, n:2 * n].set(-eyen)
        F = F.at[:, :, 2 * n:2 * n + m].set(B)

        def HI(M):          # M [B, r, sd] -> M Hinv [B, r, sd]
            return jnp.einsum("brs,bst->brt", M, Hinv)

        E0H, CH, DH, FH = HI(E0), HI(C), HI(D), HI(F)

        def outer(X, Yt):   # X [B,r,sd] (pre-multiplied by Hinv), Y [B,q,sd]
            return jnp.einsum("brs,bqs->brq", X, Yt)

        # block-tridiagonal W blocks, identity on pad diagonals
        Wd = jnp.zeros((Bsz, Nb, bmax, bmax), x0.dtype)
        Wd = Wd.at[:, 0, :2 * n, :2 * n].set(outer(E0H, E0))
        Wd = Wd.at[:, 0, 2 * n:, 2 * n:].set(eyem)
        Wmid = outer(CH, C) + outer(DH, D)
        Wd = Wd.at[:, 1:N].set(
            jnp.broadcast_to(Wmid[:, None], (Bsz, N - 1, bmax, bmax)))
        Wd = Wd.at[:, N, :n, :n].set(outer(FH, F))
        Wd = Wd.at[:, N, n:, n:].set(jnp.eye(bmax - n, dtype=x0.dtype))
        Wu = jnp.zeros((Bsz, Nb - 1, bmax, bmax), x0.dtype)
        Wu = Wu.at[:, 0, :2 * n, :].set(outer(E0H, C))
        Wu = Wu.at[:, 1:N - 1].set(
            jnp.broadcast_to(outer(DH, C)[:, None],
                             (Bsz, N - 2, bmax, bmax)))
        Wu = Wu.at[:, N - 1, :, :n].set(outer(DH, F))
        Alpha, BetaInv = online_band_chol_tridiag(Wd, Wu)

        def hinv_apply(q):                      # q [B, N, sd]
            return jnp.einsum("bls,bts->blt", q, Hinv)

        def g_apply(h):
            blk0 = jnp.pad(jnp.einsum("bs,brs->br", h[:, 0], E0),
                           ((0, 0), (0, bmax - 2 * n)))
            mid = (jnp.einsum("bls,brs->blr", h[:, :N - 1], C)
                   + jnp.einsum("bls,brs->blr", h[:, 1:], D))
            blkN = jnp.pad(jnp.einsum("bs,brs->br", h[:, N - 1], F),
                           ((0, 0), (0, bmax - n)))
            return jnp.concatenate([blk0[:, None], mid, blkN[:, None]],
                                   axis=1)

        def gt_apply(mu):
            out = jnp.einsum("blr,brs->bls", mu[:, 1:N], C)
            out = jnp.zeros((Bsz, N, sd), x0.dtype).at[:, :N - 1].set(out)
            out = out.at[:, 1:N].add(
                jnp.einsum("blr,brs->bls", mu[:, 1:N], D))
            out = out.at[:, 0].add(
                jnp.einsum("br,brs->bs", mu[:, 0, :2 * n], E0))
            out = out.at[:, N - 1].add(
                jnp.einsum("br,brs->bs", mu[:, N, :n], F))
            return out

        def z_step(q_hat, with_b0):
            q = q_hat.reshape(Bsz, N, sd)
            h = hinv_apply(q)
            rhs = -g_apply(h)
            if with_b0:
                rhs = rhs.at[:, 0, :n].add(-x0)
            mu = band_solve(rhs, Alpha, BetaInv)
            z = -(h + hinv_apply(gt_apply(mu)))
            return z.reshape(Bsz, -1)

        # eps-tightened per-lane stage bounds (mpct_admm_cs_ingredients)
        LBx, LBu = LB1[:, :n], LB1[:, n:]
        UBx, UBu = UB1[:, :n], UB1[:, n:]
        LBst = jnp.concatenate([LBx, LBx + eps_x, LBu, LBu + eps_u],
                               axis=-1)
        UBst = jnp.concatenate([UBx, UBx - eps_x, UBu, UBu - eps_u],
                               axis=-1)
        LB = jnp.tile(LBst, (1, N))
        UB = jnp.tile(UBst, (1, N))

        qstage = jnp.concatenate(
            [jnp.zeros_like(x0), -(xr @ Tj.T) / N,
             jnp.zeros_like(ur), -(ur @ Sj.T) / N], axis=-1)
        q_ref = jnp.tile(qstage, (1, N))

        z, v, lam, k, e_flag, r_p, r_d, hist = admm_solve(
            lambda qh: z_step(qh, True),
            lambda y: proj_box(y, LB, UB), q_ref, rho, rho_i, tol, tol,
            k_max, batch=Bsz, nz=nz, dtype=dtype, init=init,
            fixed_iters=fixed_iters,
            relax_alpha=float(opt.solver.get("relax_alpha", 1.0)),
            freeze_converged=bool(opt.solver.get("freeze_converged", True)),
            straggler_polish=int(opt.solver.get("straggler_polish", 0)),
            z_lin=lambda dq: z_step(dq, False),
            history=opt.debug)
        return SolveResult(u=v[:, 2 * n:2 * n + m], k=k, e_flag=e_flag,
                           sol=dict(z=z, v=v, lam=lam, r_p=r_p, r_d=r_d,
                                    **hist_sol_entries(hist)))

    return BatchedSolver(
        _solve, dict(n=n, m=m, N=N, nz=nz), opt, n=n, m=m, N=N, nz=nz,
        dtype=dtype,
        input_names=("x0", "xr", "ur", "A", "B", "Q", "R", "LB", "UB"),
        input_core_ndims=(1, 1, 1, 2, 2, 1, 1, 1, 1))


# ---------------------------------------------------------------------------
# ADMM-semiband
# ---------------------------------------------------------------------------

def _soft_box_prox(y, lb, ub, br):
    """Prox of the soft-constraint penalty beta*dist_box(v) at y — the
    reference's five-case scalar branch
    (spcies_MPCT_ADMM_semiband_solver.m:407-430), branch-free. br = beta/rho
    (scalar or per-entry)."""
    v1 = y + br
    v3 = y - br
    inside = (y >= lb) & (y <= ub)
    return jnp.where(v1 <= lb, v1,
                     jnp.where(inside, y,
                               jnp.where(v3 >= ub, v3,
                                         jnp.clip(y, lb, ub))))


def mpct_semiband_equality_matrix(A: np.ndarray, B: np.ndarray, N: int):
    """G over z = (x_0,u_0,...,x_{N-1},u_{N-1},x_s,u_s)
    (compute_MPCT_ADMM_semiband_ingredients.m:136-151): x_0 = x(t), the N
    dynamics rows (the last one maps into x_s), and the equilibrium row."""
    n, m = A.shape[0], B.shape[1]
    nm = n + m
    nz = (N + 1) * nm
    G = np.zeros(((N + 2) * n, nz))
    G[:n, :n] = np.eye(n)
    for k in range(N):
        r = (k + 1) * n
        c = k * nm
        G[r:r + n, c:c + n] = A
        G[r:r + n, c + n:c + nm] = B
        G[r:r + n, c + nm:c + nm + n] = -np.eye(n)
    G[-n:, -nm:-m] = A - np.eye(n)
    G[-n:, -m:] = B
    return G


def mpct_admm_semiband_ingredients(sys: dict, param: dict,
                                   opt: Options,
                                   structured: bool = False) -> dict:
    """Offline ingredients (compute_MPCT_ADMM_semiband_ingredients.m).

    TPU-native, two arms:
      structured=False — the reference's two-level Woodbury (banded
        Gamma_hat + rank-2(n+m) correction, ECC'24) exists to avoid dense
        factorization on embedded CPUs; here the same KKT solve collapses
        into the dense affine map z = M_q p + M_b x0 — algebraically
        identical, one MXU matmul online. O(N^2) memory; right for the
        contracted N~10-30.
      structured=True — the long-horizon path keeping the reference's
        O(N) memory (compute_MPCT_ADMM_semiband_ingredients.m:163-227):
        per-stage Hhat block inverses, the level-1 Woodbury factors of the
        rank-2(n+m) stage<->terminal cost coupling (Gu/Gv/K1), the
        block-tridiagonal Cholesky of Gamma_tilde = G Gamma_hat^-1 G'
        (Alpha/BetaInv), and the level-2 correction (Pu/Vt/K2). Every
        stored array is O(N (n+m)^2).
    """
    A, B, n, m = get_sys_matrices(sys)
    N = int(param["N"])
    Q = np.asarray(param["Q"], dtype=float)
    R = np.asarray(param["R"], dtype=float)
    T = np.asarray(param["T"], dtype=float)
    S = np.asarray(param["S"], dtype=float)
    nm = n + m
    nz = (N + 1) * nm
    constrained_output = bool(opt.solver["constrained_output"])
    soft = bool(opt.solver["soft_constraints"])
    eps_x = float(opt.solver["epsilon_x"])
    eps_u = float(opt.solver["epsilon_u"])
    eps_y = float(opt.solver["epsilon_y"])
    beta = float(opt.solver["beta"])

    if constrained_output:
        if "C" not in sys or "LBy" not in sys or "UBy" not in sys:
            raise ValueError(
                "MPCT/ADMM-semiband constrained_output=True requires sys "
                "fields C (output map), LBy, UBy (and optionally D) — "
                "cons_MPCT_ADMM_semiband_C.m constrained-output contract")
        C = np.asarray(sys["C"], dtype=float)
        D = np.asarray(sys.get("D", np.zeros((C.shape[0], m))), dtype=float)
        p = C.shape[0]
        stage_map = np.vstack([np.hstack([np.eye(n), np.zeros((n, m))]),
                               np.hstack([np.zeros((m, n)), np.eye(m)]),
                               np.hstack([C, D])])
        C_tilde = linalg.blkdiag(*([stage_map] * (N + 1)))
    else:
        p = 0
        C_tilde = None
    sv = nm + p            # per-stage v dimension
    nv = (N + 1) * sv

    rho = np.asarray(opt.solver["rho"], dtype=float)
    force_vec = bool(opt.solver.get("force_vector_rho", False))
    rho_is_scalar = rho.ndim == 0 and not force_vec
    rho_vec = np.full(nv, float(rho)) if rho.ndim == 0 else rho.ravel().copy()
    if rho_vec.size != nv:
        raise ValueError(f"rho vector must have length {nv}")

    # Hessian: banded stage costs + rank-(n+m) coupling to (x_s, u_s)
    # (:119-133)
    QR = linalg.blkdiag(Q, R)
    H = linalg.blkdiag(*([QR] * N), linalg.blkdiag(N * Q + T, N * R + S))
    H[:N * nm, -nm:] = np.tile(-QR, (N, 1))
    H[-nm:, :N * nm] = np.tile(-QR, (1, N))

    structured_keys = {}
    if structured:
        # --- O(N)-memory arm -------------------------------------------
        # Hhat = Gamma_hat + U V' with Gamma_hat = blkdiag of the per-stage
        # blocks below and the rank-2(n+m) stage<->terminal coupling
        # Y = 1_N (x) (-QR) (compute_MPCT_ADMM_semiband_ingredients.m:
        # 118-132). U = [1_N(x)I, 0; 0, I], V = [0, 1_N(x)(-QR); -QR, 0].
        Nb = N + 2
        rho_st = rho_vec.reshape(N + 1, sv)
        QT = linalg.blkdiag(N * Q + T, N * R + S)
        blocks = np.empty((N + 1, nm, nm))
        for i in range(N + 1):
            Hst = QR if i < N else QT
            if constrained_output:
                blocks[i] = Hst + stage_map.T @ (rho_st[i][:, None]
                                                 * stage_map)
            else:
                blocks[i] = Hst + np.diag(rho_st[i])
        blocks_inv = np.linalg.inv(blocks)
        # level-1 Woodbury: Hhat^-1 = Gamma^-1 - Gu K1 Gv' with
        # Gu = Gamma^-1 U, Gv = Gamma^-1 V, K1 = (I + V' Gu)^-1
        Gu = np.zeros((nz, 2 * nm))
        Gv = np.zeros((nz, 2 * nm))
        for i in range(N):
            Gu[i * nm:(i + 1) * nm, :nm] = blocks_inv[i]
            Gv[i * nm:(i + 1) * nm, nm:] = -blocks_inv[i] @ QR
        Gu[N * nm:, nm:] = blocks_inv[N]
        Gv[N * nm:, :nm] = -blocks_inv[N] @ QR
        VtGu = np.zeros((2 * nm, 2 * nm))
        VtGu[:nm] = -QR @ Gu[N * nm:]
        VtGu[nm:] = -QR @ Gu[:N * nm].reshape(N, nm, 2 * nm).sum(axis=0)
        K1 = np.linalg.inv(np.eye(2 * nm) + VtGu)
        # Gamma_tilde = G Gamma^-1 G' is block tridiagonal in n x n blocks
        # (row blocks: x_0 pin, N dynamics rows, equilibrium row)
        E = np.hstack([np.eye(n), np.zeros((n, m))])
        Cst = np.hstack([A, B])
        Dst = np.hstack([-np.eye(n), np.zeros((n, m))])
        Eq = np.hstack([A - np.eye(n), B])
        Wd = np.zeros((Nb, n, n))
        Wu = np.zeros((Nb - 1, n, n))
        Wd[0] = blocks_inv[0][:n, :n]
        Wu[0] = (E @ blocks_inv[0]) @ Cst.T
        for k in range(1, N + 1):
            Wd[k] = (Cst @ blocks_inv[k - 1] @ Cst.T
                     + Dst @ blocks_inv[k] @ Dst.T)
            if k < N:
                Wu[k] = Dst @ blocks_inv[k] @ Cst.T
        Wu[N] = Dst @ blocks_inv[N] @ Eq.T
        Wd[N + 1] = Eq @ blocks_inv[N] @ Eq.T
        Alpha, BetaInv = linalg.band_chol_blocks_tridiag(Wd, Wu)

        def _g_np(Z):
            """G Z columnwise (offline, structural)."""
            Zs = Z.reshape(N + 1, nm, -1)
            out = np.empty((Nb * n, Z.shape[1]))
            out[:n] = Zs[0, :n]
            for k in range(N):
                out[(k + 1) * n:(k + 2) * n] = (
                    A @ Zs[k][:n] + B @ Zs[k][n:] - Zs[k + 1][:n])
            out[-n:] = (A - np.eye(n)) @ Zs[N][:n] + B @ Zs[N][n:]
            return out

        # level-2 Woodbury: W = Gamma_tilde - Ut K1 Vt' with Ut = G Gu,
        # Vt = G Gv; W^-1 r = Gt^-1 r + Pu K2 Vt' Gt^-1 r,
        # Pu = Gt^-1 Ut, K2 = (K1^-1 - Vt' Pu)^-1. The dense Gamma_tilde
        # below is an offline-only temporary.
        Ut = _g_np(Gu)
        Vt = _g_np(Gv)
        Gt = np.zeros((Nb * n, Nb * n))
        for k in range(Nb):
            Gt[k * n:(k + 1) * n, k * n:(k + 1) * n] = Wd[k]
            if k < Nb - 1:
                Gt[k * n:(k + 1) * n, (k + 1) * n:(k + 2) * n] = Wu[k]
                Gt[(k + 1) * n:(k + 2) * n, k * n:(k + 1) * n] = Wu[k].T
        Pu = np.linalg.solve(Gt, Ut)
        K2 = np.linalg.inv(np.eye(2 * nm) + VtGu - Vt.T @ Pu)
        M_q = M_b = None
        structured_keys = dict(
            blocks_inv=blocks_inv, Gu=Gu, Gv=Gv, K1=K1,
            Alpha=Alpha, BetaInv=BetaInv, Pu=Pu, Vt=Vt, K2=K2, B=B,
            stage_map=stage_map if constrained_output else None)
    else:
        if constrained_output:
            Hhat = H + C_tilde.T @ (rho_vec[:, None] * C_tilde)
        else:
            Hhat = H + np.diag(rho_vec)
        Hinv = np.linalg.inv(Hhat)
        G = mpct_semiband_equality_matrix(A, B, N)
        W = G @ Hinv @ G.T
        GH = G @ Hinv
        Winv = np.linalg.inv(W)
        M_q = GH.T @ (Winv @ GH) - Hinv
        M_b = GH.T @ Winv[:, :n]

    # per-entry bound vectors + soft mask over v (:358-520 branch layout)
    LBx, UBx, LBu, UBu = get_bounds(sys, n, m, opt.inf_value)
    if constrained_output:
        LBy = np.asarray(sys.get("LBy", -opt.inf_value * np.ones(p)),
                         float).ravel()
        UBy = np.asarray(sys.get("UBy", opt.inf_value * np.ones(p)),
                         float).ravel()
        stage_lb = np.concatenate([LBx, LBu, LBy])
        stage_ub = np.concatenate([UBx, UBu, UBy])
        eps_stage = np.concatenate([np.full(n, eps_x), np.full(m, eps_u),
                                    np.full(p, eps_y)])
    else:
        stage_lb = np.concatenate([LBx, LBu])
        stage_ub = np.concatenate([UBx, UBu])
        eps_stage = np.concatenate([np.full(n, eps_x), np.full(m, eps_u)])

    inf_v = opt.inf_value
    lb0 = stage_lb.copy()
    ub0 = stage_ub.copy()
    lb0[:n] = -inf_v          # x_0 unconstrained
    ub0[:n] = inf_v
    if soft:                   # terminal untightened in soft mode
        lbT, ubT = stage_lb, stage_ub
    else:
        lbT = stage_lb + eps_stage
        ubT = stage_ub - eps_stage
    LBv = np.concatenate([lb0] + [stage_lb] * (N - 1) + [lbT])
    UBv = np.concatenate([ub0] + [stage_ub] * (N - 1) + [ubT])
    # soft mask: x_0 and u_0 never soft; y_0 and stages 1..N soft
    soft_mask = np.ones(nv, dtype=bool)
    soft_mask[:nm] = False

    return dict(
        n=n, m=m, N=N, p=p, nz=nz, nv=nv,
        rho_is_scalar=rho_is_scalar, rho_vec=rho_vec,
        rho_scalar=float(rho) if rho.ndim == 0 else None,
        A=A, T=T, S=S, M_q=M_q, M_b=M_b, C_tilde=C_tilde,
        LBv=LBv, UBv=UBv, soft_mask=soft_mask,
        beta=beta, soft=soft, constrained_output=constrained_output,
        **structured_keys,
    )


def _make_semiband_structured_z_step(ing, dtype, parallel_scan=False):
    """z_step(p, x0 | None) for the O(N)-memory semiband backend — the
    TPU rendering of the reference's Alg. 2 two-level Woodbury
    (code_MPCT_ADMM_semiband_C.c:119-496): block-diagonal Gamma_hat
    solves + rank-2(n+m) level-1 correction, block-tridiagonal Cholesky
    scan on Gamma_tilde + level-2 correction. All online ops are
    stage-local batched small matmuls; nothing O(N^2) is materialized.
    parallel_scan selects the O(log N)-depth associative-scan band solve."""
    from spcies_tpu.kernels.band_chol import (band_chol_solve,
                                              band_chol_solve_scan)
    band_solve = band_chol_solve_scan if parallel_scan else band_chol_solve
    n, m, N = ing["n"], ing["m"], ing["N"]
    nm = n + m
    Nb = N + 2
    Bi = jnp.asarray(ing["blocks_inv"], dtype)
    Gu = jnp.asarray(ing["Gu"], dtype)
    Gv = jnp.asarray(ing["Gv"], dtype)
    K1 = jnp.asarray(ing["K1"], dtype)
    Alpha = jnp.asarray(ing["Alpha"], dtype)
    BetaInv = jnp.asarray(ing["BetaInv"], dtype)
    Pu = jnp.asarray(ing["Pu"], dtype)
    Vt = jnp.asarray(ing["Vt"], dtype)
    K2 = jnp.asarray(ing["K2"], dtype)
    A_ = jnp.asarray(ing["A"], dtype)
    B_ = jnp.asarray(ing["B"], dtype)
    AmI = A_ - jnp.eye(n, dtype=dtype)

    def hinv(x):
        """Hhat^-1 x = Gamma^-1 x - Gu K1 (Gv' x) (level-1 Woodbury)."""
        xs = x.reshape(-1, N + 1, nm)
        gx = jnp.einsum("bls,lts->blt", xs, Bi).reshape(x.shape)
        return gx - ((x @ Gv) @ K1.T) @ Gu.T

    def g_apply(h):
        """G h -> [B, Nb, n] row blocks (x_0 pin, dynamics, equilibrium)."""
        hs = h.reshape(-1, N + 1, nm)
        hx, hu = hs[..., :n], hs[..., n:]
        r0 = hx[:, 0]
        rdyn = (jnp.einsum("blj,ij->bli", hx[:, :N], A_)
                + jnp.einsum("blj,ij->bli", hu[:, :N], B_)
                - hx[:, 1:])
        rlast = hx[:, N] @ AmI.T + hu[:, N] @ B_.T
        return jnp.concatenate([r0[:, None], rdyn, rlast[:, None]], axis=1)

    def gt_apply(mu):
        """G' mu -> flat [B, nz] stage contributions."""
        gx = jnp.einsum("blj,ji->bli", mu[:, 1:N + 1], A_)
        gu = jnp.einsum("blj,ji->bli", mu[:, 1:N + 1], B_)
        gx = gx.at[:, 0].add(mu[:, 0])
        gx = gx.at[:, 1:].add(-mu[:, 1:N])
        tx = -mu[:, N] + mu[:, N + 1] @ AmI
        tu = mu[:, N + 1] @ B_
        stages = jnp.concatenate([gx, gu], axis=-1).reshape(mu.shape[0], -1)
        return jnp.concatenate([stages, tx, tu], axis=-1)

    def z_step(p, x0=None):
        h1 = hinv(p)
        rhs = -g_apply(h1)
        if x0 is not None:
            rhs = rhs.at[:, 0].add(-x0)
        wr = band_solve(rhs, Alpha, BetaInv)
        wf = wr.reshape(wr.shape[0], -1)
        muf = wf + ((wf @ Vt) @ K2.T) @ Pu.T
        mu = muf.reshape(-1, Nb, n)
        return -(h1 + hinv(gt_apply(mu)))

    return z_step


@register_builder("MPCT", "ADMM", "semiband")
def build_mpct_admm_semiband(sys: dict, param: dict, opt: Options,
                             backend: str = "dense") -> BatchedSolver:
    """MPCT via ADMM on the semiband (non-extended) parameterization
    (code_MPCT_ADMM_semiband_C.c:119-1125,
    spcies_MPCT_ADMM_semiband_solver.m), with the reference's
    soft-constraint and constrained-output options as static flags.
    backend='banded' is the O(N)-memory long-horizon path (two-level
    Woodbury as stage-local batched ops, the role the reference's
    semiband structure plays on embedded CPUs)."""
    if backend not in ("dense", "banded"):
        raise ValueError("MPCT/ADMM-semiband has dense and banded backends")
    ing = mpct_admm_semiband_ingredients(sys, param, opt,
                                         structured=(backend == "banded"))
    dtype = jnp.float64 if opt.precision == "double" else jnp.float32
    n, m, N, nz, nv = ing["n"], ing["m"], ing["N"], ing["nz"], ing["nv"]
    tol_p = float(opt.solver["tol_p"])
    tol_d = float(opt.solver["tol_d"])
    k_max = int(opt.solver["k_max"])
    soft = ing["soft"]
    con_out = ing["constrained_output"]

    if ing["rho_is_scalar"]:
        rho = dtype(ing["rho_scalar"])
        rho_i = dtype(1.0 / ing["rho_scalar"])
    else:
        rho = jnp.asarray(ing["rho_vec"], dtype)
        rho_i = jnp.asarray(1.0 / ing["rho_vec"], dtype)
    LBv = jnp.asarray(ing["LBv"], dtype)
    UBv = jnp.asarray(ing["UBv"], dtype)
    soft_mask = jnp.asarray(ing["soft_mask"])
    beta_rho_i = ing["beta"] * rho_i
    T = jnp.asarray(ing["T"], dtype)
    S = jnp.asarray(ing["S"], dtype)
    sv = ing["nv"] // (N + 1)

    if backend == "banded":
        zs_structured = _make_semiband_structured_z_step(
            ing, dtype,
            parallel_scan=bool(opt.solver.get("band_parallel_scan", False)))
        z_step_lin = lambda dp: zs_structured(dp, None)
        # stage-local C~ applies (C~ is block diagonal with one shared
        # stage map), keeping the constrained-output path O(N)
        Smap = (jnp.asarray(ing["stage_map"], dtype) if con_out else None)

        def ct_apply(z):
            if not con_out:
                return z
            zt = jnp.einsum("bls,ts->blt", z.reshape(-1, N + 1, n + m),
                            Smap)
            return zt.reshape(z.shape[0], -1)

        def ct_t_apply(y):
            if not con_out:
                return y
            ys = jnp.einsum("blt,ts->bls", y.reshape(-1, N + 1, sv), Smap)
            return ys.reshape(y.shape[0], -1)
    else:
        M_q = jnp.asarray(ing["M_q"], dtype)
        M_b = jnp.asarray(ing["M_b"], dtype)
        z_step_lin = lambda dp: delta_dot(dp, M_q.T)
        Ct = (jnp.asarray(ing["C_tilde"], dtype) if con_out else None)

        def ct_apply(z):
            return z @ Ct.T if con_out else z

        def ct_t_apply(y):
            return y @ Ct if con_out else y

    def proj(y):
        hard = proj_box(y, LBv, UBv)
        if not soft:
            return hard
        return jnp.where(soft_mask,
                         _soft_box_prox(y, LBv, UBv, beta_rho_i), hard)

    def _solve(x0, xr, ur, init, fixed_iters):
        Bsz = x0.shape[0]
        q = jnp.zeros((Bsz, nz), dtype)
        q = q.at[:, -n - m:-m].set(-(xr @ T.T))
        q = q.at[:, -m:].set(-(ur @ S.T))

        if init is None:
            z0_ = jnp.zeros((Bsz, nz), dtype)
            v0 = jnp.zeros((Bsz, nv), dtype)
            lam0 = jnp.zeros((Bsz, nv), dtype)
        else:
            z0_, v0, lam0 = init

        if backend == "banded":
            def z_step(pvec):
                return zs_structured(pvec, x0)
        else:
            def z_step(pvec):
                return pvec @ M_q.T + x0 @ M_b.T

        rinf = jnp.full((Bsz,), jnp.inf, dtype=dtype)
        p0 = q + ct_t_apply(lam0 - rho * v0)
        z1 = z_step(p0)
        state0 = dict(z=z1, z_next=z1, v=v0, lam=lam0, r_p=rinf, r_d=rinf)

        def body(state, _it):
            z = state["z_next"]
            v_prev = state["v"]
            lam = state["lam"]
            zt = ct_apply(z)
            v = proj(zt + rho_i * lam)
            lam_new = lam + rho * (zt - v)
            r_p = inf_norm(zt - v)
            r_d = inf_norm(v - v_prev)
            conv = (r_p <= tol_p) & (r_d <= tol_d)
            # delta-form: dp = C~'(dlam - rho dv) = C~'(rho(zt - 2v + v_prev))
            dp = ct_t_apply(rho * (zt - 2.0 * v + v_prev))
            z_next = z + z_step_lin(dp)
            return (dict(z=z, z_next=z_next, v=v, lam=lam_new,
                         r_p=r_p, r_d=r_d), conv)

        if opt.debug:
            state, k, e_flag, hist = run_masked_loop(
                body, state0, k_max, Bsz, fixed_iters=fixed_iters,
                history_keys=("r_p", "r_d")
                + (("z", "v", "lam")
                   if int(opt.debug) >= 2 else ()))
        else:
            state, k, e_flag = run_masked_loop(body, state0, k_max, Bsz,
                                               fixed_iters=fixed_iters)
            hist = None
        u = state["v"][:, n:n + m]
        return SolveResult(u=u, k=k, e_flag=e_flag,
                           sol=dict(z=state["z"], v=state["v"],
                                    lam=state["lam"], r_p=state["r_p"],
                                    r_d=state["r_d"],
                                    **hist_sol_entries(hist)))

    return BatchedSolver(_solve, ing, opt, n=n, m=m, N=N, nz=nz, dtype=dtype)
