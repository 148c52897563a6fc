"""Online (in-jit, batched) blocked Cholesky of the band KKT matrix W —
the time-varying mode's per-call ingredient recomputation.

The reference recomputes Alpha/Beta inside the generated C when
TIME_VARYING=1 via a scalar in-place blocked Cholesky recursion
(code_laxMPC_ADMM_C.c:150-279). Here the same recursion runs batched over
lanes as a lax.scan of small-matrix ops: per stage,

    D_0     = B Rhat^-1 B' + diag(Qhat^-1)
    D_l     = A Qhat^-1 A' + B Rhat^-1 B' + diag(Qhat^-1)
              - Alpha_{l-1}' Alpha_{l-1}
    D_{N-1} = A Qhat^-1 A' + B Rhat^-1 B' + T_rho_i - Alpha' Alpha
    U_l     = chol(D_l) (upper),  Alpha_l = U_l^-T W_{l,l+1},
    W_{l,l+1} = -Qhat^-1 A'

returning per-lane (Alpha [B, N-1, n, n], BetaInv [B, N, n, n]) in the form
kernels.band_chol.band_chol_solve consumes (batched-blocks path). The
equMPC variant drops the terminal T block (its last stage uses the plain
diagonal D form, compute_equMPC_ADMM_ingredients.m truncation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def _chol_upper_inv(D):
    """Per-lane: U = chol(D) upper, returns (U^-T, U^-1) via one lower
    Cholesky + two triangular solves against I."""
    L = jnp.linalg.cholesky(D)                     # [B, n, n] lower
    eye = jnp.eye(D.shape[-1], dtype=D.dtype)
    Linv = solve_triangular(L, jnp.broadcast_to(eye, D.shape), lower=True)
    # U = L^T  =>  U^-T = L^-1,  U^-1 = (L^-1)^T
    return Linv, jnp.swapaxes(Linv, -1, -2)


def online_band_chol_fn(N: int, terminal: bool):
    """Build the batched online factorization for a fixed horizon N.

    The returned fn(A, B, Qhat_inv, Rhat_inv, T_rho_i=None) takes per-lane
    A [Bz, n, n], B [Bz, n, m], diagonals Qhat_inv [Bz, n] /
    Rhat_inv [Bz, m] of (Q + rho I)^-1 etc., and (laxMPC, terminal=True)
    the dense (T + rho I)^-1 terminal block; equMPC (terminal=False) has no
    x_N variable, so its last diagonal block is [A B] Hhat^-1 [A B]' with
    no extra term. Returns (Alpha [Bz, N-1, n, n], BetaInv [Bz, N, n, n])
    in the batched-blocks form band_chol_solve consumes."""

    def fn(A, B, Qhat_inv, Rhat_inv, T_rho_i=None):
        Bz, n = A.shape[0], A.shape[1]
        dtype = A.dtype
        AQiAt = jnp.einsum("bik,bk,bjk->bij", A, Qhat_inv, A)
        BRiBt = jnp.einsum("bik,bk,bjk->bij", B, Rhat_inv, B)
        diagQ = jax.vmap(jnp.diag)(Qhat_inv)
        # W_{l,l+1} = -Qhat^-1 A^T
        W_off = -Qhat_inv[:, :, None] * jnp.swapaxes(A, -1, -2)

        D0 = BRiBt + diagQ
        Uinv_T0, Uinv0 = _chol_upper_inv(D0)
        Alpha0 = Uinv_T0 @ W_off

        D_mid = AQiAt + BRiBt + diagQ

        def step(alpha_prev, _):
            D = D_mid - jnp.swapaxes(alpha_prev, -1, -2) @ alpha_prev
            Uinv_T, Uinv = _chol_upper_inv(D)
            alpha = Uinv_T @ W_off
            return alpha, (alpha, Uinv)

        # stages 1 .. N-2 produce (Alpha_l, BetaInv_l)
        alpha_last, (alphas, uinvs) = jax.lax.scan(
            step, Alpha0, None, length=N - 2)
        # terminal block
        DN = AQiAt + BRiBt - jnp.swapaxes(alpha_last, -1, -2) @ alpha_last
        if terminal:
            DN = DN + T_rho_i
        _, UinvN = _chol_upper_inv(DN)

        Alpha = jnp.concatenate(
            [Alpha0[:, None], jnp.moveaxis(alphas, 0, 1)], axis=1)
        BetaInv = jnp.concatenate(
            [Uinv0[:, None], jnp.moveaxis(uinvs, 0, 1), UinvN[:, None]],
            axis=1)
        return Alpha, BetaInv

    return fn


def online_band_chol_tridiag(Wd, Wu):
    """Batched online block-tridiagonal Cholesky — the in-jit mirror of
    utils.linalg.band_chol_blocks_tridiag for PER-LANE W blocks (the
    time-varying long-horizon path: every lane carries its own model, so
    the factorization must happen inside the solve).

    Wd [B, Nb, b, b] diagonal blocks, Wu [B, Nb-1, b, b] super-diagonal
    blocks. Returns (Alpha [B, Nb-1, b, b], BetaInv [B, Nb, b, b]) in the
    batched-blocks form kernels.band_chol.band_chol_solve consumes.
    Sequential lax.scan over the Nb stages of small [B, b, b] ops — the
    same recursion the reference's TIME_VARYING C runs per problem
    (code_laxMPC_ADMM_C.c:150-279), batched over lanes.
    """
    B, Nb, b, _ = Wd.shape
    Wd_s = jnp.moveaxis(Wd, 1, 0)                      # [Nb, B, b, b]
    Wu_pad = jnp.concatenate(
        [jnp.moveaxis(Wu, 1, 0),
         jnp.zeros((1, B, b, b), Wd.dtype)], axis=0)   # [Nb, B, b, b]

    def step(alpha_prev, xs):
        Wd_i, Wu_i = xs
        S = Wd_i - jnp.swapaxes(alpha_prev, -1, -2) @ alpha_prev
        Uinv_T, Uinv = _chol_upper_inv(S)
        alpha = Uinv_T @ Wu_i
        return alpha, (alpha, Uinv)

    _, (alphas, uinvs) = jax.lax.scan(
        step, jnp.zeros((B, b, b), Wd.dtype), (Wd_s, Wu_pad))
    Alpha = jnp.moveaxis(alphas, 0, 1)[:, :-1]         # last is vs zero pad
    BetaInv = jnp.moveaxis(uinvs, 0, 1)
    return Alpha, BetaInv
