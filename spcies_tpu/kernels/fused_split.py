"""Fused two-block split (S)ADMM iteration as a Pallas TPU kernel — the
HMPC-split / HMPC-SADMM analogue of kernels/fused_hmpc.py
(code_HMPC_ADMM_split_C.c:176-305; the SADMM half-step dual ordering at
:215-225 is preserved exactly).

The split loop couples (z, s) through one big KKT map aux = M1 q_hat +
aux_b with q_hat = [q - sigma z + lam; mu - rho s]. The kernel carries the
CONCATENATED layout [z (dim_p) | s-segments (ns_p)], where the s rows are
permuted offline into [box | y0 | y1 | y2] 128-aligned slabs (the
fused_hmpc segment trick), and maintains aux in delta form:

    aux += dq M1'  with  dq = dlm - scale (zs - zs_old),
    scale = [sigma on the z block | rho on the s block]

Both dq factors shrink to zero with the residual, so the kernel's only
per-iteration matmul runs single-pass at default MXU precision (there is
NO O(1)-operand matmul anywhere in this loop — the prologue q_hat map
runs outside the kernel under the solver-level highest-precision context).

Projection structure (per the builder's box_mode):
  z block: elementwise clip — box bounds on the stage entries, +/-3e38 on
           the harmonic-reference entries (free), [0, 0] on pads;
  s block: box clip on the box segment, shifted-SOC / diamond on the
           (y0, y1, y2) slabs.

The symmetric variant (IS_SYMMETRIC) takes the alpha-scaled half-step
dual update with the PREVIOUS (z, s) before the projections, exactly like
the dense engine and the reference C.

Carry/layout rules follow fused_admm.py's Mosaic workarounds: f32
arithmetic blending, VMEM-scratch-laundered row-max reductions, carry
inits derived from loaded data.

STATUS: correctness path (per-lane k within a few iterations of dense
and tol-scale iterate agreement; ALL CONVERGED in the TPU sweep). On the
N=10 tester fixture the dense loop is faster (130k vs 119k solves/s at
check_every=8): the segment layout pads the 122-entry combined state to
P=640 lanes, a 27x FLOP penalty on the KKT matmul that VMEM residency
cannot buy back. The dense backend stays the default and the bench path;
the kernel's padding overhead amortizes only for larger horizons/cone
counts (P_real closer to the 128-multiples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spcies_tpu.kernels.fused_admm import _round_up
from spcies_tpu.kernels.fused_hmpc import _proj_ssoc_seg


def _fused_split_kernel(aux1_ref, zs0_ref, lm0_ref, m1p_ref,
                        lb_ref, ub_ref, lby_ref, uby_ref,
                        scale_ref, iscale_ref,
                        zs_ref, lm_ref, aux_ref, k_ref, done_ref,
                        rp_ref, rd_ref, red_scratch,
                        *, alpha, tol_p, tol_d, k_max, use_soc,
                        symmetric, dim_p, n_boxp, cp, check_every,
                        exact_k=False):
    aux = aux1_ref[:]        # [tile_b, P]  current (z_hat, s_hat)
    zs = zs0_ref[:]          # [tile_b, P]  projected (z, s), seg layout
    lm = lm0_ref[:]          # [tile_b, P]  duals (lam, mu), seg layout
    m1p = m1p_ref[:]         # [P, P]       permuted M1'
    lb = lb_ref[:]           # [1, P]  clip bounds for z block + box seg
    ub = ub_ref[:]
    lby = lby_ref[:]         # [1, cp] diamond bounds
    uby = uby_ref[:]
    scale = scale_ref[:]     # [1, P]  sigma on z block, rho on s block
    iscale = iscale_ref[:]   # [1, P]  1/sigma | 1/rho (0 on pads)

    b0 = dim_p + n_boxp      # start of the y0 segment
    b1 = b0 + cp
    b2 = b1 + cp

    lane0 = aux[:, 0:1] * 0.0
    done0 = lane0
    k0 = lane0
    rbig = lane0 + 3.4e38

    def iterate(aux, zs_old, lm):
        """One split iteration; returns (aux_next, zs_new, lm_new,
        dp = zs_hat - zs_new, dd = zs_new - zs_old)."""
        zs_hat = aux
        lm_at = lm
        if symmetric:
            # half-step duals with the previous (z, s)
            # (code_HMPC_ADMM_split_C.c:215-225)
            lm = lm + alpha * scale * (zs_hat - zs_old)
        w = zs_hat + iscale * lm
        # z block + box segment: elementwise clip (free z entries carry
        # wide bounds, pads [0, 0])
        head = jnp.minimum(jnp.maximum(w[:, :b0], lb), ub)
        y0 = w[:, b0:b1]
        y1 = w[:, b1:b2]
        y2 = w[:, b2:]
        if use_soc:
            y0, y1, y2 = _proj_ssoc_seg(y0, y1, y2, 1.0, 0.0)
        else:
            y0, y1, y2 = _proj_ssoc_seg(y0, y1, y2, 1.0, lby)
            y0, y1, y2 = _proj_ssoc_seg(y0, y1, y2, -1.0, uby)
        zs_new = jnp.concatenate([head, y0, y1, y2], axis=1)
        lm_new = lm + alpha * scale * (zs_hat - zs_new)
        dp = zs_hat - zs_new
        dd = zs_new - zs_old
        dq = (lm_new - lm_at) - scale * dd
        aux_next = aux + jax.lax.dot(dq, m1p,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
        return aux_next, zs_new, lm_new, dp, dd

    def cond(carry):
        it, done = carry[0], carry[1]
        return jnp.logical_and(it < k_max, jnp.min(done) < 0.5)

    if check_every > 1 and exact_k:
        # exact-k free-run (kernels/fused_admm.py pattern, VERDICT r4
        # next-#5): unrolled windows snapshotting each lane's (aux, zs,
        # lm) at the start of its convergence window, then a per-
        # iteration replay of that window with freeze blending — k,
        # e_flag and exit iterates bit-identical to the exact
        # (check_every=1) path. (S)ADMM residuals are near-monotone past
        # the transient, so window-end detection finds the right window;
        # the replay then locates the exact first-tol-hit inside it.
        kmaxf = float(k_max)

        def body_e(carry):
            (it, done, kws, aux, zs, lm, sa, szs, slm) = carry
            a = 1.0 - done
            na = done
            sa = a * aux + na * sa
            szs = a * zs + na * szs
            slm = a * lm + na * slm
            kws = a * (lane0 + it.astype(jnp.float32)) + na * kws
            for _ in range(check_every - 1):
                aux, zs, lm, _dp, _dd = iterate(aux, zs, lm)
            aux2, zs2, lm2, dp, dd = iterate(aux, zs, lm)
            red_scratch[:, 0:1] = jnp.max(jnp.abs(dp), axis=1,
                                          keepdims=True)
            red_scratch[:, 1:2] = jnp.max(jnp.abs(dd), axis=1,
                                          keepdims=True)
            conv = ((red_scratch[:, 0:1] <= tol_p)
                    & (red_scratch[:, 1:2] <= tol_d)).astype(jnp.float32)
            done_out = jnp.maximum(done, a * conv)
            return (it + check_every, done_out, kws, aux2, zs2, lm2,
                    sa, szs, slm)

        (_it, done_fr, kws, _a2, _z2, _l2, sa, szs, slm) = \
            jax.lax.while_loop(
                cond, body_e,
                (jnp.int32(0), done0, k0, aux, zs, lm, aux, zs, lm))

        budget = jnp.minimum(lane0 + float(check_every), kmaxf - kws)

        def body_r(j, carry):
            (convd, k2, aux_cons, aux_next, zs, lm, rp, rd) = carry
            within = ((lane0 + j.astype(jnp.float32))
                      < budget).astype(jnp.float32)
            act = (1.0 - convd) * within
            na = 1.0 - act
            aux2, zs2, lm2, dp, dd = iterate(aux_next, zs, lm)
            red_scratch[:, 0:1] = jnp.max(jnp.abs(dp), axis=1,
                                          keepdims=True)
            red_scratch[:, 1:2] = jnp.max(jnp.abs(dd), axis=1,
                                          keepdims=True)
            r_p = red_scratch[:, 0:1]
            r_d = red_scratch[:, 1:2]
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            aux_cons_out = act * aux_next + na * aux_cons
            aux_next_out = act * aux2 + na * aux_next
            zs_out = act * zs2 + na * zs
            lm_out = act * lm2 + na * lm
            k2_out = k2 + act
            rp_out = act * r_p + na * rp
            rd_out = act * r_d + na * rd
            convd_out = jnp.maximum(convd, act * conv)
            return (convd_out, k2_out, aux_cons_out, aux_next_out,
                    zs_out, lm_out, rp_out, rd_out)

        convd, k2, aux, _an, zs, lm, rp, rd = jax.lax.fori_loop(
            0, check_every, body_r,
            (done0, kws, sa, sa, szs, slm, rbig, rbig))
        zs_ref[:] = zs
        lm_ref[:] = lm
        aux_ref[:] = aux
        k_ref[:] = k2.astype(jnp.int32)
        done_ref[:] = (convd > 0.5).astype(jnp.int32)
        rp_ref[:] = rp
        rd_ref[:] = rd
        return

    if check_every > 1:
        def body_f(carry):
            it, done, k, aux, zs, lm, rp, rd = carry

            def fast(_i, c):
                aux, zs, lm = c
                aux2, zs2, lm2, _dp, _dd = iterate(aux, zs, lm)
                return (aux2, zs2, lm2)

            n_fast = jnp.minimum(check_every - 1, k_max - 1 - it)
            aux, zs, lm = jax.lax.fori_loop(0, n_fast, fast, (aux, zs, lm))
            aux2, zs2, lm2, dp, dd = iterate(aux, zs, lm)
            red_scratch[:, 0:1] = jnp.max(jnp.abs(dp), axis=1,
                                          keepdims=True)
            red_scratch[:, 1:2] = jnp.max(jnp.abs(dd), axis=1,
                                          keepdims=True)
            r_p = red_scratch[:, 0:1]
            r_d = red_scratch[:, 1:2]
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            a = 1.0 - done
            k_out = k + a * (n_fast + 1).astype(jnp.float32)
            rp_out = a * r_p + done * rp
            rd_out = a * r_d + done * rd
            done_out = jnp.maximum(done, a * conv)
            return (it + n_fast + 1, done_out, k_out, aux2, zs2, lm2,
                    rp_out, rd_out)

        _it, done, k, aux, zs, lm, rp, rd = jax.lax.while_loop(
            cond, body_f, (jnp.int32(0), done0, k0, aux, zs, lm,
                           rbig, rbig))
    else:
        # exact mode: per-iteration checks + freeze blending (dense
        # masked-loop parity; the dense body consumes aux_prev and carries
        # aux_next, mirrored here by blending both)
        def body(carry):
            it, done, k, aux_cons, aux_next, zs, lm, rp, rd = carry
            aux2, zs2, lm2, dp, dd = iterate(aux_next, zs, lm)
            red_scratch[:, 0:1] = jnp.max(jnp.abs(dp), axis=1,
                                          keepdims=True)
            red_scratch[:, 1:2] = jnp.max(jnp.abs(dd), axis=1,
                                          keepdims=True)
            r_p = red_scratch[:, 0:1]
            r_d = red_scratch[:, 1:2]
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            a = 1.0 - done
            na = done
            aux_cons_out = a * aux_next + na * aux_cons
            aux_next_out = a * aux2 + na * aux_next
            zs_out = a * zs2 + na * zs
            lm_out = a * lm2 + na * lm
            k_out = k + a
            rp_out = a * r_p + na * rp
            rd_out = a * r_d + na * rd
            done_out = jnp.maximum(done, a * conv)
            return (it + 1, done_out, k_out, aux_cons_out, aux_next_out,
                    zs_out, lm_out, rp_out, rd_out)

        _it, done, k, aux, _auxn, zs, lm, rp, rd = jax.lax.while_loop(
            cond, body, (jnp.int32(0), done0, k0, aux, aux, zs, lm,
                         rbig, rbig))

    zs_ref[:] = zs
    lm_ref[:] = lm
    aux_ref[:] = aux
    k_ref[:] = k.astype(jnp.int32)
    done_ref[:] = (done > 0.5).astype(jnp.int32)
    rp_ref[:] = rp
    rd_ref[:] = rd


def fused_split_solve(aux1, zs0, lm0, M1P_pad, LB_pad, UB_pad, lby, uby,
                      scale_row, iscale_row, *,
                      alpha: float, tol_p: float, tol_d: float, k_max: int,
                      use_soc: bool, symmetric: bool,
                      dim_p: int, n_boxp: int, cp: int,
                      tile_b: int = 256, check_every: int = 1,
                      exact_k: bool = False, interpret: bool = False):
    """Run the fused split (S)ADMM loop in the concatenated segment
    layout [z (dim_p) | box (n_boxp) | y0 | y1 | y2 (cp each)].
    Returns (zs, lm, aux, k [B], e_flag [B], r_p, r_d)."""
    B, P = aux1.shape
    assert P == dim_p + n_boxp + 3 * cp
    assert P % 128 == 0 and B % tile_b == 0
    grid = (B // tile_b,)
    kernel = functools.partial(
        _fused_split_kernel, alpha=float(alpha), tol_p=float(tol_p),
        tol_d=float(tol_d), k_max=int(k_max), use_soc=bool(use_soc),
        symmetric=bool(symmetric), dim_p=dim_p, n_boxp=n_boxp, cp=cp,
        check_every=int(check_every), exact_k=bool(exact_k))

    tile = pl.BlockSpec((tile_b, P), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((P, P), lambda i: (0, 0), memory_space=pltpu.VMEM)
    headrow = pl.BlockSpec((1, dim_p + n_boxp), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    conerow = pl.BlockSpec((1, cp), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    prow = pl.BlockSpec((1, P), lambda i: (0, 0), memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, P), jnp.float32),
        jax.ShapeDtypeStruct((B, P), jnp.float32),
        jax.ShapeDtypeStruct((B, P), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
    )
    zs, lm, aux, k, done, rp, rd = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[tile, tile, tile, mat, headrow, headrow, conerow,
                  conerow, prow, prow],
        out_specs=(tile, tile, tile, lane, lane, lane, lane),
        scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.float32)],
        interpret=interpret,
    )(aux1, zs0, lm0, M1P_pad, LB_pad, UB_pad, lby, uby,
      scale_row, iscale_row)
    k = k[:, 0]
    e_flag = jnp.where(done[:, 0] == 1, jnp.int32(1), jnp.int32(-1))
    return zs, lm, aux, k, e_flag, rp[:, 0], rd[:, 0]
