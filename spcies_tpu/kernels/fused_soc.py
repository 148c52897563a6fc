"""Fused slack-SOC split ADMM iteration as a Pallas TPU kernel — the
ellipMPC-ADMM-soc analogue of kernels/fused_split.py
(code_ellipMPC_ADMM_soc_C.c: hot loop with the 1+n slack-SOC projection at
:224-241; runtime radius enters only through the prologue offset).

State layout: one concatenated row [z (dim_p) | s (sp)] per lane, both
slabs 128-aligned. The (z, s) split couples through the single KKT map
aux = M1 q_hat + aux_b with q_hat = [q - sigma z + lam; mu - rho s],
maintained in delta form (both dq factors shrink to zero with the
residual, so the kernel's only matmul runs single-pass at default MXU
precision; the prologue q_hat map runs outside the kernel under the
solver-level highest-precision context).

Projections per iteration:
  z slab: elementwise clip — real box bounds on the stage entries,
          +/-3e38 on the terminal state + slack scalar (free), [0, 0] on
          pads (code_ellipMPC_ADMM_soc_C.c z-update: x_N and the slack
          are unclipped);
  s slab: standard SOC over the (1+n)-vector [s0 | s_vec]: the tail norm
          is one in-row reduction (laundered through the VMEM scratch,
          fused_admm.py Mosaic carry-layout rules), then the three-case
          closed form (snippets/proj_SOC3.c generalized to n+1 dims)
          applied branch-free with arithmetic blending.

The runtime ellipsoid radius r_ellip (4th MEX input,
code_ellipMPC_ADMM_soc_C.c:20) is a per-lane value folded into the
prologue offset aux_b by the builder — the kernel never sees it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spcies_tpu.kernels.fused_admm import _round_up  # noqa: F401 (re-export)


def _fused_soc_kernel(aux1_ref, zs0_ref, lm0_ref, m1p_ref,
                      lb_ref, ub_ref, e0_ref,
                      scale_ref, iscale_ref,
                      zs_ref, lm_ref, aux_ref, k_ref, done_ref,
                      rp_ref, rd_ref, red_scratch,
                      *, tol_p, tol_d, k_max, dim_p, check_every, exact_k=False):
    aux = aux1_ref[:]        # [tile_b, P]  current (z_hat, s_hat)
    zs = zs0_ref[:]          # [tile_b, P]  projected (z, s)
    lm = lm0_ref[:]          # [tile_b, P]  duals (lam, mu)
    m1p = m1p_ref[:]         # [P, P]       permuted M1'
    lb = lb_ref[:]           # [1, dim_p]   z-slab clip bounds
    ub = ub_ref[:]
    e0 = e0_ref[:]           # [1, sp]      indicator of the s0 column
    scale = scale_ref[:]     # [1, P]  sigma on z slab, rho on s slab
    iscale = iscale_ref[:]   # [1, P]  1/sigma | 1/rho (0 on pads)

    lane0 = aux[:, 0:1] * 0.0
    done0 = lane0
    k0 = lane0
    rbig = lane0 + 3.4e38

    def iterate(aux, zs_old, lm):
        """One split iteration; returns (aux_next, zs_new, lm_new, dp, dd)."""
        zs_hat = aux
        w = zs_hat + iscale * lm
        # z slab: clip (terminal state + slack carry wide bounds)
        head = jnp.minimum(jnp.maximum(w[:, :dim_p], lb), ub)
        # s slab: SOC over [s0 | tail]; pads are exact zeros
        seg = w[:, dim_p:]
        s0 = seg[:, 0:1]                                       # [tile_b, 1]
        red_scratch[:, 2:3] = jnp.sqrt(jnp.maximum(
            jnp.sum(seg * seg, axis=1, keepdims=True) - s0 * s0, 0.0))
        nrm = red_scratch[:, 2:3]
        inside = (nrm <= s0).astype(jnp.float32)
        apex = (nrm <= -s0).astype(jnp.float32) * (1.0 - inside)
        proj = (1.0 - inside) * (1.0 - apex)
        safe = jnp.maximum(nrm, 1e-30)
        coef = 0.5 * (s0 + nrm)
        tail_scale = inside + proj * (coef / safe)
        s_new = (e0 * (inside * s0 + proj * coef)
                 + (1.0 - e0) * (seg * tail_scale))
        zs_new = jnp.concatenate([head, s_new], axis=1)
        lm_new = lm + scale * (zs_hat - zs_new)
        dp = zs_hat - zs_new
        dd = zs_new - zs_old
        dq = (lm_new - lm) - scale * dd
        aux_next = aux + jax.lax.dot(dq, m1p,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
        return aux_next, zs_new, lm_new, dp, dd

    def cond(carry):
        it, done = carry[0], carry[1]
        return jnp.logical_and(it < k_max, jnp.min(done) < 0.5)

    if check_every > 1 and exact_k:
        # exact-k free-run (kernels/fused_admm.py pattern): unrolled
        # windows + window-start (aux, zs, lm) snapshots, per-iteration
        # replay with freeze blending — bit-identical to check_every=1.
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
            return (jnp.maximum(convd, act * conv), k2 + act,
                    act * aux_next + na * aux_cons,
                    act * aux2 + na * aux_next,
                    act * zs2 + na * zs, act * lm2 + na * lm,
                    act * r_p + na * rp, act * r_d + na * rd)

        convd, k2, aux, _an, zs, lm, rp, rd = jax.lax.fori_loop(
            0, check_every, body_r, (done0, kws, sa, sa, szs, slm,
                                     rbig, rbig))
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
        # masked-loop parity)
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


def fused_soc_solve(aux1, zs0, lm0, M1P_pad, LB_head, UB_head, e0_row,
                    scale_row, iscale_row, *,
                    tol_p: float, tol_d: float, k_max: int, dim_p: int,
                    tile_b: int = 256, check_every: int = 1,
                    exact_k: bool = False,
                    interpret: bool = False):
    """Run the fused slack-SOC split ADMM loop in the concatenated layout
    [z (dim_p) | s (P - dim_p)]. Returns (zs, lm, aux, k, e_flag, r_p,
    r_d)."""
    B, P = aux1.shape
    assert P % 128 == 0 and dim_p % 128 == 0 and B % tile_b == 0
    grid = (B // tile_b,)
    sp = P - dim_p
    kernel = functools.partial(
        _fused_soc_kernel, tol_p=float(tol_p), tol_d=float(tol_d),
        k_max=int(k_max), dim_p=dim_p, check_every=int(check_every),
        exact_k=bool(exact_k))

    tile = pl.BlockSpec((tile_b, P), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((P, P), lambda i: (0, 0), memory_space=pltpu.VMEM)
    headrow = pl.BlockSpec((1, dim_p), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    segrow = pl.BlockSpec((1, sp), lambda i: (0, 0),
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
        in_specs=[tile, tile, tile, mat, headrow, headrow, segrow,
                  prow, prow],
        out_specs=(tile, tile, tile, lane, lane, lane, lane),
        scratch_shapes=[pltpu.VMEM((tile_b, 4), jnp.float32)],
        interpret=interpret,
    )(aux1, zs0, lm0, M1P_pad, LB_head, UB_head, e0_row,
      scale_row, iscale_row)
    k = k[:, 0]
    e_flag = jnp.where(done[:, 0] == 1, jnp.int32(1), jnp.int32(-1))
    return zs, lm, aux, k, e_flag, rp[:, 0], rd[:, 0]
