"""Fused three-block EADMM iteration as a Pallas TPU kernel — the MPCT
EADMM analogue of kernels/fused_admm.py (code_MPCT_EADMM_C.c:85-459,
spcies_MPCT_EADMM_solver.m).

Everything lives in ONE padded lane layout Z = round_up((N+1)(n+m), 128)
(the z1/z3 decision layout). The three coupling matrices A1/A2/A3 reduce
to elementwise ops in this layout:

  A1' rows -> z1:   -mid + mask_h (head) - mask_t (tail)     (elementwise)
  A3' rows -> z3:   +mid                                     (elementwise)
  A2' rows -> z2b:  block-sum + W2 map + broadcast, folded offline into
                    two Z x Z constants C2m (mid rows) and C2t (tail rows)

where z2 is carried in BROADCAST form z2b = z2 (x) 1_{N+1} (constant
across stage blocks), and the head/tail constraint-row groups are carried
in a second Z-layout array (head rows at lanes 0..n, tail rows at the
last stage block's lanes — disjoint for N >= 1). Duals likewise split
into lm (mid rows, Z layout) and lht (head+tail rows).

Per iteration: 3 MXU matmuls [tile_b, Z] @ [Z, Z] (two for the z2 block,
one M3 map for z3) + elementwise P1 clip / dual / residual work, all
VMEM-resident. All three products run in DELTA form — the kernel carries
the previous matmul inputs (v2m/v2t/q3) and output accumulators
(z2acc/z3acc), multiplying only the shrinking input deltas — so every
dot runs single-pass at DEFAULT MXU precision (a full-operand product
would need the 6x-pass HIGHEST path to avoid the bf16 truncation floor,
commit eff0082). The accumulators start at (z2refb, 0) with zero
previous inputs, so iteration one reproduces the full products exactly
even under a warm start.

check_every=1 reproduces the dense masked loop's per-lane k and exit
iterates (freeze blending); check_every>1 free-runs windows and records k
at window granularity.

Carry/layout rules follow fused_admm.py's Mosaic workarounds: f32
blending, VMEM-scratch-laundered row-max reductions, carry inits derived
from loaded data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_eadmm_kernel(x0b_ref, z2refb_ref, z2b0_ref, z30_ref,
                        lm0_ref, lht0_ref,
                        c2m_ref, c2t_ref, m3p_ref,
                        rm_ref, rht_ref, mh_ref, mt_ref, mr_ref,
                        h1i_ref, lb_ref, ub_ref,
                        z1_ref, z2b_ref, z3_ref, lm_ref, lht_ref,
                        k_ref, done_ref, rpf_ref, rz2_ref, rz3_ref,
                        red_scratch,
                        *, tol, k_max, check_every, exact_k=False):
    x0b = x0b_ref[:]         # [tile_b, Z]  x0 at head lanes
    z2refb = z2refb_ref[:]   # [tile_b, Z]  q2_ref W2' broadcast
    z2b = z2b0_ref[:]
    z3 = z30_ref[:]
    lm = lm0_ref[:]
    lht = lht0_ref[:]
    c2m = c2m_ref[:]         # [Z, Z]
    c2t = c2t_ref[:]
    m3p = m3p_ref[:]
    rm = rm_ref[:]           # [1, Z] rho on the mid rows
    rht = rht_ref[:]         # [1, Z] rho on head/tail lanes
    mh = mh_ref[:]           # [1, Z] head-lane mask
    mt = mt_ref[:]           # [1, Z] tail-lane (last stage block) mask
    mr = mr_ref[:]           # [1, Z] real-lane mask (lanes < nz1)
    h1i = h1i_ref[:]
    lb = lb_ref[:]
    ub = ub_ref[:]
    sign_ht = mh - mt

    lane0 = z2b[:, 0:1] * 0.0
    done0 = lane0
    k0 = lane0
    rbig = lane0 + 3.4e38

    def ddot(x, M):
        return jax.lax.dot(x, M, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)

    def iterate(z2b, z3, lm, lht, z2acc, z3acc, v2m_p, v2t_p, q3_p):
        """One EADMM iteration (code_MPCT_EADMM_C.c:85-459 phase order),
        matmuls in delta form against the carried previous inputs."""
        # P1: q1 = A1'(rho.*rows(0, z2, z3, x0) + lam); clipped diag solve
        s_ht = rht * (mt * z2b - x0b) + lht
        q1 = -(rm * (z2b + z3) + lm) + sign_ht * s_ht
        z1 = jnp.minimum(jnp.maximum(-q1 * h1i, lb), ub)
        # P2: z2 = W2 (q2_ref + A2'(rho.*rows(z1, 0, z3, 0) + lam)),
        # broadcast form via the folded C2m/C2t constants
        v2m = rm * (z3 - z1) + lm
        v2t = mt * (rht * (-z1) + lht)
        z2bn = z2acc + ddot(v2m - v2m_p, c2m) + ddot(v2t - v2t_p, c2t)
        # P3: z3 = M3 (A3'(rho.*rows(z1, z2n, 0, 0) + lam)) — mid rows only
        q3 = rm * (z2bn - z1) + lm
        z3n = z3acc + ddot(q3 - q3_p, m3p)
        # residual rows + dual ascent
        midR = z2bn + z3n - z1
        htR = mh * z1 - x0b + mt * (z2bn - z1)
        lm_n = lm + rm * midR
        lht_n = lht + rht * htR
        return (z1, z2bn, z3n, lm_n, lht_n, v2m, v2t, q3, midR, htR,
                z2bn - z2b, z3n - z3)

    def residuals(midR, htR, dz2, dz3):
        red_scratch[:, 0:1] = jnp.maximum(
            jnp.max(jnp.abs(midR * mr), axis=1, keepdims=True),
            jnp.max(jnp.abs(htR), axis=1, keepdims=True))
        red_scratch[:, 1:2] = jnp.max(jnp.abs(dz2 * mr), axis=1,
                                      keepdims=True)
        red_scratch[:, 2:3] = jnp.max(jnp.abs(dz3 * mr), axis=1,
                                      keepdims=True)
        return (red_scratch[:, 0:1], red_scratch[:, 1:2],
                red_scratch[:, 2:3])

    def cond(carry):
        it, done = carry[0], carry[1]
        return jnp.logical_and(it < k_max, jnp.min(done) < 0.5)

    z1 = z2b * 0.0
    zero = z2b * 0.0
    z2acc0 = z2refb
    if check_every > 1 and exact_k:
        # exact-k free-run (kernels/fused_admm.py pattern): unrolled
        # windows snapshotting the FULL 9-leaf in-loop state at each
        # lane's convergence-window start, then a per-iteration replay
        # with the exact-mode freeze blending — bit-identical to
        # check_every=1. The snapshots double the VMEM state; use
        # tile_b <= 256.
        kmaxf = float(k_max)

        def body_e(carry):
            (it, done, kws, st, sn) = carry
            a = 1.0 - done
            na = done
            sn = tuple(a * x + na * s for x, s in zip(st, sn))
            kws = a * (lane0 + it.astype(jnp.float32)) + na * kws

            def step(c):
                z2b, z3, lm, lht, z2acc, z3acc, v2m_p, v2t_p, q3_p = c
                (_z1n, z2bn, z3n, lm_n, lht_n, v2m, v2t, q3,
                 *_rest) = iterate(z2b, z3, lm, lht, z2acc, z3acc,
                                   v2m_p, v2t_p, q3_p)
                return (z2bn, z3n, lm_n, lht_n, z2bn, z3n, v2m, v2t, q3)

            for _ in range(check_every - 1):
                st = step(st)
            (z1n, z2bn, z3n, lm_n, lht_n, v2m, v2t, q3, midR, htR,
             dz2, dz3) = iterate(*st)
            r_pf, r_z2, r_z3 = residuals(midR, htR, dz2, dz3)
            conv = ((r_pf <= tol) & (r_z2 <= tol)
                    & (r_z3 <= tol)).astype(jnp.float32)
            st = (z2bn, z3n, lm_n, lht_n, z2bn, z3n, v2m, v2t, q3)
            return (it + check_every, jnp.maximum(done, a * conv), kws,
                    st, sn)

        def cond_e(carry):
            it, done = carry[0], carry[1]
            return jnp.logical_and(it < k_max, jnp.min(done) < 0.5)

        st0 = (z2b, z3, lm, lht, z2acc0, zero, zero, zero, zero)
        (_it, done_fr, kws, _st, sn) = jax.lax.while_loop(
            cond_e, body_e, (jnp.int32(0), done0, k0, st0, st0))

        budget = jnp.minimum(lane0 + float(check_every), kmaxf - kws)

        def body_r(j, carry):
            (convd, k2, z1c, st, rpf, rz2, rz3) = carry
            within = ((lane0 + j.astype(jnp.float32))
                      < budget).astype(jnp.float32)
            act = (1.0 - convd) * within
            na = 1.0 - act
            (z1n, z2bn, z3n, lm_n, lht_n, v2m, v2t, q3, midR, htR,
             dz2, dz3) = iterate(*st)
            r_pf, r_z2, r_z3 = residuals(midR, htR, dz2, dz3)
            conv = ((r_pf <= tol) & (r_z2 <= tol)
                    & (r_z3 <= tol)).astype(jnp.float32)
            new = (z2bn, z3n, lm_n, lht_n, z2bn, z3n, v2m, v2t, q3)
            st = tuple(act * x + na * s for x, s in zip(new, st))
            return (jnp.maximum(convd, act * conv), k2 + act,
                    act * z1n + na * z1c, st,
                    act * r_pf + na * rpf, act * r_z2 + na * rz2,
                    act * r_z3 + na * rz3)

        convd, k2, z1, st, rpf, rz2, rz3 = jax.lax.fori_loop(
            0, check_every, body_r,
            (done0, kws, z1, sn, rbig, rbig, rbig))
        z2b, z3, lm, lht = st[0], st[1], st[2], st[3]
        z1_ref[:] = z1
        z2b_ref[:] = z2b
        z3_ref[:] = z3
        lm_ref[:] = lm
        lht_ref[:] = lht
        k_ref[:] = k2.astype(jnp.int32)
        done_ref[:] = (convd > 0.5).astype(jnp.int32)
        rpf_ref[:] = rpf
        rz2_ref[:] = rz2
        rz3_ref[:] = rz3
        return

    if check_every > 1:
        def body_f(carry):
            (it, done, k, _z1, z2b, z3, lm, lht,
             z2acc, z3acc, v2m_p, v2t_p, q3_p, rpf, rz2, rz3) = carry

            def fast(_i, c):
                z2b, z3, lm, lht, z2acc, z3acc, v2m_p, v2t_p, q3_p = c
                (_z1n, z2bn, z3n, lm_n, lht_n, v2m, v2t, q3,
                 *_rest) = iterate(z2b, z3, lm, lht, z2acc, z3acc,
                                   v2m_p, v2t_p, q3_p)
                return (z2bn, z3n, lm_n, lht_n, z2bn, z3n, v2m, v2t, q3)

            n_fast = jnp.minimum(check_every - 1, k_max - 1 - it)
            (z2b, z3, lm, lht, z2acc, z3acc,
             v2m_p, v2t_p, q3_p) = jax.lax.fori_loop(
                0, n_fast, fast,
                (z2b, z3, lm, lht, z2acc, z3acc, v2m_p, v2t_p, q3_p))
            (z1n, z2bn, z3n, lm_n, lht_n, v2m, v2t, q3, midR, htR,
             dz2, dz3) = iterate(z2b, z3, lm, lht, z2acc, z3acc,
                                 v2m_p, v2t_p, q3_p)
            r_pf, r_z2, r_z3 = residuals(midR, htR, dz2, dz3)
            conv = ((r_pf <= tol) & (r_z2 <= tol)
                    & (r_z3 <= tol)).astype(jnp.float32)
            a = 1.0 - done
            return (it + n_fast + 1, jnp.maximum(done, a * conv),
                    k + a * (n_fast + 1).astype(jnp.float32),
                    z1n, z2bn, z3n, lm_n, lht_n, z2bn, z3n, v2m, v2t, q3,
                    a * r_pf + done * rpf, a * r_z2 + done * rz2,
                    a * r_z3 + done * rz3)

        (_it, done, k, z1, z2b, z3, lm, lht, _z2a, _z3a, _vm, _vt, _q3,
         rpf, rz2, rz3) = jax.lax.while_loop(
            cond, body_f, (jnp.int32(0), done0, k0, z1, z2b, z3, lm, lht,
                           z2acc0, zero, zero, zero, zero,
                           rbig, rbig, rbig))
    else:
        # exact mode: per-iteration checks + freeze blending (dense
        # masked-loop parity)
        def body(carry):
            (it, done, k, z1, z2b, z3, lm, lht,
             z2acc, z3acc, v2m_p, v2t_p, q3_p, rpf, rz2, rz3) = carry
            (z1n, z2bn, z3n, lm_n, lht_n, v2m, v2t, q3, midR, htR,
             dz2, dz3) = iterate(z2b, z3, lm, lht, z2acc, z3acc,
                                 v2m_p, v2t_p, q3_p)
            r_pf, r_z2, r_z3 = residuals(midR, htR, dz2, dz3)
            conv = ((r_pf <= tol) & (r_z2 <= tol)
                    & (r_z3 <= tol)).astype(jnp.float32)
            a = 1.0 - done
            na = done
            return (it + 1, jnp.maximum(done, a * conv), k + a,
                    a * z1n + na * z1, a * z2bn + na * z2b,
                    a * z3n + na * z3, a * lm_n + na * lm,
                    a * lht_n + na * lht,
                    a * z2bn + na * z2acc, a * z3n + na * z3acc,
                    a * v2m + na * v2m_p, a * v2t + na * v2t_p,
                    a * q3 + na * q3_p,
                    a * r_pf + na * rpf, a * r_z2 + na * rz2,
                    a * r_z3 + na * rz3)

        (_it, done, k, z1, z2b, z3, lm, lht, _z2a, _z3a, _vm, _vt, _q3,
         rpf, rz2, rz3) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), done0, k0, z1, z2b, z3, lm, lht,
                         z2acc0, zero, zero, zero, zero,
                         rbig, rbig, rbig))

    z1_ref[:] = z1
    z2b_ref[:] = z2b
    z3_ref[:] = z3
    lm_ref[:] = lm
    lht_ref[:] = lht
    k_ref[:] = k.astype(jnp.int32)
    done_ref[:] = (done > 0.5).astype(jnp.int32)
    rpf_ref[:] = rpf
    rz2_ref[:] = rz2
    rz3_ref[:] = rz3


def fused_eadmm_solve(x0b, z2refb, z2b0, z30, lm0, lht0,
                      C2m, C2t, M3p, rm_row, rht_row, mh_row, mt_row,
                      mr_row, h1i_row, lb_row, ub_row, *,
                      tol: float, k_max: int,
                      tile_b: int = 256, check_every: int = 1,
                      exact_k: bool = False,
                      interpret: bool = False):
    """Run the fused EADMM loop in the broadcast lane layout.
    Returns (z1, z2b, z3, lm, lht, k [B], e_flag [B], r_pf, r_z2, r_z3)."""
    B, Z = x0b.shape
    assert Z % 128 == 0 and B % tile_b == 0
    grid = (B // tile_b,)
    kernel = functools.partial(
        _fused_eadmm_kernel, tol=float(tol), k_max=int(k_max),
        check_every=int(check_every), exact_k=bool(exact_k))

    tile = pl.BlockSpec((tile_b, Z), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((Z, Z), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, Z), lambda i: (0, 0), memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    out_shapes = tuple(
        [jax.ShapeDtypeStruct((B, Z), jnp.float32)] * 5
        + [jax.ShapeDtypeStruct((B, 1), jnp.int32)] * 2
        + [jax.ShapeDtypeStruct((B, 1), jnp.float32)] * 3)
    (z1, z2b, z3, lm, lht, k, done, rpf, rz2, rz3) = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[tile] * 6 + [mat] * 3 + [row] * 8,
        out_specs=tuple([tile] * 5 + [lane] * 5),
        scratch_shapes=[pltpu.VMEM((tile_b, 3), jnp.float32)],
        interpret=interpret,
    )(x0b, z2refb, z2b0, z30, lm0, lht0, C2m, C2t, M3p,
      rm_row, rht_row, mh_row, mt_row, mr_row, h1i_row, lb_row, ub_row)
    k = k[:, 0]
    e_flag = jnp.where(done[:, 0] == 1, jnp.int32(1), jnp.int32(-1))
    return z1, z2b, z3, lm, lht, k, e_flag, rpf[:, 0], rz2[:, 0], rz3[:, 0]
