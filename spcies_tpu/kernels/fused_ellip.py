"""Fused ellipMPC-ADMM iteration as a Pallas TPU kernel.

The ellipMPC v-update is a P-weighted prox: box clip on the stage entries
and an exact P-norm ellipsoid projection on the terminal state, with
P_half / P^-1_half / P matmuls threaded through the dual and delta updates
(reference code_ellipMPC_ADMM_C.c:296-351, formulations/ellipmpc.py dense
backend). Run naively in a VMEM-resident kernel that costs three extra
full-width matmuls per iteration, two of them on O(1) operands that would
need 6-pass f32 precision.

This kernel instead re-coordinatizes offline: with S = blkdiag(I, P_half)
and the transformed iterates z' = S z, v' = S v (the dual lam is ALREADY
the transformed-space dual — the dense update lam += rho P_half (z_T - v_T)
is elementwise in these coordinates), the whole iteration collapses to the
fused box-ADMM pattern:

    y      = z' + rho^-1 lam                       (elementwise)
    v'     = clip(y) on stages | ball-proj on the terminal slab
             (the P-norm ellipsoid is the EUCLIDEAN ball ||y'-c'|| <= r
              in transformed coordinates, c' = P_half c)
    lam   += rho (z' - v')                         (elementwise)
    z'    += rho (z' - 2 v' + v'_prev) @ M2        (one MXU matmul,
              M2 = S M_q S baked offline in fp64; rho scales the vector
              first, matching the dense engine's rounding order)

so the only per-iteration matmul is the delta-form product (pinned to
HIGHEST precision: unlike the box-ADMM case, degenerate ellipsoids keep
dq O(tol) for long stretches and the systematic bf16 truncation of M2
would shift the fixed point). Residuals are
reported in ORIGINAL coordinates for dense-engine parity: at checked
iterations the terminal columns of the primal/dual differences are mapped
back through PINVH = blkdiag(0, P_half^-1) (delta operands -> default
precision).

Layout/carry rules follow fused_admm.py's Mosaic workarounds: f32
arithmetic blending for per-lane masks, VMEM scratch store/load to launder
row-reduction layouts entering the while carry, carry inits derived from
loaded data. Padding contract: nz -> 128 multiple, zero pad rows/cols in
M2/PINVH, [0, 0] pad bounds, seg_t = 0 on pads, so pad state stays 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spcies_tpu.kernels.fused_admm import _round_up  # noqa: F401 (re-export)


def _fused_ellip_kernel(z1_ref, v0_ref, lam0_ref, m2_ref, pinvh_ref,
                        lb_ref, ub_ref, segt_ref, c_ref,
                        z_ref, v_ref, lam_ref, k_ref, done_ref,
                        rp_ref, rd_ref, red_scratch,
                        *, rho, rho_i, tol_p, tol_d, k_max, r_ball,
                        check_every, fixed_iters, exact_k=False):
    z = z1_ref[:]
    v = v0_ref[:]
    lam = lam0_ref[:]
    m2 = m2_ref[:]
    pinvh = pinvh_ref[:]
    lb = lb_ref[:]
    ub = ub_ref[:]
    segt = segt_ref[:]
    cpad = c_ref[:]
    segs = 1.0 - segt

    lane0 = z[:, 0:1] * 0.0
    done0 = lane0
    k0 = lane0
    rbig = lane0 + 3.4e38

    def prox(y):
        """Box on stage slots, Euclidean ball (center cpad, radius r_ball)
        on the terminal slots — the transformed-coordinate form of the
        P-norm ellipsoid projection."""
        vbox = jnp.minimum(jnp.maximum(y, lb), ub)
        yc = y - cpad
        quad = jnp.sum(yc * yc * segt, axis=1, keepdims=True)
        nrm = jnp.sqrt(quad)
        scale = jnp.minimum(1.0, r_ball / jnp.maximum(nrm, 1e-30))
        return segs * vbox + segt * (cpad + scale * yc)

    def fast_body(_i, carry):
        z_c, v_c, lam_c = carry
        v_prev = v_c
        v_new = prox(z_c + rho_i * lam_c)
        lam_new = lam_c + rho * (z_c - v_new)
        dq = rho * (z_c - 2.0 * v_new + v_prev)
        # HIGHEST, not DEFAULT: on ill-conditioned problems (e.g. the
        # degenerate r=0 reference fixture) dq stalls near tol for
        # hundreds of iterations, and the systematic ~0.4% bf16
        # truncation of m2 then shifts the fixed point by ~1e-2-class
        # errors (measured on v5e); the 6-pass product keeps the fused
        # fixed point on the dense engine's optimum
        zn = z_c + jax.lax.dot(dq, m2, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        return (zn, v_new, lam_new)

    def step_checked(z_c, v_c, lam_c):
        """One iteration + original-coordinate residuals."""
        v_prev = v_c
        v_new = prox(z_c + rho_i * lam_c)
        lam_new = lam_c + rho * (z_c - v_new)
        dp = z_c - v_new
        dv = v_new - v_prev
        # map terminal columns back to original coordinates (delta
        # operands -> default precision suffices)
        dpo = dp * segs + jax.lax.dot(dp * segt, pinvh,
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.DEFAULT)
        dvo = dv * segs + jax.lax.dot(dv * segt, pinvh,
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.DEFAULT)
        red_scratch[:, 0:1] = jnp.max(jnp.abs(dpo), axis=1, keepdims=True)
        red_scratch[:, 1:2] = jnp.max(jnp.abs(dvo), axis=1, keepdims=True)
        r_p = red_scratch[:, 0:1]
        r_d = red_scratch[:, 1:2]
        dq = rho * (z_c - 2.0 * v_new + v_prev)
        # HIGHEST, not DEFAULT: on ill-conditioned problems (e.g. the
        # degenerate r=0 reference fixture) dq stalls near tol for
        # hundreds of iterations, and the systematic ~0.4% bf16
        # truncation of m2 then shifts the fixed point by ~1e-2-class
        # errors (measured on v5e); the 6-pass product keeps the fused
        # fixed point on the dense engine's optimum
        zn = z_c + jax.lax.dot(dq, m2, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        return zn, v_new, lam_new, r_p, r_d

    if fixed_iters:
        zf, vf, lamf = jax.lax.fori_loop(
            0, fixed_iters, fast_body, (z, v, lam))
        z_ref[:] = zf
        v_ref[:] = vf
        lam_ref[:] = lamf
        k_ref[:] = (lane0 + float(fixed_iters)).astype(jnp.int32)
        done_ref[:] = (lane0 + 1.0).astype(jnp.int32)
        rp_ref[:] = rbig
        rd_ref[:] = rbig
        return

    def cond(carry):
        it, done = carry[0], carry[1]
        return jnp.logical_and(it < k_max, jnp.min(done) < 0.5)

    if check_every > 1 and exact_k:
        # exact-k free-run (kernels/fused_admm.py pattern, VERDICT r4
        # next-#5): unrolled windows + window-start (z, v, lam) snapshots,
        # then a per-iteration replay with freeze blending — k, e_flag,
        # exit iterates bit-identical to the exact (check_every=1) mode.
        kmaxf = float(k_max)

        def body_e(carry):
            (it, done, kws, z_c, v_c, lam_c, sz, sv, sl) = carry
            a = 1.0 - done
            na = done
            sz = a * z_c + na * sz
            sv = a * v_c + na * sv
            sl = a * lam_c + na * sl
            kws = a * (lane0 + it.astype(jnp.float32)) + na * kws
            for _ in range(check_every - 1):
                z_c, v_c, lam_c = fast_body(0, (z_c, v_c, lam_c))
            zn, v_new, lam_new, r_p, r_d = step_checked(z_c, v_c, lam_c)
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            done_out = jnp.maximum(done, a * conv)
            return (it + check_every, done_out, kws, zn, v_new, lam_new,
                    sz, sv, sl)

        (_it, done_fr, kws, _z2, _v2, _l2, sz, sv, sl) = \
            jax.lax.while_loop(
                cond, body_e,
                (jnp.int32(0), done0, k0, z, v, lam, z, v, lam))

        budget = jnp.minimum(lane0 + float(check_every), kmaxf - kws)

        def body_r(j, carry):
            (convd, k2, z_cons, z_next, v_c, lam_c, rp, rd) = carry
            within = ((lane0 + j.astype(jnp.float32))
                      < budget).astype(jnp.float32)
            act = (1.0 - convd) * within
            na = 1.0 - act
            zn, v_new, lam_new, r_p, r_d = step_checked(z_next, v_c,
                                                        lam_c)
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            return (jnp.maximum(convd, act * conv), k2 + act,
                    act * z_next + na * z_cons, act * zn + na * z_next,
                    act * v_new + na * v_c, act * lam_new + na * lam_c,
                    act * r_p + na * rp, act * r_d + na * rd)

        convd, k2, z, _zn2, v, lam, rp, rd = jax.lax.fori_loop(
            0, check_every, body_r, (done0, kws, sz, sz, sv, sl,
                                     rbig, rbig))
        z_ref[:] = z
        v_ref[:] = v
        lam_ref[:] = lam
        k_ref[:] = k2.astype(jnp.int32)
        done_ref[:] = (convd > 0.5).astype(jnp.int32)
        rp_ref[:] = rp
        rd_ref[:] = rd
        return

    if check_every > 1:
        # free-running mode (fused_admm semantics): plain iterations
        # between checks, k at check granularity, converged lanes keep
        # iterating until the tile drains
        def body_f(carry):
            it, done, k, z_c, v_c, lam_c, rp, rd = carry
            n_fast = jnp.minimum(check_every - 1, k_max - 1 - it)
            z_c, v_c, lam_c = jax.lax.fori_loop(
                0, n_fast, fast_body, (z_c, v_c, lam_c))
            zn, v_new, lam_new, r_p, r_d = step_checked(z_c, v_c, lam_c)
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            a = 1.0 - done
            k_out = k + a * (n_fast + 1).astype(jnp.float32)
            rp_out = a * r_p + done * rp
            rd_out = a * r_d + done * rd
            done_out = jnp.maximum(done, a * conv)
            return (it + n_fast + 1, done_out, k_out, zn, v_new, lam_new,
                    rp_out, rd_out)

        _it, done, k, z, v, lam, rp, rd = jax.lax.while_loop(
            cond, body_f, (jnp.int32(0), done0, k0, z, v, lam, rbig, rbig))
    else:
        # exact mode: per-iteration freeze blending; the returned z is the
        # CONSUMED iterate (dense masked-loop parity)
        def body(carry):
            it, done, k, z_cons, z_next, v_c, lam_c, rp, rd = carry
            zn, v_new, lam_new, r_p, r_d = step_checked(z_next, v_c, lam_c)
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            a = 1.0 - done
            na = done
            return (it + 1, jnp.maximum(done, a * conv), k + a,
                    a * z_next + na * z_cons, a * zn + na * z_next,
                    a * v_new + na * v_c, a * lam_new + na * lam_c,
                    a * r_p + na * rp, a * r_d + na * rd)

        _it, done, k, z, _zn, v, lam, rp, rd = jax.lax.while_loop(
            cond, body, (jnp.int32(0), done0, k0, z, z, v, lam,
                         rbig, rbig))

    z_ref[:] = z
    v_ref[:] = v
    lam_ref[:] = lam
    k_ref[:] = k.astype(jnp.int32)
    done_ref[:] = (done > 0.5).astype(jnp.int32)
    rp_ref[:] = rp
    rd_ref[:] = rd


def fused_ellip_solve(z1, v0, lam0, M2_pad, PINVH_pad, LB_pad, UB_pad,
                      segT, c_pad, *, rho: float, tol_p: float,
                      tol_d: float, k_max: int, r_ball: float,
                      tile_b: int = 256, check_every: int = 1,
                      fixed_iters: int = 0, exact_k: bool = False,
                      interpret: bool = False):
    """Run the fused ellipMPC-ADMM loop in transformed coordinates.

    All arrays lane-padded to a 128 multiple and batch-padded to tile_b.
    z1/v0 are TRANSFORMED iterates (terminal block through P_half); lam0 is
    the dense engine's dual unchanged. Returns (z, v, lam, k, e_flag, r_p,
    r_d) with z/v still transformed — the builder maps the terminal block
    back through P_half^-1.
    """
    B, nzp = z1.shape
    assert nzp % 128 == 0 and B % tile_b == 0
    grid = (B // tile_b,)
    kernel = functools.partial(
        _fused_ellip_kernel, rho=float(rho), rho_i=float(1.0 / rho),
        tol_p=float(tol_p), tol_d=float(tol_d), k_max=int(k_max),
        r_ball=float(r_ball), check_every=int(check_every),
        fixed_iters=int(fixed_iters or 0), exact_k=bool(exact_k))

    tile = pl.BlockSpec((tile_b, nzp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((nzp, nzp), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, nzp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((B, nzp), jnp.float32),
        jax.ShapeDtypeStruct((B, nzp), jnp.float32),
        jax.ShapeDtypeStruct((B, nzp), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
    )
    z, v, lam, k, done, rp, rd = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[tile, tile, tile, full, full, row, row, row, row],
        out_specs=(tile, tile, tile, lane, lane, lane, lane),
        scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.float32)],
        interpret=interpret,
    )(z1, v0, lam0, M2_pad, PINVH_pad, LB_pad, UB_pad, segT, c_pad)
    k = k[:, 0]
    e_flag = jnp.where(done[:, 0] == 1, jnp.int32(1), jnp.int32(-1))
    return z, v, lam, k, e_flag, rp[:, 0], rd[:, 0]
