"""Fused single-split cone-ADMM iteration as a Pallas TPU kernel — the
HMPC/ellipHMPC analogue of kernels/fused_admm.py.

The HMPC hot loop is

    Czd  = z C' - d
    s    = proj(-(Czd) - rho^-1 lam)      box rows + 3-vector cones
    lam += rho (Czd + s)
    z'   = z + (rho ds + rho resid) C M1'   (delta form)

The cone projections act on interleaved (y0, y1, y2) triples, which TPUs
cannot slice efficiently along the lane axis. The kernel therefore works
in a SEGMENT layout: the constraint rows are permuted offline to
[box | all y0 | all y1 | all y2], each segment padded to a 128-lane
multiple, so every cone operation is an elementwise op between three
128-aligned slabs. The builder permutes C/d/bounds into this layout and
un-permutes s/lam on the way out.

Padding contract: pad box rows carry [0, 0] bounds and pad cone rows carry
LBY = UBY = 0 (diamond) — a zero triple projects to zero in both cone
modes, and zero rows of C keep Czd = 0 there, so pad state stays exactly 0.

Carry/layout rules follow fused_admm.py's Mosaic workarounds: f32
arithmetic blending for per-lane masks, a VMEM scratch store/load to
launder row-max reduction layouts, carry inits derived from loaded data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spcies_tpu.kernels.fused_admm import _round_up


def _proj_ssoc_seg(y0, y1, y2, a, dd):
    """Branch-free shifted-SOC projection on segment slabs:
    {(y0, y1, y2): sqrt(y1^2 + y2^2) <= a (y0 - dd)}, a in {-1, +1}."""
    ny1 = jnp.sqrt(y1 * y1 + y2 * y2)
    corr = a * (y0 - dd)
    inside = (ny1 <= corr).astype(jnp.float32)
    apex = (ny1 <= -corr).astype(jnp.float32) * (1.0 - inside)
    proj = (1.0 - inside) * (1.0 - apex)
    safe = jnp.maximum(ny1, 1e-30)
    step = (corr + ny1) / (2.0 * safe)
    z0 = inside * y0 + apex * dd + proj * (step * ny1 * a + dd)
    z1 = inside * y1 + proj * (step * y1)
    z2 = inside * y2 + proj * (step * y2)
    return z0, z1, z2


def _fused_hmpc_kernel(z1_ref, s0_ref, lam0_ref, ct_ref, mc_ref, d_ref,
                       blb_ref, bub_ref, lby_ref, uby_ref,
                       z_ref, s_ref, lam_ref, k_ref, done_ref,
                       rp_ref, rd_ref, red_scratch,
                       *, rho, rho_i, tol_p, tol_d, k_max, use_soc,
                       n_boxp, cp, check_every, exact_k=False):
    z = z1_ref[:]
    s = s0_ref[:]
    lam = lam0_ref[:]
    ct = ct_ref[:]          # [dim_p, ns_p]   (z @ ct -> Czd rows)
    mc = mc_ref[:]          # [ns_p, dim_p]   (w @ mc -> dz)
    d = d_ref[:]
    blb = blb_ref[:]
    bub = bub_ref[:]
    lby = lby_ref[:]
    uby = uby_ref[:]

    c0 = n_boxp
    c1 = n_boxp + cp
    c2 = n_boxp + 2 * cp

    lane0 = z[:, 0:1] * 0.0
    done0 = lane0
    k0 = lane0
    rbig = lane0 + 3.4e38

    def iterate(z, s, lam):
        """One single-split iteration; returns (z_next, s_new, lam_new,
        resid, ds)."""
        s_old = s
        # full-f32 precision: z is O(1), so a bf16-truncated product
        # would floor the residual at ~1e-3 (the delta-form w @ mc below
        # tolerates default precision because w -> 0)
        czd = jax.lax.dot(z, ct, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) - d
        y = -czd - rho_i * lam
        # box segment (pad lanes have [0, 0] bounds -> stay 0)
        ybox = jnp.minimum(jnp.maximum(y[:, :c0], blb), bub)
        y0 = y[:, c0:c1]
        y1 = y[:, c1:c2]
        y2 = y[:, c2:]
        if use_soc:
            y0, y1, y2 = _proj_ssoc_seg(y0, y1, y2, 1.0, 0.0)
        else:
            y0, y1, y2 = _proj_ssoc_seg(y0, y1, y2, 1.0, lby)
            y0, y1, y2 = _proj_ssoc_seg(y0, y1, y2, -1.0, uby)
        s_new = jnp.concatenate([ybox, y0, y1, y2], axis=1)
        resid = czd + s_new
        lam_new = lam + rho * resid
        ds = s_new - s_old
        w = rho * ds + rho * resid
        z_next = z + jax.lax.dot(w, mc,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)
        return z_next, s_new, lam_new, resid, ds

    def cond(carry):
        it, done = carry[0], carry[1]
        return jnp.logical_and(it < k_max, jnp.min(done) < 0.5)

    if check_every > 1 and exact_k:
        # exact-k free-run (kernels/fused_admm.py pattern, VERDICT r4
        # next-#5 extension): statically-unrolled windows snapshotting
        # each lane's (z, s, lam) at the start of its convergence
        # window, then a per-iteration replay with the exact-mode freeze
        # blending — k, e_flag and exit iterates bit-identical to the
        # check_every=1 path.
        kmaxf = float(k_max)

        def body_e(carry):
            (it, done, kws, z, s, lam, sz, ss, sl) = carry
            a = 1.0 - done
            na = done
            sz = a * z + na * sz
            ss = a * s + na * ss
            sl = a * lam + na * sl
            kws = a * (lane0 + it.astype(jnp.float32)) + na * kws
            for _ in range(check_every - 1):
                z, s, lam, _r, _d2 = iterate(z, s, lam)
            z_new, s_new, lam_new, resid, ds = iterate(z, s, lam)
            red_scratch[:, 0:1] = jnp.max(jnp.abs(resid), axis=1,
                                          keepdims=True)
            red_scratch[:, 1:2] = jnp.max(jnp.abs(ds), axis=1,
                                          keepdims=True)
            conv = ((red_scratch[:, 0:1] <= tol_p)
                    & (red_scratch[:, 1:2] <= tol_d)).astype(jnp.float32)
            done_out = jnp.maximum(done, a * conv)
            return (it + check_every, done_out, kws, z_new, s_new,
                    lam_new, sz, ss, sl)

        (_it, done_fr, kws, _z2, _s2, _l2, sz, ss, sl) = \
            jax.lax.while_loop(
                cond, body_e,
                (jnp.int32(0), done0, k0, z, s, lam, z, s, lam))

        budget = jnp.minimum(lane0 + float(check_every), kmaxf - kws)

        def body_r(j, carry):
            (convd, k2, z_cons, z_next, s, lam, rp, rd) = carry
            within = ((lane0 + j.astype(jnp.float32))
                      < budget).astype(jnp.float32)
            act = (1.0 - convd) * within
            na = 1.0 - act
            z_next2, s_new, lam_new, resid, ds = iterate(z_next, s, lam)
            red_scratch[:, 0:1] = jnp.max(jnp.abs(resid), axis=1,
                                          keepdims=True)
            red_scratch[:, 1:2] = jnp.max(jnp.abs(ds), axis=1,
                                          keepdims=True)
            r_p = red_scratch[:, 0:1]
            r_d = red_scratch[:, 1:2]
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            return (jnp.maximum(convd, act * conv), k2 + act,
                    act * z_next + na * z_cons,
                    act * z_next2 + na * z_next,
                    act * s_new + na * s, act * lam_new + na * lam,
                    act * r_p + na * rp, act * r_d + na * rd)

        convd, k2, z, _zn2, s, lam, rp, rd = jax.lax.fori_loop(
            0, check_every, body_r, (done0, kws, sz, sz, ss, sl,
                                     rbig, rbig))
        z_ref[:] = z
        s_ref[:] = s
        lam_ref[:] = lam
        k_ref[:] = k2.astype(jnp.int32)
        done_ref[:] = (convd > 0.5).astype(jnp.int32)
        rp_ref[:] = rp
        rd_ref[:] = rd
        return

    if check_every > 1:
        # free-running mode (fused_admm semantics): plain iterations
        # between checks, no freeze blending; the returned z is the
        # prepared iterate and k is recorded at check granularity
        def body_f(carry):
            it, done, k, z, s, lam, rp, rd = carry
            def fast(_i, c):
                zc, sc, lc = c
                zn, sn, ln, _r, _d2 = iterate(zc, sc, lc)
                return (zn, sn, ln)
            n_fast = jnp.minimum(check_every - 1, k_max - 1 - it)
            z, s, lam = jax.lax.fori_loop(0, n_fast, fast, (z, s, lam))
            z_new, s_new, lam_new, resid, ds = iterate(z, s, lam)
            red_scratch[:, 0:1] = jnp.max(jnp.abs(resid), axis=1,
                                          keepdims=True)
            red_scratch[:, 1:2] = jnp.max(jnp.abs(ds), axis=1,
                                          keepdims=True)
            r_p = red_scratch[:, 0:1]
            r_d = red_scratch[:, 1:2]
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            a = 1.0 - done
            k_out = k + a * (n_fast + 1).astype(jnp.float32)
            rp_out = a * r_p + done * rp
            rd_out = a * r_d + done * rd
            done_out = jnp.maximum(done, a * conv)
            return (it + n_fast + 1, done_out, k_out, z_new, s_new,
                    lam_new, rp_out, rd_out)

        _it, done, k, z, s, lam, rp, rd = jax.lax.while_loop(
            cond, body_f, (jnp.int32(0), done0, k0, z, s, lam,
                           rbig, rbig))
    else:
        # exact mode: per-iteration freeze blending; the returned z is the
        # CONSUMED iterate (dense masked-loop parity), carried separately
        # from the prepared one
        def body(carry):
            it, done, k, z_cons, z_next, s, lam, rp, rd = carry
            z_next2, s_new, lam_new, resid, ds = iterate(z_next, s, lam)
            red_scratch[:, 0:1] = jnp.max(jnp.abs(resid), axis=1,
                                          keepdims=True)
            red_scratch[:, 1:2] = jnp.max(jnp.abs(ds), axis=1,
                                          keepdims=True)
            r_p = red_scratch[:, 0:1]
            r_d = red_scratch[:, 1:2]
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            a = 1.0 - done
            na = done
            z_cons_out = a * z_next + na * z_cons
            z_next_out = a * z_next2 + na * z_next
            s_out = a * s_new + na * s
            lam_out = a * lam_new + na * lam
            k_out = k + a
            rp_out = a * r_p + na * rp
            rd_out = a * r_d + na * rd
            done_out = jnp.maximum(done, a * conv)
            return (it + 1, done_out, k_out, z_cons_out, z_next_out,
                    s_out, lam_out, rp_out, rd_out)

        _it, done, k, z, _zn, s, lam, rp, rd = jax.lax.while_loop(
            cond, body, (jnp.int32(0), done0, k0, z, z, s, lam,
                         rbig, rbig))

    z_ref[:] = z
    s_ref[:] = s
    lam_ref[:] = lam
    k_ref[:] = k.astype(jnp.int32)
    done_ref[:] = (done > 0.5).astype(jnp.int32)
    rp_ref[:] = rp
    rd_ref[:] = rd


def fused_hmpc_solve(z1, s0, lam0, CT_pad, MC_pad, d_pad, box_lb, box_ub,
                     lby, uby, *, rho: float, tol_p: float, tol_d: float,
                     k_max: int, use_soc: bool, n_boxp: int, cp: int,
                     tile_b: int = 256, check_every: int = 1,
                     exact_k: bool = False,
                     interpret: bool = False):
    """Run the fused single-split cone-ADMM loop in the segment layout.

    z1/lam carry dim_p lanes; s0/lam0/d/bounds carry ns_p = n_boxp + 3*cp
    lanes, all 128-multiples. Returns (z, s, lam, k [B], e_flag [B],
    r_p, r_d).

    NOTE on the iterate consumed at exit: the kernel's blending freezes a
    converged lane with the iterates of its LAST EXECUTED iteration, and
    in check_every==1 mode this matches the dense engine's masked-loop
    semantics exactly (same direct recursion); check_every>1 over-iterates
    between checks like fused_admm's free-running mode.
    """
    B, dim_p = z1.shape
    ns_p = s0.shape[1]
    assert dim_p % 128 == 0 and ns_p % 128 == 0 and B % tile_b == 0
    assert ns_p == n_boxp + 3 * cp
    grid = (B // tile_b,)
    kernel = functools.partial(
        _fused_hmpc_kernel, rho=float(rho), rho_i=float(1.0 / rho),
        tol_p=float(tol_p), tol_d=float(tol_d), k_max=k_max,
        use_soc=bool(use_soc), n_boxp=n_boxp, cp=cp,
        check_every=int(check_every), exact_k=bool(exact_k))

    ztile = pl.BlockSpec((tile_b, dim_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    stile = pl.BlockSpec((tile_b, ns_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec((dim_p, ns_p), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    mc_spec = pl.BlockSpec((ns_p, dim_p), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    srow = pl.BlockSpec((1, ns_p), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    boxrow = pl.BlockSpec((1, n_boxp), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    conerow = pl.BlockSpec((1, cp), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, dim_p), jnp.float32),
        jax.ShapeDtypeStruct((B, ns_p), jnp.float32),
        jax.ShapeDtypeStruct((B, ns_p), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
    )
    z, s, lam, k, done, rp, rd = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[ztile, stile, stile, ct_spec, mc_spec, srow,
                  boxrow, boxrow, conerow, conerow],
        out_specs=(ztile, stile, stile, lane, lane, lane, lane),
        scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.float32)],
        interpret=interpret,
    )(z1, s0, lam0, CT_pad, MC_pad, d_pad, box_lb, box_ub, lby, uby)
    k = k[:, 0]
    e_flag = jnp.where(done[:, 0] == 1, jnp.int32(1), jnp.int32(-1))
    return z, s, lam, k, e_flag, rp[:, 0], rd[:, 0]
