"""Fused dual-FISTA iteration as a Pallas TPU kernel — the FISTA analogue
of kernels/fused_admm.py, covering laxMPC-FISTA and equMPC-FISTA
(code_laxMPC_FISTA_C.c:323-390, code_equMPC_FISTA_C.c).

The dense engine's iteration is

    z    = clip(-Hinv (q_ref - y G), LB, UB)
    r    = b - z G'
    res  = ||r||_inf ; exit if res <= tol
    lam' = y + r Winv'
    t'   = (1 + sqrt(1 + 4 t^2)) / 2
    y    = lam' + ((t-1)/t') (lam' - lam)

which has an O(1)-operand matmul (y G) every iteration — on TPU that
product would need 6-pass full-f32 precision (see commit eff0082). The
kernel instead maintains q = q_ref - y G and r = b - z G' in DELTA form:

    q_next = q - (y_new - y) G        (dy -> 0)
    r_new  = r - (z_new - z) G'       (dz -> 0)

so every per-iteration matmul has shrinking operands and runs single-pass
at default MXU precision, with bounded accumulated error (the same
geometric-series argument as the delta-form ADMM kernels). The momentum
updates are masked off on the converging iteration exactly like the dense
engine (solvers/fista.py `keep` guard), so check_every=1 matches the
dense masked loop lane-for-lane.

Padding contract: nz and nlam pad to 128-lane multiples with zero rows/
cols in G/Winv, zero hinv and [0, 0] bounds on pad z lanes, zeros in
q_ref/b pads — all pad state stays exactly 0 and never enters the
residual norm.

Carry/layout rules follow fused_admm.py's Mosaic workarounds: f32
arithmetic blending, VMEM-scratch-laundered row-max reductions, carry
inits derived from loaded data.

STATUS: correctness path (bit-exact dense parity at check_every=1,
ALL CONVERGED in the TPU sweep). Measured throughput on the benchmark
fixture is ~0.9x the dense XLA loop (N=10 and N=30, tile_b=512,
check_every=8: 246-289k vs 277-291k solves/s): FISTA converges in ~30
iterations, so the dense loop's HBM streaming is well hidden and the
kernel pays three padded matmuls (nz and N*n pad to 128 multiples)
per iteration vs ADMM's one. The dense backend stays the default and
the bench path; the kernel wins only for problem sizes that fill the
128-lane tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spcies_tpu.kernels.fused_admm import _round_up


def _fused_fista_kernel(q1_ref, z0_ref, r0_ref, y0_ref, lam0_ref,
                        g_ref, gt_ref, winvt_ref, hinv_ref, lb_ref, ub_ref,
                        z_ref, y_ref, lam_ref, k_ref, done_ref, res_ref,
                        red_scratch,
                        *, tol, k_max, restart, check_every, fixed_iters,
                        exact_k=False):
    q = q1_ref[:]           # [tile_b, nzp]   q = q_ref - y G (current y)
    z_prev = z0_ref[:]      # [tile_b, nzp]   z of the previous iteration
    r = r0_ref[:]           # [tile_b, nlamp] r = b - z_prev G'
    y = y0_ref[:]
    lam = lam0_ref[:]
    g = g_ref[:]            # [nlamp, nzp]
    gt = gt_ref[:]          # [nzp, nlamp]
    winvt = winvt_ref[:]    # [nlamp, nlamp]
    hinv = hinv_ref[:]      # [1, nzp]
    lb = lb_ref[:]
    ub = ub_ref[:]

    lane0 = q[:, 0:1] * 0.0
    done0 = lane0
    k0 = lane0
    t0 = lane0 + 1.0
    rbig = lane0 + 3.4e38

    def iterate(q, z_prev, r, y, lam, t, res_prev):
        """One FISTA iteration; returns the full updated tuple plus the
        residual norm (laundered) and the convergence mask input."""
        z = jnp.minimum(jnp.maximum(-hinv * q, lb), ub)
        dz = z - z_prev
        r_new = r - jax.lax.dot(dz, gt,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        red_scratch[:, 0:1] = jnp.max(jnp.abs(r_new), axis=1, keepdims=True)
        res = red_scratch[:, 0:1]
        lam_new = y + jax.lax.dot(r_new, winvt,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT)
        t_cur = t
        if restart:
            # adaptive restart (O'Donoghue & Candes): momentum reset on
            # lanes whose residual increased (f32 blend, no bool select)
            inc = (res > res_prev).astype(jnp.float32)
            t_cur = inc * 1.0 + (1.0 - inc) * t
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t_cur * t_cur))
        coef = (t_cur - 1.0) / t_new
        y_new = lam_new + coef * (lam_new - lam)
        return z, r_new, lam_new, t_new, y_new, res

    if fixed_iters:
        def fast(_i, carry):
            q, z_prev, r, y, lam, t, res = carry
            z, r_new, lam_new, t_new, y_new, res = iterate(
                q, z_prev, r, y, lam, t, res)
            dy = y_new - y
            q_new = q - jax.lax.dot(dy, g,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            return (q_new, z, r_new, y_new, lam_new, t_new, res)
        q, z_prev, r, y, lam, _t, res = jax.lax.fori_loop(
            0, fixed_iters, fast, (q, z_prev, r, y, lam, t0, rbig))
        z_ref[:] = z_prev
        y_ref[:] = y
        lam_ref[:] = lam
        k_ref[:] = (lane0 + float(fixed_iters)).astype(jnp.int32)
        done_ref[:] = (lane0 + 1.0).astype(jnp.int32)
        res_ref[:] = res
        return

    def cond(carry):
        it, done = carry[0], carry[1]
        return jnp.logical_and(it < k_max, jnp.min(done) < 0.5)

    if check_every > 1 and exact_k:
        # exact-k free-run (ported from kernels/fused_admm.py, VERDICT r4
        # next-#5): run unrolled check_every windows snapshotting each
        # lane's FULL in-loop state (q, z_prev, r, y, lam, t, res_run) at
        # the start of the window it converges in, then REPLAY that
        # window per-iteration with the exact-mode (check_every=1)
        # semantics — converging-iteration momentum masking included — so
        # k, e_flag and the exit iterates are bit-identical to the dense
        # masked loop (solvers/fista.py) at free-run speed. Valid because
        # free-run and exact-mode iterates coincide up to each lane's
        # first tol hit; windows may overshoot k_max (outputs come from
        # the budget-capped replay).
        kmaxf = float(k_max)

        def body_e(carry):
            (it, done, kws, q, z_prev, r, y, lam, t, res_run,
             sq, sz, sr, sy, sl, st_, sres) = carry
            a = 1.0 - done
            na = done
            sq = a * q + na * sq
            sz = a * z_prev + na * sz
            sr = a * r + na * sr
            sy = a * y + na * sy
            sl = a * lam + na * sl
            st_ = a * t + na * st_
            sres = a * res_run + na * sres
            kws = a * (lane0 + it.astype(jnp.float32)) + na * kws
            # FISTA residuals OSCILLATE (unlike ADMM's near-monotone
            # decrease), so a lane can dip under tol mid-window and be
            # back above it at the window check — convergence must be
            # detected on the WINDOW-MINIMUM residual or the replay
            # targets the wrong window and k diverges from dense.
            res_min = rbig
            for _ in range(check_every - 1):
                z, r_new, lam_new, t_new, y_new, res_run = iterate(
                    q, z_prev, r, y, lam, t, res_run)
                res_min = jnp.minimum(res_min, res_run)
                dy = y_new - y
                q = q - jax.lax.dot(dy, g,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
                z_prev, r, y, lam, t = z, r_new, y_new, lam_new, t_new
            z, r_new, lam_new, t_new, y_new, res = iterate(
                q, z_prev, r, y, lam, t, res_run)
            res_min = jnp.minimum(res_min, res)
            conv = (res_min <= tol).astype(jnp.float32)
            dy = y_new - y
            q = q - jax.lax.dot(dy, g,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
            done_out = jnp.maximum(done, a * conv)
            return (it + check_every, done_out, kws, q, z, r_new, y_new,
                    lam_new, t_new, res, sq, sz, sr, sy, sl, st_, sres)

        def cond_e(carry):
            it, done = carry[0], carry[1]
            return jnp.logical_and(it < k_max, jnp.min(done) < 0.5)

        (_it, done_fr, kws, _q, _z, _r, _y, _lam, _t, _res,
         sq, sz, sr, sy, sl, st_, sres) = jax.lax.while_loop(
            cond_e, body_e,
            (jnp.int32(0), done0, k0, q, z_prev, r, y, lam, t0, rbig,
             q, z_prev, r, y, lam, t0, rbig))

        budget = jnp.minimum(lane0 + float(check_every), kmaxf - kws)

        def body_r(j, carry):
            (convd, k2, q, z_prev, r, y, lam, t, res_c) = carry
            within = ((lane0 + j.astype(jnp.float32))
                      < budget).astype(jnp.float32)
            prev_done = jnp.maximum(convd, 1.0 - within)
            z, r_new, lam_new, t_new, y_new, res = iterate(
                q, z_prev, r, y, lam, t, res_c)
            conv = (res <= tol).astype(jnp.float32)
            keep = jnp.maximum(conv, prev_done)
            lam_out = (1.0 - keep) * lam_new + keep * lam
            y_out = (1.0 - keep) * y_new + keep * y
            t_out = (1.0 - keep) * t_new + keep * t
            dy = y_out - y
            q_new = q - jax.lax.dot(dy, g,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            a = 1.0 - prev_done
            na = prev_done
            z_out = a * z + na * z_prev
            r_out = a * r_new + na * r
            q_out = a * q_new + na * q
            k2_out = k2 + a
            res_out = a * res + na * res_c
            convd_out = jnp.maximum(convd, a * conv)
            return (convd_out, k2_out, q_out, z_out, r_out, y_out,
                    lam_out, t_out, res_out)

        convd, k2, _q2, z_prev, _r2, y, lam, _t2, res = jax.lax.fori_loop(
            0, check_every, body_r,
            (done0, kws, sq, sz, sr, sy, sl, st_, sres))
        z_ref[:] = z_prev
        y_ref[:] = y
        lam_ref[:] = lam
        k_ref[:] = k2.astype(jnp.int32)
        done_ref[:] = (convd > 0.5).astype(jnp.int32)
        res_ref[:] = res
        return

    if check_every > 1:
        # free-running mode: plain iterations between checks; converged
        # lanes keep iterating until the tile drains, k recorded at check
        # granularity (fused_admm semantics)
        # res_run: the running residual fed to the restart comparison;
        # res_keep: the per-lane frozen residual at its recorded exit
        # (a done lane's res_run keeps updating as the tile drains and
        # must NOT overwrite the frozen value)
        def body_f(carry):
            (it, done, k, q, z_prev, r, y, lam, t, res_run,
             res_keep) = carry

            def fast(_i, c):
                q, z_prev, r, y, lam, t, res = c
                z, r_new, lam_new, t_new, y_new, res = iterate(
                    q, z_prev, r, y, lam, t, res)
                dy = y_new - y
                q_new = q - jax.lax.dot(
                    dy, g, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                return (q_new, z, r_new, y_new, lam_new, t_new, res)

            n_fast = jnp.minimum(check_every - 1, k_max - 1 - it)
            q, z_prev, r, y, lam, t, res_run = jax.lax.fori_loop(
                0, n_fast, fast, (q, z_prev, r, y, lam, t, res_run))
            z, r_new, lam_new, t_new, y_new, res = iterate(
                q, z_prev, r, y, lam, t, res_run)
            conv = (res <= tol).astype(jnp.float32)
            dy = y_new - y
            q_new = q - jax.lax.dot(dy, g,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            a = 1.0 - done
            k_out = k + a * (n_fast + 1).astype(jnp.float32)
            res_keep_out = a * res + done * res_keep
            done_out = jnp.maximum(done, a * conv)
            return (it + n_fast + 1, done_out, k_out, q_new, z, r_new,
                    y_new, lam_new, t_new, res, res_keep_out)

        (_it, done, k, _q, z_prev, _r, y, lam, _t, _rr, res) = \
            jax.lax.while_loop(cond, body_f,
                               (jnp.int32(0), done0, k0, q, z_prev, r,
                                y, lam, t0, rbig, rbig))
    else:
        # exact mode: dense-engine parity — the momentum block is masked
        # off on the converging iteration (keep = conv), plus per-lane
        # freeze blending after convergence
        def body(carry):
            it, done, k, q, z_prev, r, y, lam, t, res_c = carry
            z, r_new, lam_new, t_new, y_new, res = iterate(
                q, z_prev, r, y, lam, t, res_c)
            conv = (res <= tol).astype(jnp.float32)
            keep = jnp.maximum(conv, done)   # converging or already done
            lam_out = (1.0 - keep) * lam_new + keep * lam
            y_out = (1.0 - keep) * y_new + keep * y
            t_out = (1.0 - keep) * t_new + keep * t
            dy = y_out - y
            q_new = q - jax.lax.dot(dy, g,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            a = 1.0 - done
            na = done
            z_out = a * z + na * z_prev
            r_out = a * r_new + na * r
            q_out = a * q_new + na * q
            k_out = k + a
            res_out = a * res + na * res_c
            done_out = jnp.maximum(done, a * conv)
            return (it + 1, done_out, k_out, q_out, z_out, r_out,
                    y_out, lam_out, t_out, res_out)

        (_it, done, k, _q, z_prev, _r, y, lam, _t, res) = \
            jax.lax.while_loop(cond, body,
                               (jnp.int32(0), done0, k0, q, z_prev, r,
                                y, lam, t0, rbig))

    z_ref[:] = z_prev
    y_ref[:] = y
    lam_ref[:] = lam
    k_ref[:] = k.astype(jnp.int32)
    done_ref[:] = (done > 0.5).astype(jnp.int32)
    res_ref[:] = res


def fused_fista_solve(q1, z0, r0, y0, lam0, G_pad, GT_pad, WinvT_pad,
                      hinv_pad, LB_pad, UB_pad, *,
                      tol: float, k_max: int, restart: bool = False,
                      tile_b: int = 256, check_every: int = 1,
                      fixed_iters: int = 0, exact_k: bool = False,
                      interpret: bool = False):
    """Run the fused dual-FISTA loop. All arrays lane-padded to 128
    multiples (zero pads per the module contract), batch padded to a
    tile_b multiple. Returns (z, y, lam, k [B], e_flag [B], res [B])."""
    B, nzp = q1.shape
    nlamp = r0.shape[1]
    assert nzp % 128 == 0 and nlamp % 128 == 0 and B % tile_b == 0
    grid = (B // tile_b,)
    kernel = functools.partial(
        _fused_fista_kernel, tol=float(tol), k_max=int(k_max),
        restart=bool(restart), check_every=int(check_every),
        fixed_iters=int(fixed_iters or 0), exact_k=bool(exact_k))

    ztile = pl.BlockSpec((tile_b, nzp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    ltile = pl.BlockSpec((tile_b, nlamp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((nlamp, nzp), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    gt_spec = pl.BlockSpec((nzp, nlamp), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((nlamp, nlamp), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    zrow = pl.BlockSpec((1, nzp), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((B, nzp), jnp.float32),
        jax.ShapeDtypeStruct((B, nlamp), jnp.float32),
        jax.ShapeDtypeStruct((B, nlamp), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
    )
    z, y, lam, k, done, res = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[ztile, ztile, ltile, ltile, ltile, g_spec, gt_spec,
                  w_spec, zrow, zrow, zrow],
        out_specs=(ztile, ltile, ltile, lane, lane, lane),
        scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.float32)],
        interpret=interpret,
    )(q1, z0, r0, y0, lam0, G_pad, GT_pad, WinvT_pad, hinv_pad,
      LB_pad, UB_pad)
    k = k[:, 0]
    e_flag = jnp.where(done[:, 0] == 1, jnp.int32(1), jnp.int32(-1))
    return z, y, lam, k, e_flag, res[:, 0]
