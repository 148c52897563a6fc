"""Fused delta-form ADMM iteration as a Pallas TPU kernel.

The XLA-level ADMM loop streams z/v/lam (+ the dense M_q map) through HBM
every iteration: at the benchmark batch that is ~1 GB/s-class traffic per
solver state array and the solve becomes HBM-bound. This kernel runs the
ENTIRE iteration loop for a tile of lanes with all state resident in VMEM:

  per grid step (one batch tile):
    load z1 (the peeled first equality-QP solve), v0, lam0, M_q, bounds
    while any lane active and it < k_max:
        v      = clip(z + rho_i lam, LB, UB)
        lam   += rho (z - v)
        r_p    = rowmax |z - v| ; r_d = rowmax |v - v_prev|
        dq     = rho (z - 2 v + v_prev)          (delta form; dq -> 0)
        z_next = z + dq @ M_q                     (MXU, optionally bf16)
        freeze converged lanes (masked-loop semantics of solvers/loop.py)
    write z, v, lam, k, done

Padding contract: nz is padded to a multiple of 128 (lane tiling) with
zero rows/cols in M_q and [0, 0] bounds, so padded entries stay exactly 0
and never contribute to the residual norms. The batch is padded to the
tile size by the caller.

STATUS: production throughput path (the bench backend). Compiles and runs
correctly on TPU (k/e_flag/iterates match the dense backend; bit-exact in
interpret mode, tests/test_fused_admm.py) after three Mosaic while-carry
layout workarounds: (1) f32 arithmetic blending instead of narrow (B, 1)
int/bool selects, (2) a VMEM scratch store/load to launder the
lane-replicated row-max reduction layout, (3) carry inits derived from
loaded data (constants come out replicated and the carry join rejects the
relayout).

Performance history on the N=30 benchmark (tile_b=512): the exact
per-iteration-checked kernel measured ~199k solves/s vs ~413k for the
dense XLA loop — the convergence machinery (two row-max reductions through
the VMEM scratch + per-leaf freeze blending) dominated the tiny per-tile
matmul. With `check_every=C` (free-running mode: C-1 plain iterations
between checks — no reductions, no blending; converged lanes keep
iterating until the tile drains, per-lane k recorded at check granularity)
and over-relaxation, the kernel measures 486-758k solves/s vs ~320-450k
for the equally-tuned dense loop (~2.2x). The dense backend remains the
default for exact reference-iterate parity; the bench uses
backend='fused', tile_b=512, check_every=8.

exact_k mode (check_every=C, exact_k=True): free-run in C-iteration
windows while snapshotting each lane's window-start state, then replay
each lane's convergence window with per-iteration checks — recovering the
dense masked loop's exit semantics (reference code_laxMPC_ADMM_C.c:
570-631) at free-run speed. Bit-exact vs dense in interpret mode
(tests/test_fused_admm.py::test_fused_exact_k_free_run, including the
k_max-capped path); on TPU hardware 8191/8192 benchmark lanes match
dense k exactly (Mosaic-vs-XLA MXU accumulation order can flip a
tolerance-boundary lane). Measured N=30: 712k solves/s at tile_b=256,
C=16 with k_mean identical to dense (180.2) vs 450k dense — 1.58x at
exact exit semantics. The 3 snapshot arrays cost VMEM: tile_b=512 OOMs
(16.27M > 16M), use tile_b<=256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_admm_kernel(z1_ref, v0_ref, lam0_ref, mq_ref, lb_ref, ub_ref,
                       z_ref, v_ref, lam_ref, k_ref, done_ref,
                       rp_ref, rd_ref, red_scratch,
                       *, rho, rho_i, tol_p, tol_d, k_max, bf16,
                       alpha=1.0, check_every=1, fixed_iters=0,
                       exact_k=False, interleave=1, unroll_window=True):
    z = z1_ref[:]
    v = v0_ref[:]
    lam = lam0_ref[:]
    lb = lb_ref[:]
    ub = ub_ref[:]
    mq = mq_ref[:]
    tile_b = z.shape[0]
    z_next = z

    # Per-lane bookkeeping is (tile_b, 1) f32 with arithmetic blending
    # (x_out = a*new + (1-a)*old). The row-max reductions come out of
    # Mosaic in a lane-REPLICATED layout; routing them through a VMEM
    # scratch store+load materializes the standard layout, otherwise the
    # while-loop carry joins a replicated body output against a standard
    # init and Mosaic rejects the relayout.
    # carry inits derived from loaded data (slices of z) so they are in
    # the standard layout — jnp.zeros/full constants come out replicated
    # and the while-carry join would need an invalid relayout
    lane0 = z[:, 0:1] * 0.0
    done0 = lane0
    k0 = lane0
    rbig = lane0 + 3.4e38

    def cond(carry):
        it, done, _k, _z, _zn, _v, _lam, _rp, _rd = carry
        return jnp.logical_and(it < k_max, jnp.min(done) < 0.5)

    def body(carry):
        it, done, k, z, z_next, v, lam, rp, rd = carry
        zc = z_next
        v_prev = v
        # over-relaxation (solvers/admm.py relax_alpha): the z-iterate used
        # in the v/dual updates is alpha*z + (1-alpha)*v_prev
        zr = zc if alpha == 1.0 else alpha * zc + (1.0 - alpha) * v_prev
        y = zr + rho_i * lam
        v_new = jnp.minimum(jnp.maximum(y, lb), ub)
        dp = zc - v_new
        lam_new = lam + rho * (zr - v_new)
        red_scratch[:, 0:1] = jnp.max(jnp.abs(dp), axis=1, keepdims=True)
        red_scratch[:, 1:2] = jnp.max(jnp.abs(v_new - v_prev), axis=1,
                                      keepdims=True)
        r_p = red_scratch[:, 0:1]
        r_d = red_scratch[:, 1:2]
        conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
        dq = rho * (zr - 2.0 * v_new + v_prev)
        if bf16:
            zn = zc + jax.lax.dot(dq.astype(jnp.bfloat16),
                                  mq.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT)
        else:
            zn = zc + jax.lax.dot(dq, mq,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT)
        a = 1.0 - done                      # active mask, f32 {0, 1}
        na = done
        z_out = a * zc + na * z
        zn_out = a * zn + na * z_next
        v_out = a * v_new + na * v
        lam_out = a * lam_new + na * lam
        k_out = k + a
        rp_out = a * r_p + na * rp
        rd_out = a * r_d + na * rd
        done_out = jnp.maximum(done, a * conv)
        return (it + 1, done_out, k_out, z_out, zn_out, v_out, lam_out,
                rp_out, rd_out)

    def _vpu_phase(zc, v_prev, lam_c):
        zr = zc if alpha == 1.0 else alpha * zc + (1.0 - alpha) * v_prev
        y = zr + rho_i * lam_c
        v_new = jnp.minimum(jnp.maximum(y, lb), ub)
        lam_new = lam_c + rho * (zr - v_new)
        dq = rho * (zr - 2.0 * v_new + v_prev)
        return v_new, lam_new, dq

    def _mxu_phase(zc, dq):
        if bf16:
            return zc + jax.lax.dot(dq.astype(jnp.bfloat16),
                                    mq.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
        return zc + jax.lax.dot(dq, mq,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)

    def fast_body(_i, carry):
        z_next_c, v_c, lam_c = carry
        v_new, lam_new, dq = _vpu_phase(z_next_c, v_c, lam_c)
        zn = _mxu_phase(z_next_c, dq)
        return (zn, v_new, lam_new)

    def run_fast(z_next, v, lam, n_iters):
        """n_iters plain (uncheck ed) iterations. interleave > 1 attacks the
        serial iteration-latency chain (PROFILE_r04 "Binding resource"):
        the tile is split into `interleave` independent sub-chains carried
        as SEPARATE arrays across the window loop, and each loop body
        issues every chain's VPU phase before any chain's MXU matmul — the
        chains share no data, so the scheduler can overlap chain c+1's
        projection/dual bookkeeping (VPU) with chain c's z-update matmul
        (MXU) instead of serializing them. Split/join happens once per
        window (amortized over check_every iterations), not per iteration.
        Per-lane arithmetic is identical to interleave=1 (row-wise ops and
        per-row dot products don't change with sub-tiling), so results are
        bit-exact vs the single-chain path."""
        if interleave == 1:
            return jax.lax.fori_loop(0, n_iters, fast_body,
                                     (z_next, v, lam))
        h = tile_b // interleave
        cs = [slice(c * h, (c + 1) * h) for c in range(interleave)]
        nI = interleave
        carry = (tuple(z_next[s] for s in cs) + tuple(v[s] for s in cs)
                 + tuple(lam[s] for s in cs))

        def fb(_i, carry):
            zs = carry[:nI]
            vs = carry[nI:2 * nI]
            lams = carry[2 * nI:]
            vpu = [_vpu_phase(zs[c], vs[c], lams[c]) for c in range(nI)]
            zn = [_mxu_phase(zs[c], vpu[c][2]) for c in range(nI)]
            return (tuple(zn) + tuple(p[0] for p in vpu)
                    + tuple(p[1] for p in vpu))

        out = jax.lax.fori_loop(0, n_iters, fb, carry)
        return (jnp.concatenate(out[:nI], axis=0),
                jnp.concatenate(out[nI:2 * nI], axis=0),
                jnp.concatenate(out[2 * nI:], axis=0))

    if fixed_iters:
        # benchmark mode: exactly fixed_iters plain iterations, no exit
        # tests (run_masked_loop fixed_iters semantics)
        z_next, v, lam = run_fast(z_next, v, lam, fixed_iters)
        z_ref[:] = z_next
        v_ref[:] = v
        lam_ref[:] = lam
        k_ref[:] = (lane0 + float(fixed_iters)).astype(jnp.int32)
        done_ref[:] = (lane0 + 1.0).astype(jnp.int32)
        rp_ref[:] = rbig
        rd_ref[:] = rbig
        return

    if check_every > 1 and exact_k:
        # exact-k free-running mode: free-run in check_every windows like
        # the plain mode below, but snapshot each lane's state at the
        # start of the window it converges in; once the tile drains,
        # REPLAY that one window with per-iteration checks and freeze
        # blending. The replay runs the identical recursion from an
        # exactly-reproduced state, so k, e_flag and the frozen exit
        # iterates are bit-identical to the dense masked loop
        # (reference exit semantics, code_laxMPC_ADMM_C.c:570-631) at
        # free-run throughput plus one checked window.
        kmaxf = float(k_max)

        def body_e(carry):
            (it, done, kws, z_next, v, lam, snz, snv, snl) = carry
            a = 1.0 - done
            na = done
            # window-start snapshot for still-active lanes
            snz = a * z_next + na * snz
            snv = a * v + na * snv
            snl = a * lam + na * snl
            kws = a * (lane0 + it.astype(jnp.float32)) + na * kws
            # STATICALLY UNROLLED window (MICROBENCH_r05: the fori_loop's
            # per-iteration overhead is ~40% of the iteration — unroll8
            # runs 1.76x faster than the loop at identical math; interleave
            # and operand-leaning add nothing on top). The k_max clamp the
            # looped form needed is dropped: windows may overshoot k_max
            # in free-run, but every lane's OUTPUT (iterates, k, e_flag)
            # comes from the per-iteration replay below, whose budget
            # min(check_every, k_max - kws) cuts each lane off at exactly
            # k_max — results are bit-identical to the clamped form.
            # unroll_window=False keeps the looped window (A/B control).
            if unroll_window:
                for _ in range(check_every - 1):
                    z_next, v, lam = fast_body(0, (z_next, v, lam))
            else:
                n_fast = jnp.minimum(check_every - 1, k_max - 1 - it)
                z_next, v, lam = run_fast(z_next, v, lam, n_fast)
            # checked iteration (bookkeeping only)
            zc = z_next
            v_prev = v
            zr = zc if alpha == 1.0 else alpha * zc + (1.0 - alpha) * v_prev
            y = zr + rho_i * lam
            v_new = jnp.minimum(jnp.maximum(y, lb), ub)
            lam_new = lam + rho * (zr - v_new)
            red_scratch[:, 0:1] = jnp.max(jnp.abs(zc - v_new), axis=1,
                                          keepdims=True)
            red_scratch[:, 1:2] = jnp.max(jnp.abs(v_new - v_prev), axis=1,
                                          keepdims=True)
            conv = ((red_scratch[:, 0:1] <= tol_p)
                    & (red_scratch[:, 1:2] <= tol_d)).astype(jnp.float32)
            dq = rho * (zr - 2.0 * v_new + v_prev)
            if bf16:
                zn = zc + jax.lax.dot(dq.astype(jnp.bfloat16),
                                      mq.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32)
            else:
                zn = zc + jax.lax.dot(dq, mq,
                                      preferred_element_type=jnp.float32)
            done_out = jnp.maximum(done, a * conv)
            return (it + check_every, done_out, kws, zn, v_new, lam_new,
                    snz, snv, snl)

        def cond_e(carry):
            it, done = carry[0], carry[1]
            return jnp.logical_and(it < k_max, jnp.min(done) < 0.5)

        (_it, done_fr, kws, _zn, _v, _lam, snz, snv, snl) = \
            jax.lax.while_loop(
                cond_e, body_e,
                (jnp.int32(0), done0, k0, z_next, v, lam, z, v, lam))

        # replay the convergence window per-iteration from the snapshots
        budget = jnp.minimum(lane0 + float(check_every), kmaxf - kws)

        def body_r(j, carry):
            convd, k2, z_cons, z_next, v, lam, rp, rd = carry
            within = ((lane0 + j.astype(jnp.float32))
                      < budget).astype(jnp.float32)
            act = (1.0 - convd) * within
            na = 1.0 - act
            zc = z_next
            v_prev = v
            zr = zc if alpha == 1.0 else alpha * zc + (1.0 - alpha) * v_prev
            y = zr + rho_i * lam
            v_new = jnp.minimum(jnp.maximum(y, lb), ub)
            lam_new = lam + rho * (zr - v_new)
            red_scratch[:, 0:1] = jnp.max(jnp.abs(zc - v_new), axis=1,
                                          keepdims=True)
            red_scratch[:, 1:2] = jnp.max(jnp.abs(v_new - v_prev), axis=1,
                                          keepdims=True)
            r_p = red_scratch[:, 0:1]
            r_d = red_scratch[:, 1:2]
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            dq = rho * (zr - 2.0 * v_new + v_prev)
            if bf16:
                zn = zc + jax.lax.dot(dq.astype(jnp.bfloat16),
                                      mq.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32)
            else:
                zn = zc + jax.lax.dot(dq, mq,
                                      preferred_element_type=jnp.float32)
            z_cons_out = act * zc + na * z_cons
            z_next_out = act * zn + na * z_next
            v_out = act * v_new + na * v
            lam_out = act * lam_new + na * lam
            k2_out = k2 + act
            rp_out = act * r_p + na * rp
            rd_out = act * r_d + na * rd
            convd_out = jnp.maximum(convd, act * conv)
            return (convd_out, k2_out, z_cons_out, z_next_out, v_out,
                    lam_out, rp_out, rd_out)

        convd, k2, z, _zn2, v, lam, rp, rd = jax.lax.fori_loop(
            0, check_every, body_r,
            (done0, kws, snz, snz, snv, snl, rbig, rbig))
        z_ref[:] = z
        v_ref[:] = v
        lam_ref[:] = lam
        k_ref[:] = k2.astype(jnp.int32)
        done_ref[:] = (convd > 0.5).astype(jnp.int32)
        rp_ref[:] = rp
        rd_ref[:] = rd
        return

    if check_every > 1:
        # free-running mode: `check_every - 1` plain iterations (no
        # reductions, no blending) then one checked iteration that only
        # updates the (tile_b, 1) done/k bookkeeping. Converged lanes keep
        # iterating (converging further) until the tile drains; k is
        # recorded at check granularity.
        def cond_f(carry):
            it, done, _k, _zn, _v, _lam, _rp, _rd = carry
            return jnp.logical_and(it < k_max, jnp.min(done) < 0.5)

        def body_f(carry):
            it, done, k, z_next, v, lam, rp, rd = carry
            # clamp the block so the total iteration count never exceeds
            # k_max (k_max need not be divisible by check_every)
            n_fast = jnp.minimum(check_every - 1, k_max - 1 - it)
            z_next, v, lam = run_fast(z_next, v, lam, n_fast)
            # checked iteration
            zc = z_next
            v_prev = v
            zr = zc if alpha == 1.0 else alpha * zc + (1.0 - alpha) * v_prev
            y = zr + rho_i * lam
            v_new = jnp.minimum(jnp.maximum(y, lb), ub)
            dp = zc - v_new
            lam_new = lam + rho * (zr - v_new)
            red_scratch[:, 0:1] = jnp.max(jnp.abs(dp), axis=1,
                                          keepdims=True)
            red_scratch[:, 1:2] = jnp.max(jnp.abs(v_new - v_prev), axis=1,
                                          keepdims=True)
            r_p = red_scratch[:, 0:1]
            r_d = red_scratch[:, 1:2]
            conv = ((r_p <= tol_p) & (r_d <= tol_d)).astype(jnp.float32)
            dq = rho * (zr - 2.0 * v_new + v_prev)
            if bf16:
                zn = zc + jax.lax.dot(dq.astype(jnp.bfloat16),
                                      mq.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32)
            else:
                zn = zc + jax.lax.dot(dq, mq,
                                      preferred_element_type=jnp.float32)
            a = 1.0 - done
            k_out = k + a * (n_fast + 1).astype(jnp.float32)
            rp_out = a * r_p + done * rp
            rd_out = a * r_d + done * rd
            done_out = jnp.maximum(done, a * conv)
            return (it + n_fast + 1, done_out, k_out, zn, v_new, lam_new,
                    rp_out, rd_out)

        _it, done, k, z_next_f, v, lam, rp, rd = jax.lax.while_loop(
            cond_f, body_f, (jnp.int32(0), done0, k0, z_next, v, lam,
                             rbig, rbig))
        z = z_next_f
    else:
        _it, done, k, z, _zn, v, lam, rp, rd = jax.lax.while_loop(
            cond, body, (jnp.int32(0), done0, k0, z, z_next, v, lam,
                         rbig, rbig))

    z_ref[:] = z
    v_ref[:] = v
    lam_ref[:] = lam
    k_ref[:] = k.astype(jnp.int32)
    done_ref[:] = (done > 0.5).astype(jnp.int32)
    rp_ref[:] = rp
    rd_ref[:] = rd


def fused_admm_solve(z1, v0, lam0, M_q_pad, LB_pad, UB_pad, *,
                     rho: float, tol_p: float, tol_d: float, k_max: int,
                     tile_b: int = 256, bf16: bool = False,
                     relax_alpha: float = 1.0, check_every: int = 1,
                     fixed_iters: int = 0, exact_k: bool = False,
                     interleave: int = 1, unroll_window: bool = True,
                     interpret: bool = False):
    """Run the fused ADMM loop. All arrays must already be lane-padded to a
    multiple of 128 (zeros in M_q pad rows/cols, [0, 0] pad bounds) and
    batch-padded to a multiple of tile_b.

    interleave: number of independent sub-chains the fast-run path splits
    each tile into (1, 2 or 4); see run_fast in the kernel. Must divide
    tile_b with sub-chains of >= 8 rows (f32 sublane tile).

    Returns (z, v, lam, k [B], e_flag [B]).
    """
    B, nzp = z1.shape
    assert nzp % 128 == 0 and B % tile_b == 0
    interleave = int(interleave)
    assert (interleave >= 1 and tile_b % interleave == 0
            and (tile_b // interleave) % 8 == 0)
    grid = (B // tile_b,)
    kernel = functools.partial(
        _fused_admm_kernel, rho=float(rho), rho_i=float(1.0 / rho),
        tol_p=float(tol_p), tol_d=float(tol_d), k_max=k_max, bf16=bf16,
        alpha=float(relax_alpha), check_every=int(check_every),
        fixed_iters=int(fixed_iters or 0), exact_k=bool(exact_k),
        interleave=interleave, unroll_window=bool(unroll_window))

    tile_spec = pl.BlockSpec((tile_b, nzp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((nzp, nzp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, nzp), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
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
    out_specs = (tile_spec, tile_spec, tile_spec, lane_spec, lane_spec,
                 lane_spec, lane_spec)

    z, v, lam, k, done, rp, rd = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[tile_spec, tile_spec, tile_spec, full_spec,
                  row_spec, row_spec],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((tile_b, 2), jnp.float32)],
        interpret=interpret,
    )(z1, v0, lam0, M_q_pad, LB_pad, UB_pad)
    k = k[:, 0]
    e_flag = jnp.where(done[:, 0] == 1, jnp.int32(1), jnp.int32(-1))
    return z, v, lam, k, e_flag, rp[:, 0], rd[:, 0]
