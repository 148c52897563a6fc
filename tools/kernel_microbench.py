"""Decompose the fused-ADMM iteration's time budget on the real chip.

PROFILE_r04 located the headline ceiling in "the serial iteration
dependency chain" at ~32% of f32 MXU peak, and VERDICT r4 next-#1 asks for
an interleaved two-chain kernel — measured in profile_interleave.py to be
inside the noise band (no win). This tool finds out WHY, by timing
stripped-down variants of the exact inner loop (same shapes, same
fori_loop structure, no convergence machinery):

  full        the production fast_body (14 VPU passes + matmul)
  mm-only     zn = zc + zc @ M — the matmul dependency chain alone
  vpu-only    all VPU phases, matmul replaced by zn = zc + dq
  lean        rho folded into M and lam carried as rho_i*lam (10 VPU ops)
  il2         interleave=2 (two independent sub-chains per body)
  il2-pipe    interleave=2 software-pipelined: dq carried across the back
              edge so both matmuls issue at body start from carry values
  unroll2     two iterations per body, single chain (loop-overhead probe)

If t(full) ~= t(mm-only) + t(vpu-only) the phases serialize and
interleaving SHOULD work (its failure is a scheduling artifact); if
t(full) ~= max(...) they already overlap and the ceiling is real work.

Usage: python tools/kernel_microbench.py [iters] — appends JSON lines to
MICROBENCH_r05.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_spcies"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NZP = 256
BATCH = 32768
RHO = 10.0
RHO_I = 0.1
ALPHA = 1.9


def _vpu(zc, v_prev, lam, lb, ub):
    zr = ALPHA * zc + (1.0 - ALPHA) * v_prev
    y = zr + RHO_I * lam
    v_new = jnp.minimum(jnp.maximum(y, lb), ub)
    lam_new = lam + RHO * (zr - v_new)
    dq = RHO * (zr - 2.0 * v_new + v_prev)
    return v_new, lam_new, dq


def _vpu_lean(zc, v_prev, l, lb, ub):
    """lam carried as l = rho_i * lam; rho folded into M."""
    zr = ALPHA * zc + (1.0 - ALPHA) * v_prev
    y = zr + l
    v_new = jnp.minimum(jnp.maximum(y, lb), ub)
    t = zr - v_new
    l_new = l + t
    dq = t + (v_prev - v_new)
    return v_new, l_new, dq


def _mm(zc, dq, mq):
    return zc + jax.lax.dot(dq, mq, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)


def make_kernel(variant, iters, tile_b):
    def kernel(z_ref, v_ref, lam_ref, mq_ref, lb_ref, ub_ref, out_ref):
        z = z_ref[:]
        v = v_ref[:]
        lam = lam_ref[:]
        mq = mq_ref[:]
        lb = lb_ref[:]
        ub = ub_ref[:]

        if variant == "full":
            def body(_, c):
                z, v, lam = c
                v_new, lam_new, dq = _vpu(z, v, lam, lb, ub)
                return (_mm(z, dq, mq), v_new, lam_new)
            z, v, lam = jax.lax.fori_loop(0, iters, body, (z, v, lam))
        elif variant == "mm-only":
            def body(_, c):
                z, v, lam = c
                return (_mm(z, z, mq), v, lam)
            z, v, lam = jax.lax.fori_loop(0, iters, body, (z, v, lam))
        elif variant == "vpu-only":
            def body(_, c):
                z, v, lam = c
                v_new, lam_new, dq = _vpu(z, v, lam, lb, ub)
                return (z + dq, v_new, lam_new)
            z, v, lam = jax.lax.fori_loop(0, iters, body, (z, v, lam))
        elif variant == "lean":
            def body(_, c):
                z, v, l = c
                v_new, l_new, dq = _vpu_lean(z, v, l, lb, ub)
                return (_mm(z, dq, mq), v_new, l_new)
            z, v, lam = jax.lax.fori_loop(0, iters, body,
                                          (z, v, RHO_I * lam))
            lam = RHO * lam
        elif variant in ("il2", "il2-lean"):
            h = tile_b // 2
            vp = _vpu_lean if variant == "il2-lean" else _vpu
            la = RHO_I * lam if variant == "il2-lean" else lam
            c0 = (z[:h], z[h:], v[:h], v[h:], la[:h], la[h:])

            def body(_, c):
                zA, zB, vA, vB, lA, lB = c
                vA2, lA2, dqA = vp(zA, vA, lA, lb, ub)
                vB2, lB2, dqB = vp(zB, vB, lB, lb, ub)
                return (_mm(zA, dqA, mq), _mm(zB, dqB, mq),
                        vA2, vB2, lA2, lB2)
            zA, zB, vA, vB, lA, lB = jax.lax.fori_loop(0, iters, body, c0)
            z = jnp.concatenate([zA, zB])
            v = jnp.concatenate([vA, vB])
            lam = jnp.concatenate([lA, lB])
            if variant == "il2-lean":
                lam = RHO * lam
        elif variant == "il2-pipe":
            # software pipeline: dq is carried, so both matmuls issue at
            # body start from carry values with no preceding VPU work
            h = tile_b // 2
            vA0, lA0, dqA0 = _vpu(z[:h], v[:h], lam[:h], lb, ub)
            vB0, lB0, dqB0 = _vpu(z[h:], v[h:], lam[h:], lb, ub)
            c0 = (z[:h], z[h:], vA0, vB0, lA0, lB0, dqA0, dqB0)

            def body(_, c):
                zA, zB, vA, vB, lA, lB, dqA, dqB = c
                znA = _mm(zA, dqA, mq)
                znB = _mm(zB, dqB, mq)
                vA2, lA2, dqA2 = _vpu(znA, vA, lA, lb, ub)
                vB2, lB2, dqB2 = _vpu(znB, vB, lB, lb, ub)
                return (znA, znB, vA2, vB2, lA2, lB2, dqA2, dqB2)
            zA, zB, vA, vB, lA, lB, _, _ = jax.lax.fori_loop(
                0, iters - 1, body, c0)
            z = jnp.concatenate([zA, zB])
            v = jnp.concatenate([vA, vB])
            lam = jnp.concatenate([lA, lB])
        elif variant.startswith("unroll"):
            spec = variant[len("unroll"):]
            if "-il2" in spec:
                u = int(spec.split("-")[0])
                h = tile_b // 2

                def body(_, c):
                    zA, zB, vA, vB, lA, lB = c
                    for _u in range(u):
                        vA2, lA2, dqA = _vpu(zA, vA, lA, lb, ub)
                        vB2, lB2, dqB = _vpu(zB, vB, lB, lb, ub)
                        zA, vA, lA = _mm(zA, dqA, mq), vA2, lA2
                        zB, vB, lB = _mm(zB, dqB, mq), vB2, lB2
                    return (zA, zB, vA, vB, lA, lB)
                c0 = (z[:h], z[h:], v[:h], v[h:], lam[:h], lam[h:])
                zA, zB, vA, vB, lA, lB = jax.lax.fori_loop(
                    0, iters // u, body, c0)
                z = jnp.concatenate([zA, zB])
                v = jnp.concatenate([vA, vB])
                lam = jnp.concatenate([lA, lB])
            elif "-lean" in spec:
                u = int(spec.split("-")[0])

                def body(_, c):
                    z, v, l = c
                    for _u in range(u):
                        v_new, l_new, dq = _vpu_lean(z, v, l, lb, ub)
                        z, v, l = _mm(z, dq, mq), v_new, l_new
                    return (z, v, l)
                z, v, lam = jax.lax.fori_loop(0, iters // u, body,
                                              (z, v, RHO_I * lam))
                lam = RHO * lam
            else:
                u = int(spec)

                def body(_, c):
                    z, v, lam = c
                    for _u in range(u):
                        v_new, lam_new, dq = _vpu(z, v, lam, lb, ub)
                        z, v, lam = _mm(z, dq, mq), v_new, lam_new
                    return (z, v, lam)
                z, v, lam = jax.lax.fori_loop(0, iters // u, body,
                                              (z, v, lam))
        else:
            raise ValueError(variant)
        out_ref[:] = z + v + lam
    return kernel


def measure(variant, iters=256, tile_b=128, reps=5):
    rng = np.random.default_rng(0)
    z = rng.standard_normal((BATCH, NZP)).astype(np.float32) * 0.1
    v = np.clip(z, -0.3, 0.3)
    lam = rng.standard_normal((BATCH, NZP)).astype(np.float32) * 0.01
    # a contractive map so iterates stay finite over `iters` iterations
    Mq = rng.standard_normal((NZP, NZP)).astype(np.float32)
    Mq *= 0.02 / np.abs(Mq).sum(axis=0, keepdims=True).max()
    lb = np.full((1, NZP), -0.3, np.float32)
    ub = np.full((1, NZP), 0.3, np.float32)

    tile = pl.BlockSpec((tile_b, NZP), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((NZP, NZP), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, NZP), lambda i: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        make_kernel(variant, iters, tile_b),
        grid=(BATCH // tile_b,),
        out_shape=jax.ShapeDtypeStruct((BATCH, NZP), jnp.float32),
        in_specs=[tile, tile, tile, full, row, row],
        out_specs=tile,
    )
    args = [jax.device_put(jnp.asarray(a))
            for a in (z, v, lam, Mq, lb, ub)]
    jfn = jax.jit(fn)
    t0 = time.time()
    out = jfn(*args)
    np.asarray(out[:1, :1])          # full sync through the tunnel
    first = time.time() - t0
    # CHAINED timing: the axon plugin's block_until_ready under-waits on
    # small programs (measured: 0.1 ms for a call whose device time is
    # ~10 ms), so async-dispatch timing is a lie here. Chaining each
    # call's output into the next call's input forces the device to
    # serialize the R calls; one tiny final transfer syncs. Chain
    # overhead is measured once via an R-vs-2R difference in the caller.
    def chain(R):
        cur = args[0]
        t0 = time.perf_counter()
        for _ in range(R):
            cur = jfn(cur, *args[1:])
        np.asarray(cur[:1, :1])
        return time.perf_counter() - t0
    chain(2)                          # warm the chain path
    times = [chain(reps) for _ in range(3)]
    dt = min(times) / reps
    lane_iters = BATCH * iters
    return dict(variant=variant, tile_b=tile_b, iters=iters,
                us_per_tile_iter=round(dt / (BATCH // tile_b) / iters * 1e6,
                                       4),
                lane_iters_per_s=round(lane_iters / dt / 1e6, 1),
                equiv_solves_per_s_k180=round(lane_iters / dt / 180.2, 1),
                dt_ms=round(dt * 1e3, 3),
                dt_all_ms=[round(t / reps * 1e3, 3) for t in times],
                first_s=round(first, 1))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MICROBENCH_r05.jsonl")
    variants = [("full", 128), ("unroll2", 128), ("unroll4", 128),
                ("unroll8", 128), ("unroll16", 128),
                ("unroll4-lean", 128), ("unroll8-lean", 128),
                ("unroll4-il2", 128),
                ("full", 256), ("unroll4", 256), ("unroll8", 256),
                ("unroll8-lean", 256), ("unroll16", 256)]
    with open(out_path, "a") as f:
        f.write(json.dumps({"session": time.strftime("%F %T"),
                            "iters": iters}) + "\n")
        for variant, tile_b in variants:
            try:
                row = measure(variant, iters=iters, tile_b=tile_b)
            except Exception as e:
                row = dict(variant=variant, tile_b=tile_b,
                           error=str(e)[:300])
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
