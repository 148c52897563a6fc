"""A/B profile of the interleaved fused exact-k kernel (VERDICT r4 next-#1).

PROFILE_r04 concluded the headline kernel is latency-bound: each tiny
[tile_b, 256] x [256, 256] z-update matmul waits on the previous
projection, capping the f32 MXU rate at ~32% of peak. The structural
attack is `interleave`: split each tile into independent sub-chains whose
VPU bookkeeping can overlap the other chains' MXU matmuls
(kernels/fused_admm.py run_fast). This script measures the headline
benchmark config against interleave in {1, 2, 4} at tile_b in {128, 256}
in ONE session, so tunnel variance (PROFILE_r04 cross-run note: +-5%)
cannot masquerade as a speedup.

Writes one JSON line per config to PROFILE_r05_interleave.jsonl as results
arrive (remote compiles take minutes; partial output survives a kill).
"""

from __future__ import annotations

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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import spcies_tpu as sp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "PROFILE_r05_interleave.jsonl")

N = 30
BATCH = 32768
TOL = 1e-4
K_MAX = 1000
REPS = 7


def measure(tile_b, check_every, interleave, reps=REPS):
    sys_, param, st = sp.systems.tester_fixture()
    param30 = dict(param)
    param30["N"] = N
    o = sp.default_options("laxMPC", "ADMM", rho=10.0, tol=TOL,
                           k_max=K_MAX, relax_alpha=1.9, tile_b=tile_b,
                           check_every=check_every, exact_k=True,
                           interleave=interleave)
    o.precision = "float"
    s = sp.make_solver(sys_, param30, formulation="laxMPC", method="ADMM",
                       options=o, backend="fused")
    rng = np.random.default_rng(0)
    x0b = np.asarray(st["x"])[None, :] * rng.uniform(-2.0, 2.0, (BATCH, 1))
    X0 = jax.device_put(jnp.asarray(x0b, jnp.float32))
    XR = jax.device_put(jnp.asarray(np.tile(st["xr"], (BATCH, 1)),
                                    jnp.float32))
    UR = jax.device_put(jnp.asarray(np.tile(st["ur"], (BATCH, 1)),
                                    jnp.float32))
    t0 = time.time()
    res = s(X0, XR, UR)
    res.u.block_until_ready()
    compile_s = time.time() - t0
    k_mean = float(np.mean(np.asarray(res.k)))
    conv = float(np.mean(np.asarray(res.e_flag) == 1))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = s(X0, XR, UR)
        res.u.block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    return dict(tile_b=tile_b, check_every=check_every,
                interleave=interleave,
                solves_per_s=round(BATCH / dt, 1),
                solves_per_s_min=round(BATCH / times[-1], 1),
                solves_per_s_max=round(BATCH / times[0], 1),
                k_mean=round(k_mean, 1), converged_frac=round(conv, 4),
                compile_or_first_s=round(compile_s, 1))


def main():
    configs = [
        (128, 16, 1),    # r04 production headline (cached)
        (128, 16, 2),
        (128, 16, 4),
        (256, 16, 2),
        (256, 16, 4),
        (256, 16, 1),    # r03-frozen control config
    ]
    with open(OUT, "a") as f:
        f.write(json.dumps({"session_start": time.strftime("%F %T"),
                            "platform": jax.devices()[0].platform}) + "\n")
        f.flush()
        for tile_b, ce, il in configs:
            try:
                row = measure(tile_b, ce, il)
            except Exception as e:
                row = dict(tile_b=tile_b, check_every=ce, interleave=il,
                           error=str(e)[:300])
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
