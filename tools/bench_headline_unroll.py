"""Measure the unrolled-window fused exact-k headline on the real chip.

Two timing methods per config:
  - bench-style: median of reps, block_until_ready per call (what
    bench.py does);
  - chained: R calls where each call's x0 input depends on the previous
    call's output (device must serialize), one tiny final transfer.
    Guards against the axon plugin's under-waiting block_until_ready
    (observed on small programs, tools/kernel_microbench.py).

Appends JSON lines to HEADLINE_UNROLL_r05.jsonl.
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

N = 30
BATCH = 32768
TOL = 1e-4
K_MAX = 1000


def measure(tile_b, check_every, reps=7, **extra):
    sys_, param, st = sp.systems.tester_fixture()
    param30 = dict(param)
    param30["N"] = N
    o = sp.default_options("laxMPC", "ADMM", rho=10.0, tol=TOL,
                           k_max=K_MAX, relax_alpha=1.9, tile_b=tile_b,
                           check_every=check_every, exact_k=True, **extra)
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
    np.asarray(res.k[:1])
    first = time.time() - t0
    k_mean = float(np.mean(np.asarray(res.k)))
    conv = float(np.mean(np.asarray(res.e_flag) == 1))

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = s(X0, XR, UR)
        res.u.block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    bench_dt = times[len(times) // 2]

    zero = jax.device_put(jnp.float32(0.0))
    n = X0.shape[1]

    def chain(R):
        x = X0
        t0 = time.perf_counter()
        for _ in range(R):
            r = s(x, XR, UR)
            x = X0 + zero * r.sol["z"][:, :n]
        np.asarray(r.k[:1])
        return time.perf_counter() - t0
    chain(1)
    cts = [chain(5) / 5 for _ in range(2)]
    chain_dt = min(cts)

    return dict(tile_b=tile_b, check_every=check_every,
                solves_per_s=round(BATCH / bench_dt, 1),
                solves_per_s_spread=[round(BATCH / times[-1], 1),
                                     round(BATCH / times[0], 1)],
                solves_per_s_chained=round(BATCH / chain_dt, 1),
                k_mean=round(k_mean, 1), converged_frac=round(conv, 4),
                first_s=round(first, 1))


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "HEADLINE_UNROLL_r05.jsonl")
    configs = [(128, 16), (128, 32), (128, 64), (256, 16), (256, 32),
               (512, 16)]
    with open(out, "a") as f:
        f.write(json.dumps({"session": time.strftime("%F %T")}) + "\n")
        for tb, ce in configs:
            try:
                row = measure(tb, ce)
            except Exception as e:
                row = dict(tile_b=tb, check_every=ce, error=str(e)[:300])
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
