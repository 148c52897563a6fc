"""Scaling-efficiency harness (SURVEY.md §7 step 7 / BASELINE.json
">=80% scaling efficiency" contract): solves/s at 1 device vs an N-device
mesh, batch sharded through the production shard_map path
(parallel/distributed.py — per-shard termination, zero per-iteration
collectives).

The measured engine is the PRODUCTION fused Pallas kernel in the exact
headline configuration (bench.py: laxMPC-ADMM N=30 fused exact-k), so the
recorded per-chip number through shard_map is directly comparable to the
BENCH headline (VERDICT r2 next-#1). --engine dense measures the XLA
dense loop instead.

On real multi-chip hardware run as-is; without it, set
XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu to
validate the sharding path. CAUTION: virtual CPU "devices" share the
host's physical cores, so on a virtual mesh even the efficiency ratio is
bounded by core count, not by the sharding design — use it only to check
that the sharded program compiles, executes and partitions correctly;
efficiency claims require real chips. (The shard_map program inserts no
cross-device communication at all — see tests/test_shard_map_solver.py
no-collective HLO assertions, dense AND fused — so on real chips the only
scaling losses are per-chip dispatch overheads.)

Usage:
    python bench_scaling.py [--out SCALING.json] [--engine fused|dense]
                            [--mode convergence|fixed]
Prints one JSON line per mesh size and optionally writes the full record.
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_solver(engine: str, N: int = 30):
    import spcies_tpu as sp

    sys_, param, st = sp.systems.tester_fixture()
    param = dict(param)
    param["N"] = N
    if engine == "fused":
        # the bench.py headline configuration (fused exact-k)
        opts = sp.default_options(
            "laxMPC", "ADMM", rho=10.0, tol=1e-4, k_max=1000,
            relax_alpha=1.9, tile_b=128,
            check_every=16, exact_k=True)   # f32, 128x16: PROFILE_r04 optimum
    else:
        opts = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-4,
                                  k_max=1000)
    opts.precision = "float"
    solver = sp.make_solver(sys_, param, formulation="laxMPC",
                            method="ADMM", options=opts,
                            backend=engine if engine == "fused" else "dense")
    return solver, st


def run(solver, st, mesh_devices, batch_per_device=2048, iters=150,
        convergence=True):
    import jax
    import spcies_tpu as sp

    from jax.sharding import NamedSharding

    mesh = sp.parallel.batch_mesh(mesh_devices)
    solve = sp.parallel.shard_map_solver(solver, mesh)

    B = batch_per_device * len(mesh_devices)
    rng = np.random.default_rng(0)
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    # device-resident, batch-sharded inputs placed ONCE — same contract as
    # bench.py (the metric is on-device solve throughput; the dev tunnel
    # adds tens of ms per host->device transfer, which would otherwise be
    # billed to every timed rep)
    sharding = NamedSharding(mesh, sp.parallel.batch_spec(mesh))
    x0, xr, ur = (jax.device_put(
        jax.numpy.asarray(a, solver.dtype), sharding) for a in (x0, xr, ur))

    fixed = None if convergence else iters
    res = solve(x0, xr, ur, fixed_iters=fixed)
    jax.block_until_ready(res.u)
    n_conv = int(np.sum(np.asarray(res.e_flag) == 1)) if convergence else B
    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = solve(x0, xr, ur, fixed_iters=fixed)
        jax.block_until_ready(res.u)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return B / dt, n_conv / B


def main(argv=None):
    import argparse
    import os
    # persistent XLA compile cache shared with bench.py / bench_longn.py
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_spcies"))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write the scaling record to this JSON file")
    ap.add_argument("--engine", default="fused",
                    choices=("fused", "dense"),
                    help="production fused kernel (default) or dense XLA")
    ap.add_argument("--mode", default="convergence",
                    choices=("fixed", "convergence"),
                    help="run-to-convergence (default, headline-comparable)"
                         " or fixed-iteration")
    ap.add_argument("--batch-per-device", type=int, default=32768,
                    help="lanes per device (default = bench.py headline "
                         "batch on one chip)")
    args = ap.parse_args(argv)

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    devs = jax.devices()
    conv = args.mode == "convergence"
    solver, st = make_solver(args.engine)
    base, conv_frac = run(solver, st, devs[:1],
                          batch_per_device=args.batch_per_device,
                          convergence=conv)
    out = [dict(devices=1, solves_per_s=round(base, 1), efficiency=1.0,
                converged_frac=round(conv_frac, 4))]
    n = 2
    while n <= len(devs):
        r, cf = run(solver, st, devs[:n],
                    batch_per_device=args.batch_per_device,
                    convergence=conv)
        out.append(dict(devices=n, solves_per_s=round(r, 1),
                        efficiency=round(r / (n * base), 3),
                        converged_frac=round(cf, 4)))
        n *= 2
    for row in out:
        print(json.dumps(row))
    if args.out:
        record = dict(
            platform=devs[0].platform,
            n_devices_available=len(devs),
            mode=args.mode,
            engine=args.engine,
            batch_per_device=args.batch_per_device,
            solver=("laxMPC-ADMM osc-masses N=30 fp32 "
                    + ("fused exact-k (bench headline config)"
                       if args.engine == "fused" else "dense XLA loop")),
            path="parallel.distributed.shard_map_solver",
            note=("virtual CPU devices share physical cores; efficiency "
                  "on a virtual mesh is core-bound, not a property of the "
                  "sharding (the compiled loop has no collectives)"
                  if devs[0].platform == "cpu" else
                  "real-chip run"),
            results=out,
        )
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
