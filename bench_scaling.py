"""Scaling-efficiency harness (SURVEY.md §7 step 7 / BASELINE.json
">=80% scaling efficiency" contract): solves/s at 1 device vs an N-device
mesh, batch sharded, collectives off the hot path.

On real multi-chip hardware run as-is; without it, set
XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu to
validate the sharding path. CAUTION: virtual CPU "devices" share the
host's physical cores, so on a virtual mesh even the efficiency ratio is
bounded by core count, not by the sharding design — use it only to check
that the sharded program compiles, executes and partitions correctly;
efficiency claims require real chips.

Prints one JSON line per mesh size.
"""

from __future__ import annotations

import json
import time

import numpy as np


def run(mesh_devices, batch_per_device=2048, N=30, iters=150):
    import jax
    import spcies_tpu as sp

    sys_, param, st = sp.systems.tester_fixture()
    param = dict(param)
    param["N"] = N
    opts = sp.default_options("laxMPC", "ADMM", rho=15.0, tol=1e-4,
                              k_max=1000)
    opts.precision = "float"
    solver = sp.make_solver(sys_, param, formulation="laxMPC",
                            method="ADMM", options=opts)
    mesh = sp.parallel.batch_mesh(mesh_devices)
    solve = sp.parallel.sharded_solver(solver, mesh)

    B = batch_per_device * len(mesh_devices)
    rng = np.random.default_rng(0)
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))

    res = solve(x0, xr, ur, fixed_iters=iters)
    res.u.block_until_ready()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = solve(x0, xr, ur, fixed_iters=iters)
    res.u.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return B / dt


def main():
    import os
    import jax
    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    devs = jax.devices()
    base = run(devs[:1])
    out = [dict(devices=1, solves_per_s=round(base, 1), efficiency=1.0)]
    n = 2
    while n <= len(devs):
        r = run(devs[:n])
        out.append(dict(devices=n, solves_per_s=round(r, 1),
                        efficiency=round(r / (n * base), 3)))
        n *= 2
    for row in out:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
