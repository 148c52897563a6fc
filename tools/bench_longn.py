"""Long-horizon bench: the O(N) structured ('banded') backends vs their
dense counterparts at N in {30, 60, 120} — throughput AND device memory
(VERDICT r2 next-#6: committed evidence behind the docs/MPC.md memory
claims, the regime the reference's semiband/CSR-LDL machinery exists for,
compute_MPCT_ADMM_semiband_ingredients.m:163-227).

Each (family, backend, N) cell runs in a FRESH SUBPROCESS so
peak_bytes_in_use is a clean per-config measurement (one process = one
solver + one batch). Throughput uses fixed_iters so both backends do
identical iteration work regardless of convergence speed.

    python tools/bench_longn.py [--out BENCH_LONGN.json]
    python tools/bench_longn.py --single FAMILY BACKEND N   # one cell
"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FAMILIES = {
    # family: (backends, fixed solver kwargs)
    "laxMPC-ADMM": (("dense", "banded"), dict(rho=15.0, tol=1e-4,
                                              k_max=1000)),
    "MPCT-ADMM-cs": (("dense", "banded"), dict(rho=2.0, tol=1e-4,
                                               k_max=1000)),
    "MPCT-ADMM-semiband": (("dense", "banded"), dict(rho=0.5, tol_p=1e-4,
                                                     tol_d=1e-4,
                                                     k_max=1000)),
    "HMPC-ADMM-split": (("dense", "banded"), dict(rho=2.0, sigma=20.0,
                                                  tol_p=1e-4, tol_d=1e-4,
                                                  k_max=1000)),
}
NS = (30, 60, 120)
B = 4096
ITERS = 100


def run_single(family, backend, N):
    import time
    import numpy as np
    # persistent compile cache: each cell is a fresh process and pays
    # ~1-4 min of XLA compile otherwise; with the cache, resumed/repeated
    # runs skip straight to the measurement
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_cache_spcies")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import spcies_tpu as sp

    sys_, param, st = sp.systems.tester_fixture()
    param = dict(param)
    param["N"] = N
    backends, kw = FAMILIES[family]
    if family == "laxMPC-ADMM":
        make = lambda: sp.make_solver(
            sys_, param, formulation="laxMPC", method="ADMM",
            backend=backend, options=opts("laxMPC", "ADMM"))
    elif family == "MPCT-ADMM-cs":
        param["T"] = 10.0 * np.asarray(param["Q"])
        param["S"] = np.asarray(param["R"]).copy()
        make = lambda: sp.make_solver(
            sys_, param, formulation="MPCT", method="ADMM",
            submethod="cs", backend=backend,
            options=opts("MPCT", "ADMM", "cs"))
    elif family == "MPCT-ADMM-semiband":
        param["T"] = 10.0 * np.asarray(param["Q"])
        param["S"] = np.asarray(param["R"]).copy()
        make = lambda: sp.make_solver(
            sys_, param, formulation="MPCT", method="ADMM",
            submethod="semiband", backend=backend,
            options=opts("MPCT", "ADMM", "semiband"))
    elif family == "HMPC-ADMM-split":
        param.pop("T", None)
        param["w"] = 3 * 1.627 * 0.2
        param["Te"] = 10 * N * np.asarray(param["Q"])
        param["Th"] = param["Te"]
        param["Se"] = np.asarray(param["R"]).copy()
        param["Sh"] = 0.5 * param["Se"]
        make = lambda: sp.make_solver(
            sys_, param, formulation="HMPC", method="ADMM",
            submethod="split", backend=backend,
            options=opts("HMPC", "ADMM", "split"))

    def opts(f, m, sm=""):
        o = sp.default_options(f, m, sm, **kw)
        o.precision = "float"
        return o

    live0 = sum(a.nbytes for a in jax.live_arrays())
    solver = make()
    # device-resident online constants created by the builder (the axon
    # TPU plugin does not expose memory_stats, so ingredient memory is
    # measured as the live-device-array delta across the build)
    ingredient_bytes = sum(a.nbytes for a in jax.live_arrays()) - live0
    rng = np.random.default_rng(0)
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-1.5, 1.5, (B, 1))
    xr = np.tile(st["xr"], (B, 1))
    ur = np.tile(st["ur"], (B, 1))
    dev = lambda a: jax.device_put(jax.numpy.asarray(a, jax.numpy.float32))
    args = (dev(x0), dev(xr), dev(ur))

    res = solver(*args, fixed_iters=ITERS)
    jax.block_until_ready(res.u)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = solver(*args, fixed_iters=ITERS)
        jax.block_until_ready(res.u)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    stats = jax.local_devices()[0].memory_stats() or {}
    out = dict(
        family=family, backend=backend, N=N, batch=B, iters=ITERS,
        solves_per_s=round(B / dt, 1),
        lane_iters_per_s=round(B * ITERS / dt, 1),
        ingredient_bytes=int(ingredient_bytes),
        peak_bytes_in_use=int(stats.get("peak_bytes_in_use", -1)),
        platform=jax.devices()[0].platform,
    )
    print("RESULT " + json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--single", nargs=3, metavar=("FAMILY", "BACKEND", "N"))
    args = ap.parse_args()
    if args.single:
        run_single(args.single[0], args.single[1], int(args.single[2]))
        return
    rows = []
    # resume: keep completed cells from a previous (interrupted) run and
    # write incrementally after every cell, so a timeout loses one cell
    done = set()
    if args.out and os.path.exists(args.out):
        try:
            with open(args.out) as f:
                rows = [r for r in json.load(f)["rows"] if "error" not in r]
            done = {(r["family"], r["backend"], r["N"]) for r in rows}
        except Exception:
            rows = []

    def flush():
        if args.out:
            with open(args.out, "w") as f:
                json.dump(dict(batch=B, iters=ITERS, rows=rows), f,
                          indent=1)

    for family, (backends, _kw) in FAMILIES.items():
        for N in NS:
            for be in backends:
                if (family, be, N) in done:
                    continue
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--single", family, be, str(N)],
                    capture_output=True, text=True, timeout=1800)
                line = [ln for ln in p.stdout.splitlines()
                        if ln.startswith("RESULT ")]
                if p.returncode != 0 or not line:
                    rows.append(dict(family=family, backend=be, N=N,
                                     error=(p.stderr or p.stdout)[-400:]))
                    print(f"{family:22s} {be:7s} N={N:4d}  FAILED",
                          flush=True)
                    flush()
                    continue
                r = json.loads(line[0][len("RESULT "):])
                rows.append(r)
                print(f"{family:22s} {be:7s} N={N:4d}  "
                      f"{r['solves_per_s']:>10.1f} solves/s  "
                      f"peak={r['peak_bytes_in_use']/1e6:.1f} MB",
                      flush=True)
                flush()
    if args.out:
        flush()
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
