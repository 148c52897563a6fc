"""Roofline the headline kernel (VERDICT r3 next-#4).

Profiles the fused exact-k laxMPC-ADMM solve (the bench.py headline) on
the real chip:

1. measures a (tile_b, check_every) grid around the production config —
   the one attempted optimization, recorded before/after;
2. computes the per-lane-iteration FLOP and byte traffic analytically
   from the kernel's structure (everything VMEM-resident: the only HBM
   traffic is the per-tile load/store of z/v/lam and the M_q broadcast);
3. captures a jax.profiler trace of the best config when the platform
   supports it (the axon plugin may not — gated);
4. names the binding resource and writes PROFILE_r04.md + a JSON twin.

    python tools/profile_headline.py [--out PROFILE_r04]
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_spcies"))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import spcies_tpu as sp

N = 30
BATCH = 32768
TOL = 1e-4


def build(tile_b, check_every, bf16=True):
    sys_, param, st = sp.systems.tester_fixture()
    param = dict(param)
    param["N"] = N
    o = sp.default_options("laxMPC", "ADMM", rho=10.0, tol=TOL,
                           k_max=1000, relax_alpha=1.9, tile_b=tile_b,
                           check_every=check_every, exact_k=True,
                           bf16_delta=bf16)
    o.precision = "float"
    solver = sp.make_solver(sys_, param, formulation="laxMPC",
                            method="ADMM", options=o, backend="fused")
    rng = np.random.default_rng(0)
    x0 = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (BATCH, 1))
    dev = lambda a: jax.device_put(jax.numpy.asarray(a, jax.numpy.float32))
    args = (dev(x0), dev(np.tile(st["xr"], (BATCH, 1))),
            dev(np.tile(st["ur"], (BATCH, 1))))
    return solver, args


def measure(solver, args, reps=5):
    res = solver(*args)
    res.u.block_until_ready()
    k_mean = float(np.mean(np.asarray(res.k)))
    conv = float(np.mean(np.asarray(res.e_flag) == 1))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = solver(*args)
        res.u.block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    return dict(solves_per_s=round(BATCH / dt, 1),
                solves_per_s_min=round(BATCH / times[-1], 1),
                solves_per_s_max=round(BATCH / times[0], 1),
                k_mean=round(k_mean, 1), converged_frac=round(conv, 4),
                wall_s=round(dt, 4))


def _binding_prose(grid, nzp, achieved, f32_peak, bf16_peak):
    """Name the binding resource from the measured grid, not from
    assumptions: compare the bf16-vs-f32 pair (compute-bound kernels
    speed up with bf16; latency/VPU-bound ones do not) and the
    check_every axis (bookkeeping-bound kernels speed up with larger
    windows)."""
    b16 = grid.get("256x16xbf16", {}).get("solves_per_s")
    f32 = grid.get("256x16xf32", {}).get("solves_per_s")
    ce8 = grid.get("256x8xbf16", {}).get("solves_per_s")
    ce32 = grid.get("256x32xbf16", {}).get("solves_per_s")
    parts = []
    if b16 and f32:
        r = b16 / f32
        if r > 1.15:
            parts.append(
                f"bf16 M_q speeds the kernel {r:.2f}x over f32 — the "
                "per-iteration matmul is on the MXU critical path "
                "(compute/issue-bound), not hidden behind VPU work")
        else:
            parts.append(
                f"bf16 M_q changes throughput only {100*(r-1):+.0f}% — "
                "the MXU matmul is NOT the binding resource; the serial "
                "iteration dependency + VPU elementwise/bookkeeping set "
                "the pace")
    if ce8 and ce32:
        r = ce32 / ce8
        if r > 1.1:
            parts.append(
                f"stretching the check window 8->32 gains {100*(r-1):.0f}% "
                "— convergence bookkeeping (VMEM-scratch reductions + "
                "freeze blends) is a first-order cost")
        else:
            parts.append(
                f"check window 8->32 changes only {100*(r-1):+.0f}% — "
                "bookkeeping is already amortized")
    parts.append(
        f"achieved MXU rate is {100*achieved/f32_peak:.0f}% of f32 peak "
        f"({100*achieved/bf16_peak:.0f}% of bf16 peak): the residual gap "
        "is the serial dependency between iterations (each tiny "
        f"[tile_b,{nzp}]x[{nzp},{nzp}] matmul must finish before the "
        "next projection starts) — an algorithmic latency chain, not a "
        "resource shortage. HBM is out of the picture by construction "
        "(state is VMEM-resident; the dense XLA loop pays ~6 HBM passes "
        "per iteration instead).")
    return "; ".join(parts) + "."


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PROFILE_r04")
    cli = ap.parse_args()

    n, m = 6, 2
    nz = N * (n + m)
    nzp = ((nz + 127) // 128) * 128

    grid = {}
    base_name = "256x16xbf16"   # the r03 production config
    # two axes around the production config: the check-window (bookkeeping
    # amortization) and the matmul precision (MXU-bound test); the tile_b
    # axis is covered by the bench's free-run lane (512x8)
    cases = [(256, 8, True), (256, 16, True), (256, 32, True),
             (256, 8, False), (256, 16, False), (128, 8, False),
             (128, 16, False), (64, 8, False)]
    for tile_b, ce, bf16 in cases:
        key = f"{tile_b}x{ce}x{'bf16' if bf16 else 'f32'}"
        try:
            solver, args = build(tile_b, ce, bf16)
            grid[key] = measure(solver, args)
            print(f"{key}: {grid[key]['solves_per_s']:.0f} solves/s",
                  flush=True)
        except Exception as e:
            grid[key] = dict(error=str(e)[:160])
            print(f"{key}: FAILED", flush=True)

    ok = {k: v for k, v in grid.items() if "solves_per_s" in v}
    best_key = max(ok, key=lambda k: ok[k]["solves_per_s"])
    best = ok[best_key]
    base = ok.get(base_name, best)

    # optional profiler trace of the best config
    trace_dir = os.path.join(ROOT, "profile_trace")
    trace_ok = False
    try:
        tb, ce, prec = best_key.split("x")
        solver, args = build(int(tb), int(ce), prec == "bf16")
        solver(*args).u.block_until_ready()
        with jax.profiler.trace(trace_dir):
            solver(*args).u.block_until_ready()
        trace_ok = True
    except Exception as e:
        trace_err = str(e)[:200]

    # ---- analytic roofline ------------------------------------------
    # Per lane-iteration inside the kernel (all VMEM-resident):
    #   MXU:  dq[tile_b, nzp] @ M_q[nzp, nzp] -> 2*nzp^2 FLOP/lane
    #   VPU:  ~12 elementwise passes over [tile_b, nzp] (clip, dual,
    #         deltas, blends) -> ~12*nzp FLOP/lane
    #   VMEM traffic: ~8 state-array reads + ~5 writes of [tile_b, nzp]
    #         f32 -> ~13*4*nzp bytes/lane
    #   HBM traffic: per SOLVE (not per iteration): 3 inputs + ~5 outputs
    #         of [B, nzp] + the M_q broadcast per tile
    flops_mxu = 2.0 * nzp * nzp
    flops_vpu = 12.0 * nzp
    vmem_bytes = 13.0 * 4.0 * nzp
    lane_iters = best["solves_per_s"] * best["k_mean"]
    achieved_tflops = lane_iters * flops_mxu / 1e12
    achieved_vmem_gbs = lane_iters * vmem_bytes / 1e9
    # v5e (1 TensorCore): ~197 TFLOP/s bf16, ~49 TFLOP/s f32 MXU;
    # VPU ~ 4 FLOP/ALU x (8x128) x ~940 MHz ~ 3.9 TFLOP/s f32;
    # VMEM bandwidth O(10s TB/s), HBM ~ 819 GB/s.
    f32_peak = 49.0
    bf16_peak = 197.0

    record = dict(
        platform=jax.devices()[0].platform, N=N, batch=BATCH, nz=nz,
        nzp=nzp, grid=grid, best_config=best_key, best=best,
        production_config=base_name, production=base,
        lane_iters_per_s=round(lane_iters, 1),
        flops_per_lane_iter_mxu=flops_mxu,
        flops_per_lane_iter_vpu=flops_vpu,
        vmem_bytes_per_lane_iter=vmem_bytes,
        achieved_mxu_tflops=round(achieved_tflops, 2),
        achieved_vmem_gbs=round(achieved_vmem_gbs, 1),
        f32_mxu_peak_tflops=f32_peak, bf16_mxu_peak_tflops=bf16_peak,
        mxu_utilization_f32=round(achieved_tflops / f32_peak, 4),
        trace_captured=trace_ok,
    )
    with open(f"{cli.out}.json", "w") as f:
        json.dump(record, f, indent=1)

    lines = [
        "# PROFILE r04 — roofline of the fused exact-k headline kernel",
        "",
        f"Config: laxMPC-ADMM N={N}, B={BATCH}, fp32, fused exact-k "
        "(kernels/fused_admm.py). Grid = the one attempted optimization "
        "(VERDICT r3 next-#4): tile_b x check_every around the production "
        "config.",
        "",
        "| tile_b x check_every | solves/s (min..max) | k_mean |",
        "|---|---|---|",
    ]
    for key, v in grid.items():
        if "solves_per_s" in v:
            mark = (" **best**" if key == best_key else
                    (" (production)" if key == base_name
                     else ""))
            lines.append(
                f"| {key}{mark} | {v['solves_per_s']:.0f} "
                f"({v['solves_per_s_min']:.0f}..{v['solves_per_s_max']:.0f})"
                f" | {v['k_mean']} |")
        else:
            lines.append(f"| {key} | FAILED | — |")
    gain = (best["solves_per_s"] / base["solves_per_s"] - 1.0) * 100.0
    lines += [
        "",
        "## Analytic roofline (per lane-iteration, everything "
        "VMEM-resident)",
        "",
        f"- MXU work: `dq @ M_q` = 2·nzp² = **{flops_mxu/1e3:.1f} kFLOP** "
        f"(nzp = {nzp}, {nz} useful -> "
        f"{100.0 * (1 - (nz / nzp) ** 2):.0f}% of MXU MACs are padding)",
        f"- VPU work: ~12 elementwise passes = {flops_vpu/1e3:.2f} kFLOP",
        f"- VMEM traffic: ~13 array passes = {vmem_bytes/1e3:.2f} KB",
        "- HBM traffic: per SOLVE only (tile load/store + M_q broadcast) "
        "— the kernel's reason to exist; the dense XLA loop pays "
        "~6 HBM passes over [B, nz] EVERY iteration.",
        "",
        f"Measured (best config {best_key}): "
        f"{best['solves_per_s']:.0f} solves/s x k_mean {best['k_mean']} = "
        f"{lane_iters/1e6:.1f}M lane-iters/s",
        "",
        f"- achieved MXU rate: **{achieved_tflops:.1f} TFLOP/s** = "
        f"{100 * achieved_tflops / f32_peak:.0f}% of f32 MXU peak "
        f"(~{f32_peak:.0f} TFLOP/s on v5e); padded-useful fraction "
        f"{(nz / nzp) ** 2:.2f} puts useful work at "
        f"{achieved_tflops * (nz / nzp) ** 2:.1f} TFLOP/s",
        f"- implied VMEM traffic: {achieved_vmem_gbs/1e3:.2f} TB/s",
        "",
        "## Binding resource",
        "",
        _binding_prose(grid, nzp, achieved_tflops, f32_peak, bf16_peak),
        "",
        f"Grid outcome: best {best_key} vs production "
        f"{base_name}: **{gain:+.1f}%**.",
        "",
        f"Profiler trace captured: {trace_ok}"
        + ("" if trace_ok else " (axon plugin limitation: "
           + trace_err + ")"),
        "",
        f"JSON twin: {cli.out}.json",
    ]
    with open(f"{cli.out}.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {cli.out}.md / {cli.out}.json")


if __name__ == "__main__":
    main()
