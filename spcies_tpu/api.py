"""Public entry point: make_solver — the analogue of the reference's
spcies_gen_controller.m "generate a solver" flow, except the product is a
jit-compiled batched TPU solve function instead of a C file.

The (formulation, method, submethod) -> builder dispatch mirrors the
reference's name-mangled `cons_*` eval dispatch
(spcies_gen_controller.m:111-130) via an explicit registry
(formulations.base.BUILDERS).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from spcies_tpu.config import Options, default_options


def broadcast_inputs(dtype, *arrays, core_ndims=None):
    """Promote per-call inputs to batched [B, ...] jnp arrays; single
    problems (core-rank arrays) get a singleton batch dim. All inputs must
    agree on B.

    core_ndims: per-input rank of one problem's data (default 1 — vectors;
    matrix inputs like the time-varying solvers' A are rank 2)."""
    if core_ndims is None:
        core_ndims = (1,) * len(arrays)
    out = []
    B = None
    for a, cnd in zip(arrays, core_ndims):
        a = jnp.asarray(a, dtype)
        if a.ndim == cnd:
            a = a[None]
        elif a.ndim != cnd + 1:
            raise ValueError(
                f"input must have rank {cnd} (one problem) or {cnd + 1} "
                f"(batched); got rank {a.ndim}")
        if B is None:
            B = a.shape[0]
        elif a.shape[0] == 1 and B > 1:
            a = jnp.broadcast_to(a, (B,) + a.shape[1:])
        elif a.shape[0] != B:
            if B == 1:
                B = a.shape[0]
                out = [jnp.broadcast_to(o, (B,) + o.shape[1:]) for o in out]
            else:
                raise ValueError("inconsistent batch sizes in solver inputs")
        out.append(a)
    return out


class BatchedSolver:
    """A generated batched solver: callable with (x0, xr, ur[, warm start]).

    Plays the role of the reference's generated MEX/C solver function
    `<formulation>_<method>(x0, xr, ur, ...) -> (u_opt, k, e_flag, sol)`
    (header_laxMPC_ADMM_C.h:24-28), but batched: inputs may be [n] (single
    problem) or [B, n].
    """

    def __init__(self, solve_fn, ingredients: dict, options: Options,
                 *, n: int, m: int, N: int, nz: int, dtype,
                 input_names=("x0", "xr", "ur"), default_inputs=(),
                 input_core_ndims=None, input_kinds=None):
        self.ingredients = ingredients
        self.options = options
        self.n, self.m, self.N, self.nz = n, m, N, nz
        self.dtype = dtype
        self.input_names = input_names
        # trailing optional inputs (e.g. the soc solvers' runtime radius,
        # code_ellipMPC_ADMM_soc_C.c:20 r_ellip) with their default values
        self.default_inputs = tuple(default_inputs)
        self.input_core_ndims = (tuple(input_core_ndims)
                                 if input_core_ndims is not None
                                 else (1,) * len(input_names))
        # per-input unit kind for the in_engineering scaling
        # ('x' | 'u' | 'xu' | 'xa' | 'ua' | None), defaulting to the
        # (x0, xr, ur) signature (code_laxMPC_ADMM_C.c:82-115). 'xa'/'ua'
        # are sinusoid AMPLITUDES (harmonic sine/cosine components): they
        # scale by Nx/Nu but carry no operating-point offset — for
        # x_eng(t) = xre + xrs sin + xrc cos, the incremental signal is
        # Nx(xre - opx) + (Nx xrs) sin + (Nx xrc) cos.
        if input_kinds is None:
            input_kinds = tuple(
                {"x0": "x", "xr": "x", "ur": "u", "LB": "xu",
                 "UB": "xu", "xre": "x", "ure": "u", "xrs": "xa",
                 "xrc": "xa", "urs": "ua", "urc": "ua"}.get(name)
                for name in input_names)
        self.input_kinds = tuple(input_kinds)
        self.n_inputs = len(input_names)
        # solve_fn(*inputs, init, fixed_iters) with static fixed_iters
        self.raw_fn = solve_fn
        self._jitted = jax.jit(solve_fn, static_argnums=(self.n_inputs + 1,))

        # engineering-units scaling; populated by make_solver from sys
        # (reference Nx/Nu/x0/u0 fields, +sp_utils/scale_ss.m)
        self._Nx = np.ones(n)
        self._Nu = np.ones(m)
        self._opx = np.zeros(n)
        self._opu = np.zeros(m)

    def set_engineering(self, sys: dict):
        """Install scaling vectors / operating point for in_engineering mode
        (sys fields Nx, Nu, x0, u0; spcies_gen_controller sys conventions)."""
        n, m = self.n, self.m
        self._Nx = np.asarray(sys.get("Nx", np.ones(n)), float).ravel()
        self._Nu = np.asarray(sys.get("Nu", np.ones(m)), float).ravel()
        self._opx = np.asarray(sys.get("x0", np.zeros(n)), float).ravel()
        self._opu = np.asarray(sys.get("u0", np.zeros(m)), float).ravel()

    def _to_incremental(self, inputs):
        """Engineering -> incremental units: x = Nx*(x_eng - opx) etc.
        (code_laxMPC_ADMM_C.c:82-99; TIME_VARYING bounds :93-97)."""
        out = []
        for a, kind in zip(inputs, self.input_kinds):
            if kind == "x":
                a = self._Nx * (np.asarray(a, float) - self._opx)
            elif kind == "u":
                a = self._Nu * (np.asarray(a, float) - self._opu)
            elif kind == "xa":
                a = self._Nx * np.asarray(a, float)
            elif kind == "ua":
                a = self._Nu * np.asarray(a, float)
            elif kind == "xu":
                a = np.asarray(a, float)
                sc = np.concatenate([self._Nx, self._Nu])
                op = np.concatenate([self._opx, self._opu])
                a = sc * (a - op)
            out.append(a)
        return tuple(out)

    def __call__(self, *inputs, init=None, fixed_iters=None):
        # Phase timing (Options.timing, the reference's MEASURE_TIME
        # contract: update/solve/polish/run ms stamps around the solve —
        # snippets/get_elapsed_time.c:12-15, docs/timing.md). On TPU the
        # hot loop is one device dispatch, so 'solve' wraps dispatch +
        # block_until_ready; timing=False keeps dispatch fully async.
        timer = None
        if self.options.timing:
            from spcies_tpu.diagnostics.timing import PhaseTimer
            timer = PhaseTimer()
        if len(inputs) < self.n_inputs:
            missing = self.n_inputs - len(inputs)
            if missing > len(self.default_inputs):
                raise TypeError(
                    f"solver expects inputs {self.input_names}, "
                    f"got {len(inputs)}")
            inputs = inputs + self.default_inputs[-missing:]
        elif len(inputs) > self.n_inputs:
            raise TypeError(
                f"solver expects inputs {self.input_names}, got {len(inputs)}")
        if self.options.in_engineering:
            inputs = self._to_incremental(inputs)
        inputs = broadcast_inputs(self.dtype, *inputs,
                                  core_ndims=self.input_core_ndims)
        if timer is not None:
            timer.mark("update")
        # TPU's default matmul precision truncates fp32 operands to
        # bfloat16; any solver matmul with O(1) operands (e.g. HMPC's
        # z @ C') then floors the residual at ~1e-3 and the iteration
        # never meets tol. Force full-f32 matmuls at trace time — the
        # explicit bf16 fast paths (bf16_delta) cast their operands
        # themselves and are unaffected.
        import jax as _jax
        with _jax.default_matmul_precision("highest"):
            res = self._jitted(*inputs, init, fixed_iters)
        if timer is not None:
            res = _jax.block_until_ready(res)
            timer.mark("solve")
        if self.options.in_engineering:
            # de-scale the control move (code_laxMPC_ADMM_C.c:642-651);
            # sol iterates stay in incremental units like the C DEBUG output
            import dataclasses as _dc
            res = _dc.replace(
                res, u=res.u / jnp.asarray(self._Nu, self.dtype)
                + jnp.asarray(self._opu, self.dtype))
        if timer is not None:
            timer.mark("polish")
            res.sol["times_ms"] = timer.finish()
        return res

    def solve(self, *inputs, **kw):
        return self(*inputs, **kw)

    def aot_memory_analysis(self, *inputs, init=None, fixed_iters=None):
        """AOT-compile the solve for the given (shapes of the) inputs and
        return XLA's memory analysis as a dict of byte counts
        (argument/output/temp/generated-code; peak = arg + out + temp -
        aliased). This is the measured-memory contract behind the O(N)
        long-horizon claims (BENCH_LONGN) — a compile-time number from the
        real executable, not a count of ingredient array sizes. Returns
        None when the backend does not expose memory_analysis."""
        if len(inputs) < self.n_inputs:
            inputs = inputs + self.default_inputs[
                -(self.n_inputs - len(inputs)):]
        inputs = broadcast_inputs(self.dtype, *inputs,
                                  core_ndims=self.input_core_ndims)
        with jax.default_matmul_precision("highest"):
            lowered = self._jitted.lower(*inputs, init, fixed_iters)
        try:
            ma = lowered.compile().memory_analysis()
        except Exception:
            return None
        if ma is None:
            return None
        try:
            out = dict(
                argument_bytes=int(ma.argument_size_in_bytes),
                output_bytes=int(ma.output_size_in_bytes),
                temp_bytes=int(ma.temp_size_in_bytes),
                alias_bytes=int(ma.alias_size_in_bytes),
                code_bytes=int(ma.generated_code_size_in_bytes),
            )
        except AttributeError:
            return None
        out["peak_bytes"] = (out["argument_bytes"] + out["output_bytes"]
                             + out["temp_bytes"] - out["alias_bytes"])
        return out


def make_solver(sys: dict, param: dict, *, formulation: str = "",
                method: str = "", submethod: str = "",
                options: Options | dict | None = None,
                backend: str = "dense", **solver_overrides) -> BatchedSolver:
    """Build a batched TPU solver for the given system + MPC parameters.

    sys:   dict with A, B, LBx, UBx, LBu, UBu (reference `sys` struct)
    param: dict with the formulation's ingredients (Q, R, N, ...; reference
           `param` struct). If formulation is omitted it is auto-detected
           from the param fields (+sp_utils/determine_formulation.m).
    """
    if not formulation and (options is None
                            or isinstance(options, dict)
                            or not options.formulation):
        from spcies_tpu.config import determine_formulation
        formulation = determine_formulation(param)
    if options is None:
        opt = default_options(formulation, method, submethod,
                              **solver_overrides)
    elif isinstance(options, dict):
        opt = Options(formulation=formulation, method=method,
                      submethod=submethod,
                      solver={**options, **solver_overrides})
    else:
        opt = options
        opt.formulation = opt.formulation or formulation
        if method:
            opt.method = method
        if submethod:
            opt.submethod = submethod
        opt.solver.update(solver_overrides)
        opt.resolve()

    if backend == "fused" and opt.debug:
        # genHist-style traces (debug=1/2) are recorded by the XLA masked
        # loop (solvers/loop.py); the fused VMEM-resident Pallas kernels
        # run the whole iteration on-chip and return only the exit state,
        # so per-iteration history is structurally unavailable there
        # (documented in docs/options.md)
        raise ValueError(
            "debug traces (genHist) are not available on backend='fused' "
            "— the VMEM-resident kernel returns only the exit state; use "
            "backend='dense' (or 'banded') for debug=1/2 runs")
    from spcies_tpu.formulations.base import get_builder
    builder = get_builder(opt.formulation, opt.method, opt.submethod)
    if backend == "auto":
        solver = _auto_backend(builder, sys, param, opt)
    else:
        solver = builder(sys, param, opt, backend=backend)
    if opt.in_engineering:
        solver.set_engineering(sys)
    return solver


def _auto_cache_path():
    import os
    root = os.environ.get(
        "SPCIES_AUTO_CACHE_DIR",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_spcies")))
    return os.path.join(root, "spcies_auto_backend.json")


def _auto_cache_load():
    import json
    import os
    path = _auto_cache_path()
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def _auto_cache_store(key, backend):
    import json
    import os
    path = _auto_cache_path()
    cache = _auto_cache_load()
    cache[key] = backend
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=0, sort_keys=True)
        os.replace(tmp, path)
    except Exception:
        pass     # cache is an optimization; never fail the build on it


def _auto_backend(builder, sys, param, opt) -> BatchedSolver:
    """backend='auto': build every available backend for the triple and
    pick the fastest by a short on-device probe (fixed-iteration batched
    solve, compile excluded). Exists because no static rule wins
    everywhere: the fused VMEM-resident kernels dominate at the N=30
    headline but lose to the dense XLA loop at tiny nz (the 128-lane
    padding penalty, e.g. nz=80 -> 37% dead lanes at the N=10 reference
    fixture), and the O(N) banded paths only pay off at long horizons.
    Probe knobs (solver options): auto_probe_batch (default 2048),
    auto_probe_iters (50), auto_probe_reps (3). The winning backend name
    lands in solver.backend_choice; per-candidate probe times in
    solver.backend_probe_s.

    The decision is PERSISTED on disk next to the XLA compile cache
    (VERDICT r4 next-#7), keyed by (triple, problem dims, chip kind,
    probe config): a second make_solver(..., backend='auto') for the same
    shape — even in a fresh process — builds only the winning backend and
    skips the probe entirely (solver.backend_probe_cached = True). Set
    auto_probe_batch to the production batch size to make the probe match
    the serving shape; pass auto_probe_refresh=True to force re-probing
    (the result overwrites the cached entry). Cache file:
    $SPCIES_AUTO_CACHE_DIR or $JAX_COMPILATION_CACHE_DIR or
    ~/.cache/jax_spcies, spcies_auto_backend.json."""
    import time
    probe_b = int(opt.solver.get("auto_probe_batch", 2048))
    probe_iters = int(opt.solver.get("auto_probe_iters", 50))
    probe_reps = int(opt.solver.get("auto_probe_reps", 3))

    n_ = np.asarray(sys["A"]).shape[0]
    m_ = np.asarray(sys["B"]).shape[1]
    dev = jax.devices()[0]
    key = "|".join(map(str, (
        opt.formulation, opt.method, opt.submethod, n_, m_,
        int(param.get("N", 0)), opt.precision, int(opt.time_varying),
        int(bool(opt.debug)),
        dev.platform, getattr(dev, "device_kind", "?"),
        probe_b, probe_iters, probe_reps)))
    if not opt.solver.get("auto_probe_refresh", False):
        cached = _auto_cache_load().get(key)
        # never serve a cached 'fused' winner to a debug build — genHist
        # traces are structurally unavailable on the fused kernels, which
        # is exactly why the probe path excludes them under debug
        if cached == "fused" and opt.debug:
            cached = None
        if cached is not None:
            try:
                solver = builder(sys, param, opt, backend=cached)
            except Exception:
                solver = None
            if solver is not None:
                solver.backend_choice = cached
                solver.backend_probe_s = {}
                solver.backend_probe_cached = True
                return solver

    candidates = {}
    for be in ("dense", "fused", "banded"):
        if be == "fused" and opt.debug:
            continue    # genHist traces are unavailable on fused
        try:
            candidates[be] = builder(sys, param, opt, backend=be)
        except Exception:
            continue
    if not candidates:
        raise ValueError("no backend could be built for this triple")
    if len(candidates) == 1:
        (be, solver), = candidates.items()
        solver.backend_choice = be
        solver.backend_probe_s = {}
        solver.backend_probe_cached = False
        _auto_cache_store(key, be)
        return solver

    times: dict[str, float] = {}
    for be, solver in candidates.items():
        inputs = []
        for kind in solver.input_kinds:
            if kind in ("x", "xa"):
                dim = solver.n
            elif kind in ("u", "ua"):
                dim = solver.m
            elif kind == "xu":
                dim = solver.n + solver.m
            else:
                break       # trailing unit-less inputs: use defaults
            inputs.append(np.zeros((probe_b, dim), solver.dtype))
        missing = solver.n_inputs - len(inputs)
        if missing:
            # trailing inputs without a unit kind (e.g. the soc runtime
            # radius) fall back to their registered defaults
            if missing > len(solver.default_inputs):
                times[be] = float("inf")
                continue
            inputs = inputs + [
                jnp.broadcast_to(jnp.asarray(d, solver.dtype),
                                 (probe_b,) + np.shape(d))
                for d in solver.default_inputs[-missing:]]
        try:
            res = solver(*inputs, fixed_iters=probe_iters)
            jax.block_until_ready(res.u)
            reps = []
            for _ in range(probe_reps):
                t0 = time.perf_counter()
                res = solver(*inputs, fixed_iters=probe_iters)
                jax.block_until_ready(res.u)
                reps.append(time.perf_counter() - t0)
            times[be] = sorted(reps)[len(reps) // 2]
        except Exception:
            times[be] = float("inf")
    best = min(times, key=times.get)
    if not np.isfinite(times[best]):
        raise ValueError("every candidate backend failed the auto probe")
    solver = candidates[best]
    solver.backend_choice = best
    solver.backend_probe_s = times
    solver.backend_probe_cached = False
    _auto_cache_store(key, best)
    return solver
