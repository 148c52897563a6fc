"""Generic 'fused' backend builder for dense single-split box-ADMM solvers.

Any formulation whose z-step is a baked dense affine map and whose
projection is a box (laxMPC, equMPC, MPCT-ADMM-cs) runs the same
VMEM-resident Pallas loop (kernels/fused_admm.py): the affine offset only
enters through the peeled first solve z1, and the in-loop delta iteration
touches nothing but M_q and the bounds. This module adapts a formulation's
(q_ref, aux_b) builders onto that kernel.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from spcies_tpu.kernels.fused_admm import fused_admm_solve, _round_up
from spcies_tpu.solvers.common import SolveResult


def build_fused_box_admm_solve(ing, opt, dtype, *, make_q_ref, make_aux_b,
                               u_start: int, lb_key: str = "LB_z",
                               ub_key: str = "UB_z"):
    """Return a `_solve(*inputs, init, fixed_iters)` callable running the
    fused kernel for a dense box-ADMM formulation.

    make_q_ref(*inputs) -> [B, nz] linear cost; make_aux_b(*inputs) ->
    [B, nz] affine offset of the z-step (M_b terms); u = v[:, u_start :
    u_start + m].
    """
    if dtype != jnp.float32:
        raise ValueError("the fused backend is the fp32 production path; "
                         "use backend='dense' for fp64 verification")
    if not ing["rho_is_scalar"]:
        raise ValueError("the fused backend requires scalar rho")
    m, nz = ing["m"], ing["nz"]
    tol = float(opt.solver["tol"])
    k_max = int(opt.solver["k_max"])
    rho_f = float(ing["rho_scalar"])
    bf16 = bool(opt.solver.get("bf16_delta", False))
    interpret = bool(opt.solver.get("pallas_interpret", False))
    tile_b = int(opt.solver.get("tile_b", 256))
    relax_alpha = float(opt.solver.get("relax_alpha", 1.0))
    check_every = int(opt.solver.get("check_every", 1))
    # exact_k: free-run in check_every windows, then replay each lane's
    # convergence window with per-iteration checks — bit-exact dense
    # k/e_flag/exit iterates at free-run throughput (kernels/fused_admm.py)
    exact_k = bool(opt.solver.get("exact_k", False))
    # interleave: split each tile into independent sub-chains inside the
    # free-run windows so one chain's VPU bookkeeping overlaps another's
    # MXU matmul (the serial-latency-chain attack, PROFILE_r04)
    interleave = int(opt.solver.get("interleave", 1))
    # unroll_window (default ON): statically unroll the exact-k free-run
    # window — removes the inner loop's ~40%-of-iteration overhead
    # (MICROBENCH_r05); False restores the r04 looped window for A/B
    unroll_window = bool(opt.solver.get("unroll_window", True))
    # sort_lanes: order lanes by a difficulty proxy before tiling so each
    # tile drains at ~its own mean k instead of the global max. A tile
    # free-runs until its SLOWEST lane converges; with the bench k
    # distribution that wastes 1.49x k_mean of iterations, and sorting by
    # the initial primal residual recovers most of it (proxy-sorted tile
    # cost 190 vs 255 unsorted vs 181 oracle-sorted at tile_b=256).
    # Results are permuted back; in exact-k mode per-lane outputs are
    # bit-identical regardless of tile composition (the replay
    # reconstructs each lane's exit from its own window snapshots).
    sort_lanes = bool(opt.solver.get("sort_lanes", False))

    nzp = _round_up(nz, 128)
    M_q_pad = np.zeros((nzp, nzp), dtype=np.float32)
    M_q_pad[:nz, :nz] = ing["M_q"].T          # kernel does dq @ M_q_pad
    LB_pad = np.zeros((1, nzp), dtype=np.float32)
    UB_pad = np.zeros((1, nzp), dtype=np.float32)
    LB_pad[0, :nz] = np.maximum(ing[lb_key], -1e30)
    UB_pad[0, :nz] = np.minimum(ing[ub_key], 1e30)
    M_q_pad = jnp.asarray(M_q_pad)
    LB_pad = jnp.asarray(LB_pad)
    UB_pad = jnp.asarray(UB_pad)
    M_q = jnp.asarray(ing["M_q"], jnp.float32)
    rho = jnp.float32(rho_f)

    def _solve(*args):
        *inputs, init, fixed_iters = args
        Bsz = inputs[0].shape[0]
        q_ref = make_q_ref(*inputs)
        aux_b = make_aux_b(*inputs)
        if init is None:
            v0 = jnp.zeros((Bsz, nz), jnp.float32)
            lam0 = jnp.zeros((Bsz, nz), jnp.float32)
        else:
            _, v0, lam0 = init
        z1 = (q_ref + lam0 - rho * v0) @ M_q.T + aux_b

        order = None
        if sort_lanes and Bsz > tile_b:
            # difficulty proxy: the initial primal infeasibility
            # max|z1 - clip(z1)| (z1 is already in hand — zero extra
            # solves); monotone-ish in the eventual per-lane k
            LBv = jnp.asarray(LB_pad[0, :nz])
            UBv = jnp.asarray(UB_pad[0, :nz])
            proxy = jnp.max(
                jnp.abs(z1 - jnp.clip(z1, LBv, UBv)), axis=1)
            order = jnp.argsort(proxy)
            z1 = jnp.take(z1, order, axis=0)
            v0 = jnp.take(v0, order, axis=0)
            lam0 = jnp.take(lam0, order, axis=0)

        Bp = _round_up(Bsz, tile_b)
        pad_cfg = ((0, Bp - Bsz), (0, nzp - nz))
        z1p = jnp.pad(z1, pad_cfg)
        v0p = jnp.pad(v0, pad_cfg)
        lam0p = jnp.pad(lam0, pad_cfg)
        import jax as _jax
        with _jax.default_matmul_precision("default"):
            z, v, lam, k, e_flag, r_p, r_d = fused_admm_solve(
                z1p, v0p, lam0p, M_q_pad, LB_pad, UB_pad,
                rho=rho_f, tol_p=tol, tol_d=tol, k_max=k_max,
                tile_b=tile_b, bf16=bf16, relax_alpha=relax_alpha,
                check_every=check_every, exact_k=exact_k,
                interleave=interleave, unroll_window=unroll_window,
                fixed_iters=int(fixed_iters or 0), interpret=interpret)
        z, v, lam = z[:Bsz], v[:Bsz], lam[:Bsz]
        k, e_flag, r_p, r_d = k[:Bsz], e_flag[:Bsz], r_p[:Bsz], r_d[:Bsz]
        if order is not None:
            inv = jnp.argsort(order)
            z, v, lam = (jnp.take(a, inv, axis=0) for a in (z, v, lam))
            k, e_flag, r_p, r_d = (jnp.take(a, inv, axis=0)
                                   for a in (k, e_flag, r_p, r_d))
        return SolveResult(
            u=v[:, u_start:u_start + m], k=k, e_flag=e_flag,
            sol=dict(z=z[:, :nz], v=v[:, :nz], lam=lam[:, :nz],
                     r_p=r_p, r_d=r_d))

    return _solve
