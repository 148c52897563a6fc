"""Masked batched iteration engine.

The reference solves ONE problem with a data-dependent `while(done==0)` loop
(code_laxMPC_ADMM_C.c:308-633). Here the unit of work is a batch of B
independent problems living in one set of [B, ...] arrays; the loop is a
`lax.while_loop` that runs while ANY lane is still active, with per-lane
freeze masking: once a lane converges its state stops updating, so its final
iterates and iteration count are bit-identical to running it alone. This
preserves the reference's per-problem (k, e_flag) semantics
(code_laxMPC_ADMM_C.c:622-631) under batching.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _mask_like(mask, leaf):
    """Broadcast a [B] bool mask against a [B, ...] leaf."""
    return mask.reshape(mask.shape + (1,) * (leaf.ndim - 1))


def run_masked_loop(body: Callable, state0, k_max: int, batch: int,
                    fixed_iters: int | None = None,
                    history_keys: tuple = (),
                    freeze: bool = True):
    """Run `body` until every lane converges or k_max is hit.

    body(state, k) -> (new_state, conv[B] bool). `state` is any pytree whose
    leaves all have leading dim B. Returns (state, k[B], e_flag[B]) with
    k = iterations performed per lane (1-based, like the reference's k
    counter) and e_flag = 1 converged / -1 hit k_max.

    freeze=False runs FREE: converged lanes keep iterating (converging
    further) until the whole batch is done, instead of being frozen by
    per-leaf masking. Per-lane k still records the first iteration that
    met tolerance. This drops the mask-blend read of every state leaf
    every iteration — a large share of the loop's HBM traffic — at the
    cost of exact frozen-iterate parity (use freeze=True, the default,
    when iterates must match the reference's per-lane exit states).

    fixed_iters: if given, run exactly that many iterations with no
    convergence checks or masking (benchmark mode; avoids the per-iteration
    any-active reduction).

    history_keys: names of per-lane state entries to record per iteration —
    the reference's genHist traces (spcies_laxMPC_ADMM_solver.m:308-319).
    Scalar-per-lane entries ([B], e.g. residual norms) give the genHist=1
    level; full iterate entries ([B, nz], e.g. z/v/lam) give genHist=2.
    When non-empty the return is (state, k, e_flag, hist) with hist[key]
    of shape [B, k_max, ...]; entries past a lane's exit hold the frozen
    final value (consume with `k`).
    """
    if fixed_iters is not None and not history_keys:
        def fbody(_, state):
            new_state, _conv = body(state, _)
            return new_state
        state = jax.lax.fori_loop(0, fixed_iters, fbody, state0)
        k = jnp.full((batch,), fixed_iters, dtype=jnp.int32)
        return state, k, jnp.ones((batch,), dtype=jnp.int32)

    done0 = jnp.zeros((batch,), dtype=bool)
    k0 = jnp.zeros((batch,), dtype=jnp.int32)
    n_iter = fixed_iters if fixed_iters is not None else k_max
    hist0 = {key: jnp.zeros((n_iter,) + state0[key].shape,
                            dtype=state0[key].dtype)
             for key in history_keys}

    def cond(carry):
        it, done, _k, _state, _h = carry
        return jnp.logical_and(it < n_iter, jnp.logical_not(jnp.all(done)))

    def step(carry):
        it, done, k, state, hist = carry
        new_state, conv = body(state, it)
        active = jnp.logical_not(done)
        if fixed_iters is not None:
            state = new_state
            conv = jnp.zeros_like(conv)
        elif freeze:
            state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(_mask_like(active, new), new, old),
                new_state, state)
        else:
            state = new_state
        hist = {key: h.at[it].set(state[key])
                for key, h in hist.items()}
        k = jnp.where(active, it + 1, k)
        done = jnp.logical_or(done, jnp.logical_and(active, conv))
        return it + 1, done, k, state, hist

    _it, done, k, state, hist = jax.lax.while_loop(
        cond, step, (jnp.int32(0), done0, k0, state0, hist0))
    if fixed_iters is not None:
        e_flag = jnp.ones((batch,), dtype=jnp.int32)
    else:
        e_flag = jnp.where(done, jnp.int32(1), jnp.int32(-1))
    if history_keys:
        hist = {key: jnp.moveaxis(h, 0, 1) for key, h in hist.items()}
        return state, k, e_flag, hist
    return state, k, e_flag
