"""Fused multi-chunk train step: the TPU-native answer to the reference's
per-episode host loop (KeepPlayingGames, dqn_main.cpp:352-363).

One chunk = rollout (E envs x K steps) + int(E*K*update_ratio) learner
iterations.  Dispatching those as two programs per chunk and fetching ~10
scalar metrics each time costs a host<->device round trip per chunk — over
the TPU tunnel that dwarfs the on-chip work (a 512-update scan costs ~0.5ms;
the sync costs tens of ms).  The superstep scans up to `max_chunks` chunks
inside ONE jitted program — epsilon is computed in-graph from the learner
iteration (the dqn_main.cpp:65-71 schedule), so no host value is needed
between chunks — and stacks each chunk's scalar metrics into (max_chunks,)
rows fetched in a single transfer.  The host loop then replays the rows to
emit episode / smoothed-loss log lines at exactly the per-chunk cadence.

`n_active` is a runtime arg (chunks to the next eval/snapshot boundary), so
one compiled program serves every superstep length; inactive tail chunks
take the skip branch of a lax.cond and cost nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dqn_hfo_tpu.learner.agent import calculate_epsilon


def build_superstep(roll_fn, update_fn, updates_per_chunk: int,
                    final_epsilon: float, max_chunks: int):
    """Returns superstep(ls, cs, replay, n_active, explore)
    -> (ls, cs, replay, rows).

    roll_fn(cs, replay, actor_params, epsilon) -> (cs, replay, metrics)
    update_fn(ls, replay, n_updates)           -> (ls, update_metrics)

    `explore` (anneal length in iterations, dqn_main.cpp:65-71) and
    `anneal_start` (iteration the anneal counts from, 0 in the reference
    schedule) are RUNTIME scalars, not baked constants, so the host loop's
    adaptive anneal restart (runtime/loop.py,
    --explore_adaptive_threshold) changes the schedule without a
    recompile: epsilon = schedule(iter - anneal_start).

    rows: dict of (max_chunks, ...) arrays — the rollout metrics, the update
    metrics prefixed "u_", the post-chunk learner iteration "iter", and an
    "active" mask (False rows are zero-filled skips).
    """
    n_up = jnp.asarray(updates_per_chunk, jnp.int32)

    def one_chunk(carry, explore, anneal_start):
        ls, cs, replay = carry
        eff_iter = jnp.maximum(jnp.max(ls.iteration) - anneal_start, 0)
        eps = calculate_epsilon(eff_iter, explore, final_epsilon)
        cs, replay, m = roll_fn(cs, replay, ls.actor, eps)
        ls, um = update_fn(ls, replay, n_up)
        out = dict(m)
        out.update({f"u_{k}": v for k, v in um.items()})
        out["iter"] = jnp.max(ls.iteration)
        out["active"] = jnp.asarray(True)
        return (ls, cs, replay), out

    def superstep(ls, cs, replay, n_active, explore, anneal_start):
        carry = (ls, cs, replay)
        chunk = lambda c: one_chunk(c, explore, anneal_start)
        out_sds = jax.eval_shape(lambda c: chunk(c)[1], carry)
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_sds)
        zeros["u_finite"] = jnp.asarray(True)  # skipped chunk is not a NaN

        def body(carry, i):
            return jax.lax.cond(i < n_active, chunk,
                                lambda c: (c, zeros), carry)

        carry, rows = jax.lax.scan(
            body, carry, jnp.arange(max_chunks, dtype=jnp.int32))
        ls, cs, replay = carry
        return ls, cs, replay, rows

    return superstep
