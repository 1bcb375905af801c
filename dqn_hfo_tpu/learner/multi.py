"""Multi-agent training: N learning agents in each env instance.

Reference mechanisms mapped (SURVEY.md §2 P1-P3):

- P1 thread-per-agent  ->  an agent axis: per-agent param pytrees stacked on
  a leading A axis, updated by a vmapped (independent) or unrolled (shared)
  learner step inside one jitted program.
- P2 shared replay (pointer aliasing + mutex, dqn.cpp:1081-1083) -> one
  replay whose env axis is the flattened (A, E) agent-env grid; "shared"
  means every agent samples the whole buffer, "unshared" restricts each
  agent to its own column block.  No locks: updates are pure.
- P3 cross-agent parameter sharing (ShareData on the first N param-bearing
  layers, agent 0 owner; dqn.cpp:1037-1079) -> two modes
  (MultiConfig.share_mode):

  * "serialized" (default): agent a's step starts from the prefix agent
    a-1 just wrote — the deterministic serialization of the reference's
    concurrent ShareData mutation; exact, order-dependent, cost linear
    in A.
  * "batched" (opt-in): every agent computes its update in ONE vmapped
    program from the SAME shared-prefix value, then the prefix deltas are
    summed once per iteration (prefix' = prefix + sum_a delta_a) and
    broadcast back — synchronous-hogwild semantics (the reference's agent
    threads mutate the ShareData blobs concurrently with no
    synchronization, dqn.cpp:1037-1046, so stale-read-accumulate is no
    further from its spec than serialization is), with A-independent
    program cost.  The two modes agree to first order in the learning
    rate — pinned under SGD, where the statement is exact
    (tests/test_multiagent.py::TestShareModes); under Adam the
    per-coordinate normalization amplifies the cross-agent staleness term
    into a direction-only agreement.  Round-5 measurements kept
    serialized as the default: batched moved the 2v2 coupled rate not at
    all (22.2k vs 22.8k env-steps/s — the path is latency-bound in the
    rollout and the sequential Adam iterations, not in the unroll) and
    its N-stale-deltas prefix dynamics underperformed on learning at A=3
    (3v3 warm 0.28 vs 0.56 serialized; RESULTS.md round 5).

HFO trials end for all agents simultaneously (one referee), so the done
mask is per-env and broadcasts across the agent axis.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu import spaces
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.agent import decode_action, select_actions
from dqn_hfo_tpu.learner.collector import CollectorState, WindowState
from dqn_hfo_tpu.learner.ddpg import (DDPGConfig, LearnerState, init_learner,
                                      make_optimizer, update_once)
from dqn_hfo_tpu.ops.returns import label_mask, mc_returns

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class MultiConfig:
    n_agents: int
    share_actor_layers: int = 0
    share_critic_layers: int = 0
    share_replay: bool = False
    # "serialized" (default): the agent-by-agent unroll — exact reference-
    # order semantics.  "batched": one vmapped program + once-per-iteration
    # prefix delta sum (the module docstring's deterministic analogue of
    # the reference's unsynchronized-concurrent ShareData mutation).
    # Round-5 measurements kept serialized as the default: batched did NOT
    # move the 2v2 coupled rate (22.2k vs 22.8k env-steps/s — the path is
    # latency-bound in the rollout and the sequential Adam iterations, not
    # in the unroll), and its accumulate-N-stale-deltas prefix dynamics
    # underperformed on learning at A=3 (3v3 warm: 0.28 batched vs 0.56
    # serialized r4; 2v2: 0.50/0.22 batched vs 0.51 serialized).
    share_mode: str = "serialized"


def init_multi_learner(key, dcfg: DDPGConfig, mcfg: MultiConfig):
    """Stacked LearnerState with leading agent axis A.

    With layer sharing, agent 0's arrays are broadcast into every agent's
    shared prefix (ShareParameters at startup, dqn_main.cpp:305-315)."""
    keys = jax.random.split(key, mcfg.n_agents)
    mls = jax.vmap(lambda k: init_learner(k, dcfg))(keys)
    if mcfg.share_actor_layers > 0 or mcfg.share_critic_layers > 0:
        mls = _broadcast_shared(mls, mcfg)
    return mls


def _shared_leaf_paths(params, n_layers: int):
    """Names of the first n param-bearing layers in net order."""
    names = []
    for i in range(len(params["tower"])):
        if len(names) >= n_layers:
            return names
        names.append(("tower", i))
    for head in ("action_head", "param_head", "q_head"):
        if head in params and len(names) < n_layers:
            names.append((head,))
    return names


def _copy_shared(src, dst, n_layers: int):
    """Return dst with its first n param-bearing layers replaced by src's."""
    if n_layers <= 0:
        return dst
    out = dict(dst)
    out["tower"] = list(dst["tower"])
    for path in _shared_leaf_paths(dst, n_layers):
        if path[0] == "tower":
            out["tower"][path[1]] = src["tower"][path[1]]
        else:
            out[path[0]] = src[path[0]]
    return out


def _reconcile_shared(base_stacked, new_stacked, n_layers: int):
    """Batched-share reconciliation of one net's stacked params.

    Entering the iteration, every agent's shared prefix holds the SAME
    value (invariant maintained by init/_broadcast_shared and by this
    function's broadcast).  Each agent then applied its own Adam update to
    its copy; the reconciled prefix accumulates all of them:
        prefix' = prefix + sum_a (prefix_a_new - prefix)
    and is broadcast back to every agent.  Non-shared leaves keep their
    per-agent values untouched."""
    if n_layers <= 0:
        return new_stacked
    template = jax.tree_util.tree_map(lambda x: x[0], new_stacked)
    out = dict(new_stacked)
    out["tower"] = list(new_stacked["tower"])
    for p in _shared_leaf_paths(template, n_layers):
        if p[0] == "tower":
            sub_b, sub_n = base_stacked["tower"][p[1]], out["tower"][p[1]]
        else:
            sub_b, sub_n = base_stacked[p[0]], out[p[0]]
        fixed = jax.tree_util.tree_map(
            lambda b, nw: jnp.broadcast_to(
                (b[0] + jnp.sum(nw - b[0][None], axis=0))[None], nw.shape),
            sub_b, sub_n)
        if p[0] == "tower":
            out["tower"][p[1]] = fixed
        else:
            out[p[0]] = fixed
    return out


def _broadcast_shared(mls: LearnerState, mcfg: MultiConfig) -> LearnerState:
    """Set every agent's shared prefix to agent 0's arrays (incl. targets)."""

    def bcast(net_stacked, n_layers):
        if n_layers <= 0:
            return net_stacked
        template = jax.tree_util.tree_map(lambda x: x[0], net_stacked)
        out = dict(net_stacked)
        out["tower"] = list(net_stacked["tower"])
        for p in _shared_leaf_paths(template, n_layers):
            sub = out["tower"][p[1]] if p[0] == "tower" else out[p[0]]
            fixed = jax.tree_util.tree_map(
                lambda s: jnp.broadcast_to(s[0][None], s.shape), sub)
            if p[0] == "tower":
                out["tower"][p[1]] = fixed
            else:
                out[p[0]] = fixed
        return out

    return mls._replace(
        actor=bcast(mls.actor, mcfg.share_actor_layers),
        critic=bcast(mls.critic, mcfg.share_critic_layers),
        actor_target=bcast(mls.actor_target, mcfg.share_actor_layers),
        critic_target=bcast(mls.critic_target, mcfg.share_critic_layers),
    )


# ---------------------------------------------------------------------------
# Rollout (multi-agent)
# ---------------------------------------------------------------------------

def init_multi_collector(venv, key, chunk_len: int,
                         n_agents: int) -> CollectorState:
    k_env, k_rng = jax.random.split(key)
    env_states, obs = venv.reset(k_env)       # obs (E, A, F)
    E = obs.shape[0]
    cols = n_agents * E
    window = WindowState(
        rewards=jnp.zeros((chunk_len, cols), F32),
        dones=jnp.ones((chunk_len, cols), bool),
        abs_ids=jnp.full((chunk_len,), -1, jnp.int32),
    )
    return CollectorState(
        env_states=env_states,
        obs=obs,                               # keep full (E, A, F)
        window=window,
        ep_return=jnp.zeros((E, n_agents), F32),
        rng=k_rng[None],
    )


def multi_rollout_chunk(cs: CollectorState, replay: rp.ReplayState,
                        actors_stacked, epsilon, venv, chunk_len: int,
                        gamma: float, n_agents: int, compute_dtype=None,
                        space=spaces.LOW_LEVEL):
    """Collect K steps for A agents x E envs; replay env axis is the (A, E)
    grid flattened agent-major (col = a*E + e)."""
    A = n_agents

    def step_fn(carry, _):
        env_states, counters, obs, replay, ep_ret, key = carry
        key, k_act = jax.random.split(key)
        # vmap over the agent axis (stacked params, per-agent obs column,
        # per-agent key): compile time and program size stay constant in A.
        actor_out = jax.vmap(
            lambda p, o, k: select_actions(p, o, k, epsilon,
                                           compute_dtype, space),
            in_axes=(0, 1, 0), out_axes=1,
        )(actors_stacked, obs, jax.random.split(k_act, A))  # (E, A, n_out)
        act, a1, a2, a3 = decode_action(actor_out, space)
        env_states, counters, obs2, info = venv.step_banked(
            env_states, counters, bank, act, a1, a2, a3)
        reward = info.reward                            # (E, A)
        done = info.done                                # (E,)

        # flatten to the (A*E,) replay env axis, agent-major
        def flat(x):  # (E, A, ...) -> (A*E, ...)
            return jnp.swapaxes(x, 0, 1).reshape((A * x.shape[0],) + x.shape[2:])

        replay, sid = rp.write_step(
            replay,
            flat(obs), flat(actor_out), flat(reward),
            flat(obs2), jnp.tile(done, A),
        )
        ep_ret = ep_ret + reward
        done_ret = jnp.where(done[:, None], ep_ret, 0.0)
        ep_ret = jnp.where(done[:, None], 0.0, ep_ret)
        stats = (
            flat(reward), jnp.tile(done, A), sid,
            jnp.sum(done.astype(jnp.int32)),
            jnp.sum(done_ret, axis=0),                      # (A,) per agent
            jnp.sum(jnp.where(done, info.steps, 0)),
            jnp.sum((done & (info.status == C.GOAL)).astype(jnp.int32)),
            jnp.sum((info.pass_reward > 0.5).astype(jnp.int32), axis=0),
        )
        return (env_states, counters, obs2, replay, ep_ret, key), stats

    # per-chunk reset bank, depth derived from chunk_len/frames_per_trial
    key0, k_bank = jax.random.split(cs.rng[0])
    bank = venv.make_reset_bank(k_bank, rounds=venv.bank_rounds(chunk_len))
    counters = jnp.zeros((cs.obs.shape[0],), jnp.int32)
    carry = (cs.env_states, counters, cs.obs, replay, cs.ep_return, key0)
    carry, ys = jax.lax.scan(step_fn, carry, None, length=chunk_len)
    env_states, counters, obs, replay, ep_ret, key = carry
    rews, dones, ids, n_eps, sum_ret, sum_steps, n_goals, n_passes = ys

    w_r = jnp.concatenate([cs.window.rewards, rews], axis=0)
    w_d = jnp.concatenate([cs.window.dones, dones], axis=0)
    w_i = jnp.concatenate([cs.window.abs_ids, ids], axis=0)
    targets = mc_returns(w_r, w_d, gamma)
    mask = label_mask(w_d, chunk_len)
    replay = rp.label_rows(replay, w_i, targets, mask)

    new_cs = CollectorState(
        env_states=env_states, obs=obs,
        window=WindowState(rewards=rews, dones=dones, abs_ids=ids),
        ep_return=ep_ret, rng=key[None],
    )
    metrics = {
        "episodes": jnp.sum(n_eps),
        "sum_episode_return": jnp.sum(sum_ret, axis=0),   # (A,) per agent
        "sum_episode_steps": jnp.sum(sum_steps),
        "goals": jnp.sum(n_goals),
        "passes": jnp.sum(n_passes, axis=0),              # (A,) per agent
        "env_steps": jnp.asarray(chunk_len * cs.obs.shape[0], jnp.int32),
    }
    return new_cs, replay, metrics


# ---------------------------------------------------------------------------
# Update (multi-agent)
# ---------------------------------------------------------------------------

def _agent_replay_view(replay: rp.ReplayState, agent: int, n_agents: int,
                       shared: bool) -> rp.ReplayState:
    """Restrict validity to one agent's column block unless shared."""
    if shared:
        return replay
    E = replay.valid.shape[1] // n_agents
    col = jax.lax.broadcasted_iota(jnp.int32, replay.valid.shape, 1)
    mine = (col >= agent * E) & (col < (agent + 1) * E)
    return replay._replace(valid=replay.valid & mine)


def multi_presample(replay: rp.ReplayState, dcfg: DDPGConfig,
                    mcfg: MultiConfig, keys, n_draws: int):
    """Per-agent presampled transition indices + data-holding flags.

    One validity-mask prefix-sum per AGENT per update burst instead of one
    per agent per scan step — the same frozen-buffer hoist ddpg.update_n
    applies (the buffer does not change during the burst, so presampling
    all draws up front is distributionally identical to per-iteration
    sampling; per-update sampling semantics: dqn.cpp:846, 501-509).

    Returns (idx (A, n_draws) i32, has_data (A,) bool)."""
    A = mcfg.n_agents

    def one(a, k):
        view = _agent_replay_view(replay, a, A, mcfg.share_replay)
        return rp.sample(view, k, n_draws), rp.valid_count(view) > 0

    return jax.vmap(one)(jnp.arange(A), keys)


def multi_update_once(mls: LearnerState, replay: rp.ReplayState,
                      dcfg: DDPGConfig, mcfg: MultiConfig, axis_name=None,
                      idx=None, has_data=None):
    """One iteration for every agent.

    Without sharing the agents are independent and run as ONE vmapped
    program over the agent axis (compile time and program size stay
    constant in A); with sharing, each agent's step starts from the shared
    prefix left by the previous agent — the deterministic serialization of
    the reference's concurrent ShareData mutation — which forces a
    sequential unroll.

    `axis_name` threads the data-parallel mesh axis into each agent's
    update (per-shard replay sampling + gradient aggregation, see
    ddpg.update_once); vmap over agents composes with the mesh collective.

    `idx` ((A, minibatch), optional) carries presampled per-agent
    transition indices and `has_data` ((A,) bool) the per-agent-view
    data-holding flags — multi_update_n hoists both out of its scan."""
    A = mcfg.n_agents
    shared = mcfg.share_actor_layers > 0 or mcfg.share_critic_layers > 0
    if not shared or mcfg.share_mode == "batched":
        if idx is None:
            def one(ls_a, a):
                view = _agent_replay_view(replay, a, A, mcfg.share_replay)
                return update_once(ls_a, view, dcfg, axis_name)

            stacked, (closs, avg_q, finite) = jax.vmap(one)(mls,
                                                            jnp.arange(A))
        elif has_data is None:
            def one(ls_a, idx_a):
                return update_once(ls_a, replay, dcfg, axis_name, idx=idx_a)

            stacked, (closs, avg_q, finite) = jax.vmap(one)(mls, idx)
        else:
            def one(ls_a, idx_a, hd_a):
                return update_once(ls_a, replay, dcfg, axis_name,
                                   idx=idx_a, has_data=hd_a)

            stacked, (closs, avg_q, finite) = jax.vmap(one)(mls, idx,
                                                            has_data)
        if shared:
            # once-per-iteration prefix reconciliation (_reconcile_shared):
            # all A agents read the same prefix, their deltas accumulate.
            stacked = stacked._replace(
                actor=_reconcile_shared(mls.actor, stacked.actor,
                                        mcfg.share_actor_layers),
                critic=_reconcile_shared(mls.critic, stacked.critic,
                                         mcfg.share_critic_layers),
                actor_target=_reconcile_shared(mls.actor_target,
                                               stacked.actor_target,
                                               mcfg.share_actor_layers),
                critic_target=_reconcile_shared(mls.critic_target,
                                                stacked.critic_target,
                                                mcfg.share_critic_layers),
            )
        return stacked, (jnp.mean(closs), jnp.mean(avg_q), jnp.all(finite))

    # --- share_mode == "serialized" (rounds 2-4 exact semantics) ---------
    idxs = [None] * A if idx is None else idx
    flags = [None] * A if has_data is None else has_data
    per_agent = [jax.tree_util.tree_map(lambda x: x[a], mls)
                 for a in range(A)]
    metrics = []
    for a in range(A):
        ls = per_agent[a]
        if a > 0:
            prev = per_agent[a - 1]
            ls = ls._replace(
                actor=_copy_shared(prev.actor, ls.actor,
                                   mcfg.share_actor_layers),
                critic=_copy_shared(prev.critic, ls.critic,
                                    mcfg.share_critic_layers),
                actor_target=_copy_shared(prev.actor_target, ls.actor_target,
                                          mcfg.share_actor_layers),
                critic_target=_copy_shared(prev.critic_target,
                                           ls.critic_target,
                                           mcfg.share_critic_layers),
            )
        if idxs[a] is None:
            view = _agent_replay_view(replay, a, A, mcfg.share_replay)
            ls, m = update_once(ls, view, dcfg, axis_name)
        else:
            ls, m = update_once(ls, replay, dcfg, axis_name,
                                idx=idxs[a], has_data=flags[a])
        per_agent[a] = ls
        metrics.append(m)
    # propagate the final shared prefix back to every agent
    if mcfg.share_actor_layers > 0 or mcfg.share_critic_layers > 0:
        last = per_agent[-1]
        for a in range(A - 1):
            per_agent[a] = per_agent[a]._replace(
                actor=_copy_shared(last.actor, per_agent[a].actor,
                                   mcfg.share_actor_layers),
                critic=_copy_shared(last.critic, per_agent[a].critic,
                                    mcfg.share_critic_layers),
                actor_target=_copy_shared(last.actor_target,
                                          per_agent[a].actor_target,
                                          mcfg.share_actor_layers),
                critic_target=_copy_shared(last.critic_target,
                                           per_agent[a].critic_target,
                                           mcfg.share_critic_layers),
            )
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_agent)
    closs = jnp.mean(jnp.stack([m[0] for m in metrics]))
    avg_q = jnp.mean(jnp.stack([m[1] for m in metrics]))
    finite = jnp.all(jnp.stack([m[2] for m in metrics]))
    return stacked, (closs, avg_q, finite)


def multi_update_n(mls, replay, dcfg: DDPGConfig, mcfg: MultiConfig,
                   n_updates, max_updates: int, axis_name=None):
    count = rp.valid_count(replay)
    n_shards = 1 if axis_name is None else jax.lax.psum(1, axis_name)
    if axis_name is not None:
        # all shards must agree on the gate or collectives would diverge
        count = jax.lax.psum(count, axis_name)
    enough = count >= dcfg.memory_threshold

    # Presample every agent's minibatches for the whole burst in one pass
    # (multi_presample): the buffer is frozen during the burst, so this is
    # equivalent to per-iteration sampling and removes A full-buffer
    # prefix-sums from every scan step.
    keys2 = jax.vmap(jax.random.split)(mls.rng)           # (A, 2, 2)
    new_rng, k_all = keys2[:, 0], keys2[:, 1]
    shard = (jax.lax.axis_index(axis_name) if axis_name is not None
             else 0)  # fold in the shard id (0 unsharded), see update_once
    k_all = jax.vmap(lambda k: jax.random.fold_in(k, shard))(k_all)
    all_idx, has_data = multi_presample(
        replay, dcfg, mcfg, k_all, max_updates * dcfg.minibatch)
    all_idx = all_idx.reshape(mcfg.n_agents, max_updates, dcfg.minibatch)
    if n_shards == 1:
        # zero-valid-shard guard only exists on real meshes (see update_once)
        has_data = None
    mls = mls._replace(rng=new_rng)

    def body(carry, xs):
        state = carry
        i, idx = xs  # idx (A, minibatch)
        do = (i < n_updates) & enough

        def run(s):
            return multi_update_once(s, replay, dcfg, mcfg, axis_name,
                                     idx=idx, has_data=has_data)

        def skip(s):
            return s, (jnp.asarray(0.0, F32), jnp.asarray(0.0, F32),
                       jnp.asarray(True))

        state, m = jax.lax.cond(do, run, skip, state)
        return state, m + (do,)

    mls, (losses, qs, finites, dids) = jax.lax.scan(
        body, mls,
        (jnp.arange(max_updates, dtype=jnp.int32),
         jnp.swapaxes(all_idx, 0, 1)))
    n_done = jnp.sum(dids.astype(jnp.int32))
    denom = jnp.maximum(n_done, 1)
    return mls, {
        "critic_loss": jnp.sum(losses) / denom,
        "avg_q": jnp.sum(qs) / denom,
        "updates": n_done,
        "finite": jnp.all(finites),
    }
