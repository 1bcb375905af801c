"""Batched rollout collection: env stepping + replay ingestion + labeling.

Replaces the reference's per-episode rollout loop (PlayOneEpisode,
/root/reference/src/dqn_main.cpp:97-153) with a jitted `lax.scan` over K
lockstep steps of E auto-resetting envs.  Each step epsilon-greedily selects
ActorOutputs, decodes them (argmax-no-tackle), advances the envs, and writes
transitions into the on-device replay; once per chunk a label pass computes
on-policy MC returns for every episode that completed in the chunk
(LabelTransitions+AddTransitions equivalent, dqn.cpp:775-797) over a
two-chunk window.

Chunk length K must be >= frames_per_trial so any episode fits in the
window (enforced in the runtime config).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu import spaces
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.agent import decode_action, select_actions
from dqn_hfo_tpu.ops.returns import label_mask, mc_returns

F32 = jnp.float32


class WindowState(NamedTuple):
    """Previous chunk's per-step records (K, E)."""

    rewards: jnp.ndarray
    dones: jnp.ndarray
    abs_ids: jnp.ndarray  # (K,) i32 step ids; -1 = before history


class CollectorState(NamedTuple):
    env_states: Any
    obs: jnp.ndarray        # (E, F) current observations (agent 0)
    window: WindowState
    ep_return: jnp.ndarray  # (E,) running shaped return of current episode
    rng: Any                # (1,) key — leading axis so a mesh can shard it


def init_collector(venv, key, chunk_len: int) -> CollectorState:
    k_env, k_rng = jax.random.split(key)
    env_states, obs = venv.reset(k_env)
    E = obs.shape[0]
    window = WindowState(
        rewards=jnp.zeros((chunk_len, E), F32),
        dones=jnp.ones((chunk_len, E), bool),   # pretend-finished: no labels
        abs_ids=jnp.full((chunk_len,), -1, jnp.int32),
    )
    return CollectorState(
        env_states=env_states,
        obs=obs[:, 0, :],  # single learning agent
        window=window,
        ep_return=jnp.zeros((E,), F32),
        rng=k_rng[None],
    )


def rollout_chunk(cs: CollectorState, replay: rp.ReplayState, actor_params,
                  epsilon, venv, chunk_len: int, gamma: float,
                  compute_dtype=None, space=spaces.LOW_LEVEL):
    """Collect K steps, ingest into replay, label completed episodes.

    Returns (new CollectorState, new ReplayState, metrics dict of scalars).
    """

    def step_fn(carry, _):
        env_states, counters, obs, replay, ep_ret, key = carry
        key, k_act = jax.random.split(key)
        actor_out = select_actions(actor_params, obs, k_act, epsilon,
                                   compute_dtype, space)          # (E, n_out)
        action, a1, a2, a3 = decode_action(actor_out, space)
        env_states, counters, obs2_full, info = venv.step_banked(
            env_states, counters, bank, action[:, None], a1[:, None],
            a2[:, None], a3[:, None]
        )
        obs2 = obs2_full[:, 0, :]
        reward = info.reward[:, 0]
        terminal = info.done
        # obs2 for done envs is the fresh trial's first obs; the terminal
        # flag gates its use as next_state (dqn_main.cpp:138-140 stores
        # boost::none at terminals).
        replay, slots = rp.write_step(replay, obs, actor_out, reward, obs2,
                                      terminal)
        ep_ret = ep_ret + reward
        done_ret = jnp.where(terminal, ep_ret, 0.0)
        ep_ret = jnp.where(terminal, 0.0, ep_ret)
        stats = (
            reward,
            terminal,
            slots,
            jnp.sum(terminal.astype(jnp.int32)),                  # episodes
            jnp.sum(done_ret),                                    # returns
            jnp.sum(jnp.where(terminal, info.steps, 0)),          # steps
            jnp.sum((terminal & (info.status == C.GOAL)).astype(jnp.int32)),
            jnp.sum((info.pass_reward[:, 0] > 0.5).astype(jnp.int32)),
        )
        return (env_states, counters, obs2, replay, ep_ret, key), stats

    # Fresh trials come from a per-chunk reset bank (see step_banked); depth
    # derived from chunk_len / frames_per_trial (VecHFOEnv.bank_rounds).
    key0, k_bank = jax.random.split(cs.rng[0])
    bank = venv.make_reset_bank(k_bank, rounds=venv.bank_rounds(chunk_len))
    counters = jnp.zeros((cs.obs.shape[0],), jnp.int32)
    carry = (cs.env_states, counters, cs.obs, replay, cs.ep_return, key0)
    carry, ys = jax.lax.scan(step_fn, carry, None, length=chunk_len)
    env_states, counters, obs, replay, ep_ret, key = carry
    (rews, dones, ids, n_eps, sum_ret, sum_steps, n_goals, n_passes) = ys

    # Label pass over [prev chunk | this chunk].
    w_r = jnp.concatenate([cs.window.rewards, rews], axis=0)
    w_d = jnp.concatenate([cs.window.dones, dones], axis=0)
    w_i = jnp.concatenate([cs.window.abs_ids, ids], axis=0)
    targets = mc_returns(w_r, w_d, gamma)
    mask = label_mask(w_d, chunk_len)
    replay = rp.label_rows(replay, w_i, targets, mask)

    new_cs = CollectorState(
        env_states=env_states,
        obs=obs,
        window=WindowState(rewards=rews, dones=dones, abs_ids=ids),
        ep_return=ep_ret,
        rng=key[None],
    )
    metrics = {
        "episodes": jnp.sum(n_eps),
        "sum_episode_return": jnp.sum(sum_ret),
        "sum_episode_steps": jnp.sum(sum_steps),
        "goals": jnp.sum(n_goals),
        "passes": jnp.sum(n_passes),
        "env_steps": jnp.asarray(chunk_len * cs.obs.shape[0], jnp.int32),
    }
    return new_cs, replay, metrics
