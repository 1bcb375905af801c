"""Batched policy evaluation — the reference's Evaluate(), vectorized.

Reference (/root/reference/src/dqn_main.cpp:171-204): play repeat_games(100)
episodes at evaluate_with_epsilon(0) without updates; report avg/std of
reward and steps (Bessel-corrected), avg/std steps of successful trials, and
goal_perc — the HiScore model-selection metric.

Here: repeat_games envs run in lockstep with absorbing termination for
frames_per_trial steps — one jitted scan, exactly repeat_games episodes.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu import spaces as sp_mod
from dqn_hfo_tpu.env.hfo_env import VecHFOEnv
from dqn_hfo_tpu.learner.agent import decode_action, select_actions


def _eval_scan(actor_params, key, venv: VecHFOEnv, n_steps: int,
               epsilon: float, compute_dtype=None,
               space=sp_mod.LOW_LEVEL, n_agents: int = 1,
               critic_params=None):
    """actor_params: single pytree (n_agents==1) or stacked leading-A.

    With `critic_params` given, also returns a per-step (action, q) trace of
    env 0 — the EvaluateAction Q the reference VLOGs every live step
    (dqn_main.cpp:124-128)."""
    k_env, k_act = jax.random.split(key)
    states, obs = venv.reset(k_env)

    def select(obs, key):
        if n_agents == 1:
            out = select_actions(actor_params, obs[:, 0, :], key, epsilon,
                                 compute_dtype, space)
            return out[:, None, :]
        return jax.vmap(
            lambda p, o, k: select_actions(p, o, k, epsilon,
                                           compute_dtype, space),
            in_axes=(0, 1, 0), out_axes=1,
        )(actor_params, obs, jax.random.split(key, n_agents))

    def q_of(obs, actor_out):
        """Per-agent Q of env 0's state/action (EvaluateAction trace)."""
        from dqn_hfo_tpu.models.nets import critic_apply
        if n_agents == 1:
            return critic_apply(critic_params, obs[:1, 0], actor_out[:1, 0])
        return jax.vmap(
            lambda c, o, a: critic_apply(c, o[:1], a[:1])[0],
            in_axes=(0, 1, 1),
        )(critic_params, obs, actor_out)

    def step_fn(carry, _):
        states, obs, key, ep_reward = carry
        key, k = jax.random.split(key)
        actor_out = select(obs, k)
        action, a1, a2, a3 = decode_action(actor_out, space)
        trace = None
        if critic_params is not None:
            trace = (action[0].reshape(n_agents),
                     q_of(obs, actor_out).reshape(n_agents),
                     states.status[0] != C.IN_GAME)  # env 0 already absorbed
        states, obs, info = venv.step_absorb(states, action, a1, a2, a3)
        ep_reward = ep_reward + info.reward        # (E, A) per-agent
        return (states, obs, key, ep_reward), trace

    E = obs.shape[0]
    init = (states, obs, k_act, jnp.zeros((E, n_agents), jnp.float32))
    (states, obs, _, ep_reward), trace = jax.lax.scan(
        step_fn, init, None, length=n_steps
    )
    return ep_reward, states.t, states.status, trace


def _avg_std(x: np.ndarray):
    """Bessel-corrected avg/std (get_avg_std, dqn_main.cpp:155-168)."""
    if x.size == 0:
        return float("nan"), float("nan")
    avg = float(np.mean(x))
    if x.size < 2:
        return avg, float("nan")
    return avg, float(np.std(x, ddof=1))


class Evaluator:
    def __init__(self, venv: VecHFOEnv, n_steps: int, epsilon: float,
                 compute_dtype=None, space=sp_mod.LOW_LEVEL,
                 n_agents: int = 1):
        self._fn = jax.jit(functools.partial(
            _eval_scan, venv=venv, n_steps=n_steps, epsilon=epsilon,
            compute_dtype=compute_dtype, space=space, n_agents=n_agents,
        ))
        self.n_agents = n_agents

    def __call__(self, actor_params, key,
                 critic_params=None) -> Dict[str, float]:
        """Returns the reference evaluation metrics; episode reward is
        per-agent (the reference logs one Evaluation line per agent thread,
        dqn_main.cpp:194-204) — agent 0's numbers fill the top-level keys
        and `per_agent` carries every agent's reward stats.  With
        `critic_params`, metrics include `q_trace` = per-step
        (action_id (T, A), q (T, A)) of env 0 (dqn_main.cpp:124-128)."""
        rewards, steps, statuses, trace = self._fn(
            actor_params, key, critic_params=critic_params)
        rewards = np.asarray(rewards)             # (E, A)
        steps = np.asarray(steps)
        statuses = np.asarray(statuses)
        goals = statuses == C.GOAL
        avg_s, std_s = _avg_std(steps.astype(np.float64))
        avg_gs, std_gs = _avg_std(steps[goals].astype(np.float64))
        per_agent = []
        for a in range(rewards.shape[1]):
            avg_r, std_r = _avg_std(rewards[:, a])
            per_agent.append({"avg_reward": avg_r, "reward_std": std_r})
        m = {
            "avg_reward": per_agent[0]["avg_reward"],
            "reward_std": per_agent[0]["reward_std"],
            "avg_steps": avg_s,
            "steps_std": std_s,
            "success_steps": avg_gs,
            "success_std": std_gs,
            "goal_perc": float(np.mean(goals)),
        }
        if len(per_agent) > 1:
            m["per_agent"] = per_agent
        if trace is not None:
            live = ~np.asarray(trace[2])      # env 0 still in its episode
            m["q_trace"] = (np.asarray(trace[0])[live],
                            np.asarray(trace[1])[live])
        return m
