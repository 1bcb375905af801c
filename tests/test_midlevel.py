"""Tests for the mid-level macro action set (BASELINE.json config 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu import spaces
from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.hfo_env import HFOEnv
from dqn_hfo_tpu.env.state import EnvConfig


def reset(seed=0):
    env = HFOEnv(EnvConfig(), DEFAULT_PARAMS, noise_scale=0.0)
    s, obs = env.reset(jax.random.PRNGKey(seed))
    return env, s, obs


def mstep(env, s, action, a1=0.0, a2=0.0, a3=0.0):
    return env.step(
        s, jnp.asarray([action], jnp.int32), jnp.asarray([a1], jnp.float32),
        jnp.asarray([a2], jnp.float32), jnp.asarray([a3], jnp.float32))


class TestSpaces:
    def test_low_level_matches_constants(self):
        sp = spaces.LOW_LEVEL
        assert sp.output_size == 10
        assert sp.param_bounds == C.PARAM_BOUNDS
        mins, maxs = sp.bounds_arrays()
        assert mins.shape == (10,) and float(maxs[4 + 0]) == 100.0

    def test_mid_level_decode(self):
        sp = spaces.MID_LEVEL
        assert sp.output_size == 10
        out = jnp.zeros((1, 10)).at[0, 0].set(1.0)  # KICK_TO wins
        out = out.at[0, 3].set(0.5).at[0, 4].set(-0.25).at[0, 5].set(2.0)
        a, p1, p2, p3 = spaces.decode(sp, out)
        assert int(a[0]) == C.KICK_TO
        assert float(p1[0]) == 0.5 and float(p2[0]) == -0.25
        assert float(p3[0]) == 2.0
        out = jnp.zeros((1, 10)).at[0, 1].set(1.0)  # MOVE_TO wins
        out = out.at[0, 6].set(-0.5).at[0, 7].set(0.75)
        a, p1, p2, p3 = spaces.decode(sp, out)
        assert int(a[0]) == C.MOVE_TO
        assert float(p1[0]) == -0.5 and float(p2[0]) == 0.75
        assert float(p3[0]) == 0.0

    def test_mid_level_random_ranges(self):
        out = np.asarray(spaces.random_output(
            spaces.MID_LEVEL, jax.random.PRNGKey(0), (256,)))
        assert out.shape == (256, 10)
        assert np.all(out[:, 5] >= 0) and np.all(out[:, 5] <= 3)  # speed slot


class TestMidLevelMacros:
    def test_move_to_approaches_target(self):
        env, s, obs = reset()
        tx, ty = 30.0, 5.0
        txn = tx / DEFAULT_PARAMS.half_length
        tyn = ty / DEFAULT_PARAMS.half_width
        d0 = float(np.hypot(tx - float(s.p_pos[0, 0]),
                            ty - float(s.p_pos[0, 1])))
        jstep = jax.jit(env.step)
        for _ in range(60):
            s, obs, info = jstep(
                s, jnp.asarray([C.MOVE_TO], jnp.int32),
                jnp.asarray([txn], jnp.float32), jnp.asarray([tyn], jnp.float32),
                jnp.asarray([0.0], jnp.float32))
            if bool(info.done):
                break
        d1 = float(np.hypot(tx - float(s.p_pos[0, 0]),
                            ty - float(s.p_pos[0, 1])))
        assert d1 < min(d0 * 0.35, d0 - 5.0)

    def test_intercept_reaches_ball(self):
        env, s, obs = reset(seed=2)
        jstep = jax.jit(env.step)
        for i in range(120):
            s, obs, info = jstep(
                s, jnp.asarray([C.INTERCEPT], jnp.int32),
                jnp.asarray([0.0], jnp.float32), jnp.asarray([0.0], jnp.float32),
                jnp.asarray([0.0], jnp.float32))
            if float(obs[0, 12]) > 0 or bool(info.done):
                break
        assert float(obs[0, 12]) > 0  # kickable reached

    def test_kick_to_scores_on_goal(self):
        """INTERCEPT to the ball, then KICK_TO the goal center at speed 3."""
        env, s, obs = reset(seed=3)
        jstep = jax.jit(env.step)
        status = C.IN_GAME
        for i in range(300):
            if float(obs[0, 12]) > 0:
                a, p1, p2, p3 = C.KICK_TO, 1.0, 0.0, 3.0
            else:
                a, p1, p2, p3 = C.INTERCEPT, 0.0, 0.0, 0.0
            s, obs, info = jstep(
                s, jnp.asarray([a], jnp.int32), jnp.asarray([p1], jnp.float32),
                jnp.asarray([p2], jnp.float32), jnp.asarray([p3], jnp.float32))
            if bool(info.done):
                status = int(info.status)
                break
        assert status == C.GOAL

    def test_dribble_advances_ball_controlled(self):
        env, s, obs = reset(seed=4)
        jstep = jax.jit(env.step)
        bx0 = float(s.ball_pos[0])
        for i in range(200):
            s, obs, info = jstep(
                s, jnp.asarray([C.DRIBBLE_TO], jnp.int32),
                jnp.asarray([0.9], jnp.float32), jnp.asarray([0.0], jnp.float32),
                jnp.asarray([0.0], jnp.float32))
            if bool(info.done):
                break
        # ball moved toward the goal substantially
        assert float(s.ball_pos[0]) > bx0 + 5.0 or int(info.status) == C.GOAL


class TestMidLevelTraining:
    def test_rollout_chunk_with_midlevel_space(self):
        import functools
        from dqn_hfo_tpu.learner import replay as rp
        from dqn_hfo_tpu.learner.collector import (init_collector,
                                                   rollout_chunk)
        from dqn_hfo_tpu.learner.ddpg import DDPGConfig, init_learner
        from dqn_hfo_tpu.env.hfo_env import VecHFOEnv

        E, K = 4, 64
        env = HFOEnv(EnvConfig(), DEFAULT_PARAMS, noise_scale=1.0)
        venv = VecHFOEnv(env, E)
        cfg = DDPGConfig(state_size=59, action_space="mid_level")
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        assert ls.actor["action_head"]["w"].shape[-1] == 3
        rs = rp.init_replay(2048, E, 59, action_size=cfg.space.output_size)
        cs = init_collector(venv, jax.random.PRNGKey(1), K)
        roll = jax.jit(functools.partial(
            rollout_chunk, venv=venv, chunk_len=K, gamma=cfg.gamma,
            space=cfg.space))
        for _ in range(2):
            cs, rs, m = roll(cs, rs, ls.actor, jnp.asarray(1.0))
        assert int(m["env_steps"]) == E * K
        # mid-level exploration reaches the ball far more often than
        # low-level random actions: expect some episodes to progress
        from dqn_hfo_tpu.learner.ddpg import update_n
        ls, um = jax.jit(functools.partial(
            update_n, cfg=cfg, max_updates=4))(
                ls, rs, n_updates=jnp.asarray(4))
        assert int(ls.iteration) >= 0  # update path compiles and runs
