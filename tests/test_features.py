"""Tests for the low-level feature encoder (index contract + normalization).

The reward shaping depends on exact feature indices
(/root/reference/src/hfo_game.cpp:131-152); these tests pin them.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.features import observe
from dqn_hfo_tpu.env.hfo_env import HFOEnv
from dqn_hfo_tpu.env.state import EnvConfig


def reset(cfg=None, seed=0, noise=0.0):
    env = HFOEnv(cfg or EnvConfig(), DEFAULT_PARAMS, noise_scale=noise)
    return env, *env.reset(jax.random.PRNGKey(seed))


class TestShape:
    def test_1v0_size(self):
        _, _, obs = reset()
        assert obs.shape == (1, 59)
        assert C.num_state_features(1) == 59

    def test_multiplayer_size(self):
        cfg = EnvConfig(offense_agents=2, defense_npcs=1, defense_goalie=True)
        env = HFOEnv(cfg, DEFAULT_PARAMS, noise_scale=0.0)
        _, obs = env.reset(jax.random.PRNGKey(0))
        assert cfg.n_players == 3
        assert obs.shape == (2, C.num_state_features(3))
        assert obs.shape[-1] == 77

    def test_all_in_unit_range(self):
        _, s, obs = reset()
        o = np.asarray(obs)
        assert np.all(o >= -1.0 - 1e-5) and np.all(o <= 1.0 + 1e-5)
        assert np.all(np.isfinite(o))


class TestIndexContract:
    """Semantic indices relied upon by the reference reward shaping."""

    def test_kickable_flag(self):
        env, s, obs = reset()
        # spawn: not kickable
        assert float(obs[0, 12]) == -1.0
        # teleport player onto the ball
        s2 = dataclasses.replace(
            s, p_pos=s.p_pos.at[0].set(s.ball_pos + jnp.asarray([0.5, 0.0]))
        )
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert float(o2[12]) == 1.0

    def test_ball_angle_and_proximity(self):
        env, s, obs = reset()
        # place player 10m left of ball, facing +x: ball dead ahead
        s2 = dataclasses.replace(
            s,
            p_pos=s.p_pos.at[0].set(s.ball_pos - jnp.asarray([10.0, 0.0])),
            p_body=s.p_body.at[0].set(0.0),
        )
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert float(o2[51]) == np.float32(0.0)  # sin(0)
        assert float(o2[52]) == np.float32(1.0)  # cos(0)
        expected_prox = 1.0 - 2.0 * 10.0 / DEFAULT_PARAMS.max_hfo_dist
        assert abs(float(o2[53]) - expected_prox) < 1e-5

    def test_goal_angle_identity(self):
        env, s, obs = reset()
        hl = DEFAULT_PARAMS.half_length
        s2 = dataclasses.replace(
            s,
            p_pos=s.p_pos.at[0].set(jnp.asarray([hl - 20.0, 0.0])),
            p_body=s.p_body.at[0].set(0.0),
        )
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert abs(float(o2[13])) < 1e-6      # goal straight ahead: sin=0
        assert float(o2[14]) > 0.999          # cos=1
        expected_prox = 1.0 - 2.0 * 20.0 / DEFAULT_PARAMS.max_hfo_dist
        assert abs(float(o2[15]) - expected_prox) < 1e-5

    def test_ball_velocity_features(self):
        env, s, obs = reset()
        s2 = dataclasses.replace(s, ball_vel=jnp.asarray([1.5, 0.0]))
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert float(o2[54]) == 1.0  # valid
        expected = -1.0 + 2.0 * 1.5 / DEFAULT_PARAMS.ball_speed_max
        assert abs(float(o2[55]) - expected) < 1e-5
        # stationary ball maps to -1 (so kPassVelThreshold=-.5 is meaningful)
        o3 = observe(DEFAULT_PARAMS, env.cfg,
                     dataclasses.replace(s, ball_vel=jnp.zeros(2)), 0)
        assert float(o3[55]) == -1.0

    def test_body_angle_feature(self):
        env, s, obs = reset()
        s2 = dataclasses.replace(s, p_body=s.p_body.at[0].set(jnp.pi / 2))
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert abs(float(o2[5]) - 1.0) < 1e-6  # sin
        assert abs(float(o2[6]) - 0.0) < 1e-6  # cos

    def test_stamina_feature(self):
        env, s, obs = reset()
        s2 = dataclasses.replace(
            s, p_stamina=s.p_stamina.at[0].set(DEFAULT_PARAMS.stamina_max / 2)
        )
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert abs(float(o2[7])) < 1e-6


class TestRelativity:
    def test_rotation_invariance_of_proximity(self):
        """Rotating the observer's body changes angles, not proximities."""
        env, s, obs = reset()
        s2 = dataclasses.replace(s, p_body=s.p_body.at[0].set(1.234))
        o1 = observe(DEFAULT_PARAMS, env.cfg, s, 0)
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert abs(float(o1[53]) - float(o2[53])) < 1e-6  # ball prox
        assert abs(float(o1[15]) - float(o2[15])) < 1e-6  # goal prox

    def test_angles_shift_with_body(self):
        env, s, obs = reset()
        base = float(np.arctan2(float(obs[0, 51]), float(obs[0, 52])))
        rot = 0.7
        s2 = dataclasses.replace(
            s, p_body=s.p_body.at[0].set(s.p_body[0] + rot)
        )
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        shifted = float(np.arctan2(float(o2[51]), float(o2[52])))
        d = (base - rot - shifted + np.pi) % (2 * np.pi) - np.pi
        assert abs(d) < 1e-5
