"""Unit tests for the soccer dynamics engine (deterministic mode)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import DEFAULT_PARAMS, ServerParams
from dqn_hfo_tpu.env.hfo_env import HFOEnv
from dqn_hfo_tpu.env.physics import normalize_angle, physics_step
from dqn_hfo_tpu.env.state import EnvConfig


_ENVS = {}
_JIT = {}


def make_env(noise=0.0, **cfg_kw):
    key = (noise, tuple(sorted(cfg_kw.items())))
    if key not in _ENVS:
        _ENVS[key] = HFOEnv(EnvConfig(**cfg_kw), DEFAULT_PARAMS, noise_scale=noise)
    return _ENVS[key]


def reset(env, seed=0):
    return env.reset(jax.random.PRNGKey(seed))


def a1(x):
    return jnp.asarray([x], jnp.float32)


def act(env, s, action, p1=0.0, p2=0.0):
    fn = _JIT.get(id(env))
    if fn is None:
        fn = _JIT[id(env)] = jax.jit(env.step)
    return fn(s, jnp.asarray([action], jnp.int32), a1(p1), a1(p2))


class TestKinematics:
    def test_dash_moves_player_forward(self):
        env = make_env()
        s, _ = reset(env)
        x0 = s.p_pos[0, 0]
        s, _, _ = act(env, s, C.DASH, 100.0, 0.0)
        # body faces 0 rad => +x movement
        assert s.p_pos[0, 0] > x0
        assert abs(s.p_pos[0, 1] - 0.0) < 20  # no lateral surprise

    def test_dash_velocity_decays(self):
        env = make_env()
        s, _ = reset(env)
        s, _, _ = act(env, s, C.DASH, 100.0, 0.0)
        v1 = float(jnp.linalg.norm(s.p_vel[0]))
        s, _, _ = act(env, s, C.NOOP)
        v2 = float(jnp.linalg.norm(s.p_vel[0]))
        assert v2 == pytest.approx(v1 * DEFAULT_PARAMS.player_decay, rel=1e-4)

    def test_speed_capped(self):
        env = make_env()
        s, _ = reset(env)
        for _ in range(20):
            s, _, _ = act(env, s, C.DASH, 100.0, 0.0)
            # post-step velocity is decayed; pre-decay speed must obey cap
            assert (
                float(jnp.linalg.norm(s.p_vel[0])) / DEFAULT_PARAMS.player_decay
                <= DEFAULT_PARAMS.player_speed_max + 1e-5
            )

    def test_turn_changes_body_only(self):
        env = make_env()
        s, _ = reset(env)
        b0 = float(s.p_body[0])
        p0 = np.asarray(s.p_pos[0])
        s, _, _ = act(env, s, C.TURN, 90.0, 0.0)
        # stationary player: actual moment == full moment
        assert float(s.p_body[0]) == pytest.approx(b0 + np.pi / 2, abs=1e-5)
        np.testing.assert_allclose(np.asarray(s.p_pos[0]), p0, atol=1e-6)

    def test_turn_inertia_reduces_moment_when_moving(self):
        env = make_env()
        s, _ = reset(env)
        s, _, _ = act(env, s, C.DASH, 100.0, 0.0)
        speed = float(jnp.linalg.norm(s.p_vel[0]))
        b0 = float(s.p_body[0])
        s, _, _ = act(env, s, C.TURN, 90.0, 0.0)
        expected = (np.pi / 2) / (1.0 + DEFAULT_PARAMS.inertia_moment * speed)
        assert float(s.p_body[0]) - b0 == pytest.approx(expected, abs=1e-5)

    def test_backward_dash_moves_backwards(self):
        env = make_env()
        s, _ = reset(env)
        x0 = float(s.p_pos[0, 0])
        s, _, _ = act(env, s, C.DASH, -100.0, 0.0)
        assert float(s.p_pos[0, 0]) < x0

    def test_stamina_consumed_and_recovers(self):
        env = make_env()
        s, _ = reset(env)
        st0 = float(s.p_stamina[0])
        s, _, _ = act(env, s, C.DASH, 100.0, 0.0)
        st1 = float(s.p_stamina[0])
        assert st1 == pytest.approx(
            min(st0 - 100.0 + DEFAULT_PARAMS.stamina_inc_max,
                DEFAULT_PARAMS.stamina_max), abs=1e-3)
        s, _, _ = act(env, s, C.NOOP)
        assert float(s.p_stamina[0]) > st1 - 1e-6


class TestBall:
    def _to_kickable(self, env, s, obs):
        """Dash straight at the ball until kickable."""
        for _ in range(80):
            if float(obs[0, 12]) > 0:
                return s, obs
            ang = np.degrees(np.arctan2(float(obs[0, 51]), float(obs[0, 52])))
            s, obs, _ = act(env, s, C.DASH, 100.0, ang)
        raise AssertionError("never reached ball")

    def test_kick_accelerates_ball(self):
        env = make_env()
        s, obs = reset(env)
        s, obs = self._to_kickable(env, s, obs)
        bv0 = float(jnp.linalg.norm(s.ball_vel))
        s, obs, _ = act(env, s, C.KICK, 100.0, 0.0)
        assert float(jnp.linalg.norm(s.ball_vel)) > bv0

    def test_kick_ignored_when_not_kickable(self):
        env = make_env()
        s, obs = reset(env)
        assert float(obs[0, 12]) < 0  # not kickable at spawn
        s2, _, _ = act(env, s, C.KICK, 100.0, 0.0)
        np.testing.assert_allclose(
            np.asarray(s2.ball_pos), np.asarray(s.ball_pos), atol=1e-6
        )

    def test_ball_decay(self):
        env = make_env()
        s, obs = reset(env)
        s, obs = self._to_kickable(env, s, obs)
        s, obs, _ = act(env, s, C.KICK, 100.0, 90.0)  # kick away from self
        v1 = float(jnp.linalg.norm(s.ball_vel))
        s, obs, info = act(env, s, C.NOOP)
        v2 = float(jnp.linalg.norm(s.ball_vel))
        # free ball decays by ball_decay (unless it collided/terminated)
        if not bool(info.done):
            assert v2 == pytest.approx(v1 * DEFAULT_PARAMS.ball_decay, rel=1e-3)

    def test_ball_speed_capped(self):
        env = make_env()
        s, obs = reset(env)
        s, obs = self._to_kickable(env, s, obs)
        s, obs, _ = act(env, s, C.KICK, 100.0, 0.0)
        assert (
            float(jnp.linalg.norm(s.ball_vel)) / DEFAULT_PARAMS.ball_decay
            <= DEFAULT_PARAMS.ball_speed_max + 1e-4
        )


class TestReferee:
    def test_out_of_time(self):
        sp = dataclasses.replace(DEFAULT_PARAMS, untouched_time=1000000)
        env = HFOEnv(EnvConfig(), sp, noise_scale=0.0)
        s, _ = reset(env)
        done = False
        for _ in range(sp.frames_per_trial + 2):
            s, _, info = act(env, s, C.TURN, 1.0, 0.0)
            if bool(info.done):
                done = True
                break
        assert done and int(info.status) == C.OUT_OF_TIME
        assert int(info.steps) == sp.frames_per_trial

    def test_untouched_time(self):
        env = make_env()
        s, _ = reset(env)
        for _ in range(DEFAULT_PARAMS.untouched_time + 2):
            s, _, info = act(env, s, C.NOOP)
            if bool(info.done):
                break
        assert int(info.status) == C.OUT_OF_TIME

    def test_goal_detection(self):
        env = make_env()
        s, obs = reset(env)
        # Teleport ball just in front of goal, flying in.
        s = dataclasses.replace(
            s,
            ball_pos=jnp.asarray([DEFAULT_PARAMS.half_length - 0.5, 0.0]),
            ball_vel=jnp.asarray([2.0, 0.0]),
        )
        s, obs, info = act(env, s, C.NOOP)
        assert bool(info.done) and int(info.status) == C.GOAL

    def test_out_of_bounds_sideline(self):
        env = make_env()
        s, obs = reset(env)
        s = dataclasses.replace(
            s,
            ball_pos=jnp.asarray([10.0, DEFAULT_PARAMS.half_width - 0.1]),
            ball_vel=jnp.asarray([0.0, 2.0]),
        )
        s, obs, info = act(env, s, C.NOOP)
        assert bool(info.done) and int(info.status) == C.OUT_OF_BOUNDS

    def test_wide_shot_is_oob_not_goal(self):
        env = make_env()
        s, obs = reset(env)
        s = dataclasses.replace(
            s,
            ball_pos=jnp.asarray(
                [DEFAULT_PARAMS.half_length - 0.5,
                 DEFAULT_PARAMS.goal_width / 2 + 1.0]),
            ball_vel=jnp.asarray([2.0, 0.0]),
        )
        s, obs, info = act(env, s, C.NOOP)
        assert bool(info.done) and int(info.status) == C.OUT_OF_BOUNDS


class TestDeterminism:
    def test_same_seed_same_trajectory(self):
        env = make_env(noise=1.0)  # noise on: determinism via PRNG key
        s1, o1 = reset(env, 3)
        s2, o2 = reset(env, 3)
        for i in range(20):
            s1, o1, _ = act(env, s1, C.DASH, 80.0, 10.0)
            s2, o2, _ = act(env, s2, C.DASH, 80.0, 10.0)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_normalize_angle(self):
        xs = jnp.asarray([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi])
        out = normalize_angle(xs)
        assert np.all(np.asarray(out) >= -np.pi) and np.all(np.asarray(out) < np.pi)
        assert float(normalize_angle(jnp.asarray(3 * np.pi))) == pytest.approx(-np.pi)
