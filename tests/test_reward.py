"""Tests for the shaped-reward state machine vs. the reference semantics
(/root/reference/src/hfo_game.cpp:122-236)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.hfo_env import HFOEnv
from dqn_hfo_tpu.env.reward import ShapingState, initial_shaping, shaping_step
from dqn_hfo_tpu.env.state import EnvConfig


def make_obs(ball_prox=0.5, goal_prox=0.3, kickable=-1.0, ball_ang=0.2,
             goal_ang=-0.1, ball_vel=-1.0, ball_vel_valid=1.0):
    o = np.zeros(59, np.float32)
    o[12] = kickable
    o[13] = np.sin(goal_ang)
    o[14] = np.cos(goal_ang)
    o[15] = goal_prox
    o[51] = np.sin(ball_ang)
    o[52] = np.cos(ball_ang)
    o[53] = ball_prox
    o[54] = ball_vel_valid
    o[55] = ball_vel
    return jnp.asarray(o)


def ref_ball_dist_goal(ball_prox, goal_prox, ball_ang, goal_ang):
    bd, gd = 1.0 - ball_prox, 1.0 - goal_prox
    alpha = max(ball_ang, goal_ang) - min(ball_ang, goal_ang)
    return np.sqrt(bd * bd + gd * gd - 2 * bd * gd * np.cos(alpha))


def step(sh, obs, status=C.IN_GAME, toucher=-1, side=C.SIDE_NONE, our=7):
    return shaping_step(
        sh, obs, jnp.asarray(status, jnp.int32), jnp.asarray(toucher, jnp.int32),
        jnp.asarray(side, jnp.int32), jnp.asarray(our, jnp.int32),
    )


class TestMoveToBall:
    def test_approach_rewards_prox_delta(self):
        sh = initial_shaping(make_obs(ball_prox=0.5),
                             jnp.asarray(-1, jnp.int32),
                             jnp.asarray(C.SIDE_NONE, jnp.int32))
        sh, r = step(sh, make_obs(ball_prox=0.62))
        assert float(r.move_to_ball) == pytest.approx(0.12, abs=1e-5)

    def test_no_prox_reward_when_opponent_on_ball(self):
        sh = initial_shaping(make_obs(ball_prox=0.5),
                             jnp.asarray(-1, jnp.int32),
                             jnp.asarray(C.SIDE_NONE, jnp.int32))
        # toucher unum 5 != our unum 7: no ball_prox_delta reward
        sh, r = step(sh, make_obs(ball_prox=0.62), toucher=5, side=C.SIDE_LEFT)
        assert float(r.move_to_ball) == 0.0

    def test_kickable_bonus_once(self):
        sh = initial_shaping(make_obs(kickable=-1.0),
                             jnp.asarray(-1, jnp.int32),
                             jnp.asarray(C.SIDE_NONE, jnp.int32))
        sh, r1 = step(sh, make_obs(kickable=1.0))
        assert float(r1.move_to_ball) == pytest.approx(1.0, abs=1e-5)
        # lose and regain kickable: no second bonus
        sh, _ = step(sh, make_obs(kickable=-1.0))
        sh, r2 = step(sh, make_obs(kickable=1.0))
        assert float(r2.move_to_ball) == pytest.approx(0.0, abs=1e-5)


class TestKickToGoal:
    def test_own_possession_scaled_delta(self):
        o1 = make_obs(ball_prox=0.9, goal_prox=0.3)
        o2 = make_obs(ball_prox=0.9, goal_prox=0.4)
        sh = initial_shaping(o1, jnp.asarray(7, jnp.int32),
                             jnp.asarray(C.SIDE_LEFT, jnp.int32))
        sh, r = step(sh, o2, toucher=7, side=C.SIDE_LEFT)
        d = ref_ball_dist_goal(0.9, 0.4, 0.2, -0.1) - ref_ball_dist_goal(
            0.9, 0.3, 0.2, -0.1)
        assert float(r.kick_to_goal) == pytest.approx(3.0 * -d, abs=1e-5)

    def test_teammate_possession_fifth(self):
        o1 = make_obs(ball_prox=0.9, goal_prox=0.3, kickable=1.0)
        o2 = make_obs(ball_prox=0.9, goal_prox=0.4, kickable=1.0)
        sh = initial_shaping(o1, jnp.asarray(-1, jnp.int32),
                             jnp.asarray(C.SIDE_NONE, jnp.int32))
        # got_kickable must latch first
        sh = sh._replace(got_kickable=jnp.asarray(True))
        sh, r = step(sh, o2, toucher=9, side=C.SIDE_LEFT)
        d = ref_ball_dist_goal(0.9, 0.4, 0.2, -0.1) - ref_ball_dist_goal(
            0.9, 0.3, 0.2, -0.1)
        assert float(r.kick_to_goal) == pytest.approx(3.0 * 0.2 * -d, abs=1e-5)


class TestEOT:
    def test_own_goal_reward_5(self):
        sh = initial_shaping(make_obs(), jnp.asarray(7, jnp.int32),
                             jnp.asarray(C.SIDE_LEFT, jnp.int32))
        sh, r = step(sh, make_obs(), status=C.GOAL, toucher=7, side=C.SIDE_LEFT)
        assert float(r.eot) == 5.0

    def test_teammate_goal_reward_1(self):
        sh = initial_shaping(make_obs(), jnp.asarray(8, jnp.int32),
                             jnp.asarray(C.SIDE_LEFT, jnp.int32))
        sh, r = step(sh, make_obs(), status=C.GOAL, toucher=8, side=C.SIDE_LEFT)
        assert float(r.eot) == 1.0

    def test_captured_gives_zero(self):
        sh = initial_shaping(make_obs(), jnp.asarray(7, jnp.int32),
                             jnp.asarray(C.SIDE_LEFT, jnp.int32))
        sh, r = step(sh, make_obs(), status=C.CAPTURED_BY_DEFENSE,
                     toucher=7, side=C.SIDE_LEFT)
        assert float(r.eot) == 0.0

    def test_deltas_zeroed_at_episode_end(self):
        sh = initial_shaping(make_obs(ball_prox=0.5),
                             jnp.asarray(7, jnp.int32),
                             jnp.asarray(C.SIDE_LEFT, jnp.int32))
        sh, r = step(sh, make_obs(ball_prox=0.9), status=C.OUT_OF_TIME,
                     toucher=7, side=C.SIDE_LEFT)
        assert float(r.move_to_ball) == 0.0
        assert float(r.kick_to_goal) == 0.0


class TestPassLatch:
    def test_pass_detected_and_latch_cleared(self):
        # ball starts fast (vel feature above threshold) -> pass_active
        o = make_obs(ball_vel=0.0)
        sh = initial_shaping(o, jnp.asarray(7, jnp.int32),
                             jnp.asarray(C.SIDE_LEFT, jnp.int32))
        assert bool(sh.pass_active)
        # new toucher (teammate 8) while pass active -> pass fires, latch clears
        sh, r = step(sh, make_obs(ball_vel=-1.0), toucher=8, side=C.SIDE_LEFT)
        assert float(r.pass_reward) == 1.0
        assert not bool(sh.pass_active)
        # pass reward is NOT in the total (hfo_game.cpp:180)
        assert float(r.total) == pytest.approx(
            float(r.move_to_ball) + float(r.kick_to_goal) + float(r.eot), abs=1e-6
        )

    def test_no_pass_when_same_toucher(self):
        o = make_obs(ball_vel=0.0)
        sh = initial_shaping(o, jnp.asarray(7, jnp.int32),
                             jnp.asarray(C.SIDE_LEFT, jnp.int32))
        sh, r = step(sh, make_obs(ball_vel=0.0), toucher=7, side=C.SIDE_LEFT)
        assert float(r.pass_reward) == 0.0
        assert bool(sh.pass_active)


class TestEndToEnd:
    def test_scoring_episode_total(self):
        """Drive to the ball and shoot; terminal reward includes +5 EOT."""
        env = HFOEnv(EnvConfig(ball_x_min=0.1, ball_x_max=0.1),
                     DEFAULT_PARAMS, noise_scale=0.0)
        jstep = jax.jit(env.step)
        s, obs = env.reset(jax.random.PRNGKey(1))
        total = 0.0
        got_goal = False
        for i in range(400):
            if float(obs[0, 12]) > 0:  # kickable: shoot at goal
                gang = np.degrees(np.arctan2(float(obs[0, 13]), float(obs[0, 14])))
                a, p1, p2 = C.KICK, 100.0, gang
            else:
                bang = np.degrees(np.arctan2(float(obs[0, 51]), float(obs[0, 52])))
                a, p1, p2 = C.DASH, 100.0, bang
            s, obs, info = jstep(
                s, jnp.asarray([a], jnp.int32),
                jnp.asarray([p1], jnp.float32), jnp.asarray([p2], jnp.float32))
            total += float(info.reward[0])
            if bool(info.done):
                got_goal = int(info.status) == C.GOAL
                break
        assert got_goal, "scripted policy should score on empty goal"
        assert total > 4.0  # +1 kickable, +5 goal, small shaping terms
