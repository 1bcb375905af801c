"""Tests pinning the rcssserver mechanics added for fidelity (VERDICT r1 #1):
probabilistic tackle, goalie catch rectangle + probability, kick noise,
stamina effort/recovery degradation, player-player and symmetric ball-player
collisions — plus distribution-level cross-checks of every stochastic path
between the JAX engine and the C++ core at noise_scale=1 (the engines use
different RNGs, so stochastic parity is tested on moments, not trajectories).
"""

import ctypes
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import DEFAULT_PARAMS, ServerParams
from dqn_hfo_tpu.env.core_bridge import PLAYER_STRIDE, CoreEnv
from dqn_hfo_tpu.env.hfo_env import HFOEnv
from dqn_hfo_tpu.env.physics import tackle_fail_prob
from dqn_hfo_tpu.env.state import EnvConfig

SP = DEFAULT_PARAMS


def det_env(**cfg_kw):
    return HFOEnv(EnvConfig(**cfg_kw), SP, noise_scale=0.0)


def place(s, ball=None, ball_vel=None, p_pos=None, p_vel=None, p_body=None,
          p_stamina=None):
    kw = {}
    if ball is not None:
        kw["ball_pos"] = jnp.asarray(ball, jnp.float32)
    if ball_vel is not None:
        kw["ball_vel"] = jnp.asarray(ball_vel, jnp.float32)
    if p_pos is not None:
        kw["p_pos"] = jnp.asarray(p_pos, jnp.float32)
    if p_vel is not None:
        kw["p_vel"] = jnp.asarray(p_vel, jnp.float32)
    if p_body is not None:
        kw["p_body"] = jnp.asarray(p_body, jnp.float32)
    if p_stamina is not None:
        kw["p_stamina"] = jnp.asarray(p_stamina, jnp.float32)
    return dataclasses.replace(s, **kw)


def step1(env, s, action, p1=0.0, p2=0.0):
    return env.step(s, jnp.asarray([action], jnp.int32),
                    jnp.asarray([p1], jnp.float32),
                    jnp.asarray([p2], jnp.float32))


# ---------------------------------------------------------------------------
# Tackle
# ---------------------------------------------------------------------------
class TestTackle:
    def test_fail_prob_formula(self):
        # exact rcssserver formula: (|x|/dist)^exp + (|y|/width)^exp
        fp = tackle_fail_prob(SP, jnp.asarray(1.0), jnp.asarray(0.5))
        expected = (1.0 / SP.tackle_dist) ** SP.tackle_exponent + (
            0.5 / SP.tackle_width) ** SP.tackle_exponent
        assert float(fp) == pytest.approx(expected, rel=1e-5)

    def test_ball_behind_always_fails(self):
        # tackle_back_dist = 0 -> any ball behind the body gives fail prob 1
        fp = tackle_fail_prob(SP, jnp.asarray(-0.2), jnp.asarray(0.0))
        assert float(fp) == 1.0

    def test_close_tackle_succeeds_deterministic(self):
        env = det_env()
        s, _ = env.reset(jax.random.PRNGKey(0))
        # ball 0.5m directly ahead (body=0): fail prob ~ (0.25)^6 ~ 0
        s = place(s, ball=np.asarray(s.p_pos[0]) + [0.5, 0.0],
                  ball_vel=[0.0, 0.0], p_body=[0.0])
        s2, _, _ = step1(env, s, C.TACKLE, 0.0)
        assert float(jnp.linalg.norm(s2.ball_vel)) > 0.01  # ball accelerated
        assert int(s2.p_frozen[0]) == SP.tackle_cycles - 0  # frozen

    def test_far_tackle_fails_but_freezes(self):
        env = det_env()
        s, _ = env.reset(jax.random.PRNGKey(0))
        # ball 1.9m ahead: fail prob (0.95)^6 ~ 0.735 > 0.5 -> deterministic
        # failure; the tackler still freezes (rcssserver: attempt costs)
        s = place(s, ball=np.asarray(s.p_pos[0]) + [1.9, 0.0],
                  ball_vel=[0.0, 0.0], p_body=[0.0])
        s2, _, _ = step1(env, s, C.TACKLE, 0.0)
        assert float(jnp.linalg.norm(s2.ball_vel)) < 1e-6
        assert int(s2.p_frozen[0]) == SP.tackle_cycles
        assert int(s2.untouched) == int(s.untouched) + 1  # not a touch

    def test_back_tackle_power_reduced(self):
        env = det_env()
        s, _ = env.reset(jax.random.PRNGKey(0))
        s = place(s, ball=np.asarray(s.p_pos[0]) + [0.5, 0.0],
                  ball_vel=[0.0, 0.0], p_body=[0.0])
        fwd, _, _ = step1(env, s, C.TACKLE, 0.0)
        back, _, _ = step1(env, s, C.TACKLE, 180.0)
        v_fwd = float(jnp.linalg.norm(fwd.ball_vel))
        v_back = float(jnp.linalg.norm(back.ball_vel))
        # max_back_tackle_power=0 -> backward tackle imparts ~nothing
        assert v_fwd > 0.1 and v_back == pytest.approx(0.0, abs=1e-5)


# ---------------------------------------------------------------------------
# Catch
# ---------------------------------------------------------------------------
class TestCatch:
    def keeper_env(self, noise=0.0, sp=SP):
        cfg = EnvConfig(offense_agents=1, defense_npcs=1, defense_goalie=True)
        return HFOEnv(cfg, sp, noise_scale=noise, npc_policy="chaser")

    def keeper_state(self, env, ball_rel, goalie_body=jnp.pi):
        """Goalie at index 1 with the ball at a given offset in front of the
        offense spawn; offense parked far away so it can't interfere."""
        s, _ = env.reset(jax.random.PRNGKey(0))
        gpos = np.asarray([30.0, 0.0], np.float32)
        p_pos = np.array(s.p_pos)
        p_pos[0] = [5.0, -20.0]
        p_pos[1] = gpos
        p_body = np.array(s.p_body)
        p_body[1] = float(goalie_body)
        return place(s, ball=gpos + np.asarray(ball_rel, np.float32),
                     ball_vel=[0.0, 0.0], p_pos=p_pos, p_body=p_body)

    def _step_noop(self, env, s):
        return env.step(s, jnp.asarray([C.NOOP], jnp.int32),
                        jnp.zeros((1,), jnp.float32),
                        jnp.zeros((1,), jnp.float32))

    def test_catch_inside_rectangle(self):
        env = self.keeper_env()
        # goalie faces -x (pi); ball 1.0m toward -x is straight ahead and
        # inside the 1.2 x 1.0 rectangle -> chaser NPC catches it
        s = self.keeper_state(env, [-1.0, 0.0])
        s2, _, info = self._step_noop(env, s)
        assert int(info.status) == C.CAPTURED_BY_DEFENSE

    def test_no_catch_outside_width(self):
        env = self.keeper_env()
        # ball ahead but 0.9m lateral: outside |y| <= catchable_area_w/2=0.5
        # AND outside kickable area (radius 1.085 < sqrt(1.0^2+0.9^2)=1.345)
        # -> no catch, no defensive possession... but the chaser only
        # catches when dist <= catchable_area_l=1.2, so it dashes instead.
        s = self.keeper_state(env, [-1.0, 0.9])
        s2, _, info = self._step_noop(env, s)
        assert int(info.status) == C.IN_GAME

    def test_catch_probability_zero_never_catches(self):
        sp0 = dataclasses.replace(SP, catch_probability=0.0)
        env = self.keeper_env(sp=sp0)
        s = self.keeper_state(env, [-1.0, 0.0])
        # deterministic mode uses u=0.5 >= 0.0 -> catch fails; the ball is
        # still within the keeper's kickable area -> captured via possession
        # (kickable radius 1.085 > 1.0), so test at a distance outside
        # kickable but inside the rectangle: 1.1m.
        s = self.keeper_state(env, [-1.1, 0.0])
        s2, _, info = self._step_noop(env, s)
        assert int(info.status) == C.IN_GAME


# ---------------------------------------------------------------------------
# Stamina / effort / recovery
# ---------------------------------------------------------------------------
class TestStaminaModel:
    def test_effort_and_recovery_degrade_below_thresholds(self):
        env = det_env()
        s, _ = env.reset(jax.random.PRNGKey(0))
        s = place(s, p_stamina=[SP.effort_dec_thr * SP.stamina_max + 50.0])
        # one 100-power dash drops stamina below both thresholds
        s, _, _ = step1(env, s, C.DASH, 100.0, 0.0)
        assert float(s.p_effort[0]) == pytest.approx(
            SP.effort_init - SP.effort_dec, abs=1e-6)
        assert float(s.p_recovery[0]) == pytest.approx(
            SP.recover_init - SP.recover_dec, abs=1e-6)

    def test_effort_floors_and_recovery_monotone(self):
        env = det_env()
        s, _ = env.reset(jax.random.PRNGKey(0))
        s = place(s, p_stamina=[100.0])
        for _ in range(300):  # burn hard: stamina stays pinned low
            s, _, _ = step1(env, s, C.DASH, 100.0, 0.0)
        assert float(s.p_effort[0]) == pytest.approx(SP.effort_min, abs=1e-5)
        assert float(s.p_recovery[0]) == pytest.approx(SP.recover_min, abs=1e-5)
        rec_low = float(s.p_recovery[0])
        # now rest: stamina recovers, effort climbs back, recovery does NOT
        # (the trial status goes OUT_OF_TIME long before; physics keeps
        # simulating, which is all this test needs)
        for _ in range(600):
            s, _, info = step1(env, s, C.NOOP)
        assert float(s.p_effort[0]) > SP.effort_min + 0.05
        assert float(s.p_recovery[0]) == pytest.approx(rec_low, abs=1e-6)

    def test_low_effort_weakens_dash(self):
        env = det_env()
        s, _ = env.reset(jax.random.PRNGKey(0))
        fresh, _, _ = step1(env, s, C.DASH, 100.0, 0.0)
        tired = dataclasses.replace(
            s, p_effort=jnp.asarray([SP.effort_min], jnp.float32))
        tired, _, _ = step1(env, tired, C.DASH, 100.0, 0.0)
        v_fresh = float(jnp.linalg.norm(fresh.p_vel[0]))
        v_tired = float(jnp.linalg.norm(tired.p_vel[0]))
        assert v_tired == pytest.approx(v_fresh * SP.effort_min, rel=1e-4)

    def test_recovery_scales_stamina_income(self):
        env = det_env()
        s, _ = env.reset(jax.random.PRNGKey(0))
        s = dataclasses.replace(
            s,
            p_stamina=jnp.asarray([4000.0], jnp.float32),
            p_recovery=jnp.asarray([SP.recover_min], jnp.float32),
        )
        s2, _, _ = step1(env, s, C.NOOP)
        assert float(s2.p_stamina[0]) == pytest.approx(
            4000.0 + SP.recover_min * SP.stamina_inc_max, abs=1e-3)


# ---------------------------------------------------------------------------
# Collisions
# ---------------------------------------------------------------------------
class TestCollisions:
    def test_players_pushed_apart_and_damped(self):
        env = det_env(offense_agents=2)
        s, _ = env.reset(jax.random.PRNGKey(0))
        p_pos = np.asarray([[10.0, 0.0], [10.5, 0.0]], np.float32)
        p_vel = np.asarray([[0.1, 0.0], [-0.1, 0.0]], np.float32)
        s = place(s, ball=[30.0, 20.0], p_pos=p_pos, p_vel=p_vel,
                  p_body=[0.0, 0.0])
        s2, _, _ = env.step(s, jnp.asarray([C.NOOP, C.NOOP], jnp.int32),
                            jnp.zeros((2,), jnp.float32),
                            jnp.zeros((2,), jnp.float32))
        # after moving they sit at 10.1 / 10.4 (0.3 apart, overlapping);
        # the resolution pass pushes each back by half the overlap
        d = float(jnp.linalg.norm(s2.p_pos[1] - s2.p_pos[0]))
        assert d == pytest.approx(2 * SP.player_size, abs=1e-5)
        # velocities reversed and damped: post-move vel was 0.1*decay
        assert float(s2.p_vel[0][0]) == pytest.approx(
            0.1 * SP.player_decay * -0.1, abs=1e-6)

    def test_ball_bounce_is_symmetric(self):
        env = det_env()
        s, _ = env.reset(jax.random.PRNGKey(0))
        p0 = np.asarray(s.p_pos[0])
        # ball rolling INTO the stationary player: ends up overlapping
        s = place(s, ball=p0 + [0.6, 0.0], ball_vel=[-0.4, 0.0],
                  p_vel=[[0.0, 0.0]], p_body=[0.0])
        s2, _, _ = step1(env, s, C.NOOP)
        # both displaced along the contact normal, both velocities flipped
        sep = float(jnp.linalg.norm(s2.ball_pos - s2.p_pos[0]))
        assert sep == pytest.approx(SP.player_size + SP.ball_size, abs=1e-5)
        assert float(s2.p_pos[0][0]) < float(p0[0])       # player pushed back
        assert float(s2.ball_vel[0]) > 0.0                # ball vel reversed
        # player's (zero) velocity stays ~zero but the damping was applied
        assert abs(float(s2.p_vel[0][0])) < 1e-6


# ---------------------------------------------------------------------------
# Stochastic distribution cross-checks: JAX engine vs C++ core, noise=1
# ---------------------------------------------------------------------------
def _jax_noise_samples(env, s, action, p1, p2, n):
    """Run ONE noisy step from the same state with n independent keys."""
    keys = jax.vmap(lambda i: jax.random.fold_in(s.rng, i))(jnp.arange(n))
    bs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), s)
    bs = dataclasses.replace(bs, rng=keys)
    A = env.cfg.offense_agents
    act = jnp.broadcast_to(jnp.asarray([action], jnp.int32), (n, A))
    a1 = jnp.broadcast_to(jnp.asarray([p1], jnp.float32), (n, A))
    a2 = jnp.broadcast_to(jnp.asarray([p2], jnp.float32), (n, A))
    s2, _, _ = jax.jit(jax.vmap(env.step))(bs, act, a1, a2)
    return s2


def _core_noise_samples(cfg, s, action, p1, p2, n, npc_policy="chaser"):
    """Same, on the C++ core with n distinct RNG seeds."""
    vels, bvels, bps = [], [], []
    core = CoreEnv(cfg, SP, noise_scale=1.0, npc_policy=npc_policy)
    for i in range(n):
        core.set_state_from_env(s)
        core.rng = ctypes.c_uint64(0x9E3779B97F4A7C15 * (i + 1) % (2**64) or 1)
        core.step([action], [p1], [p2])
        st = core.state
        vels.append([st.players[2], st.players[3]])
        bvels.append([st.ball_vel[0], st.ball_vel[1]])
        bps.append([st.ball_pos[0], st.ball_pos[1]])
    return np.asarray(vels), np.asarray(bvels), np.asarray(bps)


N_SAMPLES = 3000


class TestStochasticCrossCheck:
    """Moment-level agreement between engines at noise_scale=1.  The RNG
    streams are intentionally different (hfo_core.cpp rand_pm1 vs JAX
    threefry), so these compare distributions, not trajectories."""

    def setup_method(self):
        self.env = HFOEnv(EnvConfig(), SP, noise_scale=1.0)
        s, _ = self.env.reset(jax.random.PRNGKey(42))
        # park in mid-field with the ball kickable straight ahead
        self.s = place(s, ball=np.asarray([20.0, 0.0]) + [0.6, 0.0],
                       ball_vel=[0.0, 0.0], p_pos=[[20.0, 0.0]],
                       p_vel=[[0.0, 0.0]], p_body=[0.0])

    def test_player_movement_noise_moments(self):
        s2 = _jax_noise_samples(self.env, self.s, C.DASH, 100.0, 0.0,
                                N_SAMPLES)
        jv = np.asarray(s2.p_vel[:, 0, :])
        cv, _, _ = _core_noise_samples(EnvConfig(), self.s, C.DASH, 100.0,
                                       0.0, N_SAMPLES)
        # uniform noise per component, radius player_rand * speed
        np.testing.assert_allclose(jv.mean(0), cv.mean(0), atol=3e-3)
        np.testing.assert_allclose(jv.std(0), cv.std(0), rtol=0.12, atol=1e-4)

    def test_kick_noise_moments(self):
        s2 = _jax_noise_samples(self.env, self.s, C.KICK, 100.0, 30.0,
                                N_SAMPLES)
        jb = np.asarray(s2.ball_vel)
        _, cb, _ = _core_noise_samples(EnvConfig(), self.s, C.KICK, 100.0,
                                       30.0, N_SAMPLES)
        np.testing.assert_allclose(jb.mean(0), cb.mean(0), atol=5e-3)
        np.testing.assert_allclose(jb.std(0), cb.std(0), rtol=0.12, atol=2e-3)

    def test_tackle_success_rate(self):
        # ball 1.64m ahead: fail prob (1.64/2)^6 ~ 0.303 -> success ~ 0.697
        s = place(self.s, ball=[21.64, 0.0])
        fail_p = float(tackle_fail_prob(SP, jnp.asarray(1.64), jnp.asarray(0.0)))
        s2 = _jax_noise_samples(self.env, s, C.TACKLE, 0.0, 0.0, N_SAMPLES)
        j_rate = float(np.mean(np.linalg.norm(
            np.asarray(s2.ball_vel), axis=-1) > 1e-4))
        _, cb, _ = _core_noise_samples(EnvConfig(), s, C.TACKLE, 0.0, 0.0,
                                       N_SAMPLES)
        c_rate = float(np.mean(np.linalg.norm(cb, axis=-1) > 1e-4))
        expect = 1.0 - fail_p
        assert j_rate == pytest.approx(expect, abs=0.04)
        assert c_rate == pytest.approx(expect, abs=0.04)
        assert j_rate == pytest.approx(c_rate, abs=0.05)

    def test_ball_roll_noise_moments(self):
        # free-rolling ball: noise proportional to ball speed
        s = place(self.s, ball=[30.0, 5.0], ball_vel=[1.5, 0.0])
        s2 = _jax_noise_samples(self.env, s, C.NOOP, 0.0, 0.0, N_SAMPLES)
        jb = np.asarray(s2.ball_pos)
        _, _, cb = _core_noise_samples(EnvConfig(), s, C.NOOP, 0.0, 0.0,
                                       N_SAMPLES)
        np.testing.assert_allclose(jb.mean(0), cb.mean(0), atol=5e-3)
        np.testing.assert_allclose(jb.std(0), cb.std(0), rtol=0.12, atol=1e-3)
