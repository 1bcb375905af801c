"""Behavioral tests for the scripted NPC policies (env/npc.py) — the
in-graph stand-ins for HFO's agent2d bots behind --offense-npcs /
--defense-npcs (reference topology semantics: dqn_main.cpp:53-59, 427-436)
and the reference's own chaser/dummy binaries.

The agent2d-flavored policies must actually DO their jobs: the defender
denies goals a dummy would concede; the teammate moves, receives a pass
(firing the pass_reward latch, hfo_game.cpp:190-213), and shoots.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.hfo_env import HFOEnv
from dqn_hfo_tpu.env.state import EnvConfig

SP = DEFAULT_PARAMS


def scripted_striker(obs_row):
    """Dash to ball, shoot INSIDE THE NEAR POST when kickable — 80% toward
    the post landmark (obs[16:18]), 20% goal center (obs[13:15]) — the shot
    a stationary center-parked goalie cannot touch (obs feature indices per
    hfo_game.cpp:131-152)."""
    o = np.asarray(obs_row)
    if o[12] > 0:
        post = np.arctan2(o[16], o[17])
        center = np.arctan2(o[13], o[14])
        return C.KICK, 100.0, float(np.degrees(0.8 * post + 0.2 * center))
    return C.DASH, 100.0, float(np.degrees(np.arctan2(o[51], o[52])))


def play(env, seed, n_steps, policy):
    step = jax.jit(env.step)
    s, obs = env.reset(jax.random.PRNGKey(seed))
    infos = []
    for _ in range(n_steps):
        a, p1, p2 = policy(s, obs)
        s, obs, info = step(s, jnp.asarray(a, jnp.int32),
                            jnp.asarray(p1, jnp.float32),
                            jnp.asarray(p2, jnp.float32))
        infos.append(info)
        if bool(info.done):
            break
    return s, infos


class TestAgent2dDefender:
    def run_episodes(self, npc_policy, n_eps=8):
        cfg = EnvConfig(offense_agents=1, defense_npcs=1, defense_goalie=True)
        env = HFOEnv(cfg, SP, noise_scale=0.0, npc_policy=npc_policy)

        def pol(s, obs):
            a, p1, p2 = scripted_striker(obs[0])
            return [a], [p1], [p2]

        outcomes = []
        for seed in range(n_eps):
            _, infos = play(env, seed, 520, pol)
            outcomes.append(int(infos[-1].status))
        return outcomes

    def test_defender_denies_naive_striker(self):
        """A goalie that positions on the ball-goal line must stop goals the
        NOOP dummy concedes."""
        dummy = self.run_episodes("dummy")
        agent2d = self.run_episodes("agent2d")
        assert dummy.count(C.GOAL) >= 6          # naive striker scores freely
        assert agent2d.count(C.GOAL) <= 2        # the keeper shuts it down
        assert agent2d.count(C.CAPTURED_BY_DEFENSE) >= 5

    def test_defender_moves(self):
        cfg = EnvConfig(offense_agents=1, defense_npcs=1, defense_goalie=True)
        env = HFOEnv(cfg, SP, noise_scale=0.0, npc_policy="agent2d")
        s, obs = env.reset(jax.random.PRNGKey(1))
        p0 = np.asarray(s.p_pos[1])
        for _ in range(30):
            s, obs, info = env.step(s, jnp.asarray([C.NOOP], jnp.int32),
                                    jnp.zeros((1,), jnp.float32),
                                    jnp.zeros((1,), jnp.float32))
        assert np.linalg.norm(np.asarray(s.p_pos[1]) - p0) > 0.5


class TestAgent2dTeammate:
    def make_2v1(self):
        cfg = EnvConfig(offense_agents=1, offense_npcs=1, defense_npcs=1,
                        defense_goalie=True, offense_on_ball=1)
        return HFOEnv(cfg, SP, noise_scale=0.0, npc_policy="agent2d",
                      offense_policy="agent2d")

    def test_teammate_moves_off_ball(self):
        env = self.make_2v1()
        s, obs = env.reset(jax.random.PRNGKey(0))
        p0 = np.asarray(s.p_pos[1])
        for _ in range(40):
            s, obs, info = env.step(s, jnp.asarray([C.NOOP], jnp.int32),
                                    jnp.zeros((1,), jnp.float32),
                                    jnp.zeros((1,), jnp.float32))
            if bool(info.done):
                break
        assert np.linalg.norm(np.asarray(s.p_pos[1]) - p0) > 1.0

    def test_pass_to_teammate_fires_pass_reward(self):
        """The learner kicks toward the agent2d teammate; the teammate
        receives (touches) and the pass_reward latch fires for the learner
        — the mechanism behind the reference's 2v1 passing curricula
        (train.sh:116-150), which NOOP teammates can never trigger."""
        env = self.make_2v1()
        step = jax.jit(env.step)

        def pol(s, obs):
            o = np.asarray(obs[0])
            if o[12] > 0:  # kickable: kick toward the teammate
                me = np.asarray(s.p_pos[0])
                mate = np.asarray(s.p_pos[1])
                body = float(s.p_body[0])
                ang = np.degrees(
                    np.arctan2(mate[1] - me[1], mate[0] - me[0]) - body)
                ang = (ang + 180.0) % 360.0 - 180.0
                dist = float(np.linalg.norm(mate - me))
                return [C.KICK], [min(100.0, 15.0 + 4.0 * dist)], [ang]
            return [C.DASH], [100.0], [
                float(np.degrees(np.arctan2(o[51], o[52])))]

        fired = False
        for seed in range(6):
            s, obs = env.reset(jax.random.PRNGKey(seed))
            for _ in range(200):
                a, p1, p2 = pol(s, obs)
                s, obs, info = step(s, jnp.asarray(a, jnp.int32),
                                    jnp.asarray(p1, jnp.float32),
                                    jnp.asarray(p2, jnp.float32))
                if float(info.pass_reward[0]) > 0.5:
                    fired = True
                    break
                if bool(info.done):
                    break
            if fired:
                break
        assert fired, "pass_reward never fired across 6 scripted episodes"

    def test_teammate_can_finish(self):
        """Left alone with the ball near the box, the teammate shoots and
        scores (its KICK branch aims at the goal inside 20m)."""
        cfg = EnvConfig(offense_agents=1, offense_npcs=1)
        env = HFOEnv(cfg, SP, noise_scale=0.0, offense_policy="agent2d")
        s, obs = env.reset(jax.random.PRNGKey(3))
        # drop the ball at the teammate's feet, 15m from goal
        tpos = np.asarray([SP.half_length - 15.0, 2.0], np.float32)
        p_pos = np.array(s.p_pos)
        p_pos[0] = [5.0, -20.0]  # learner parked far away
        p_pos[1] = tpos
        s = dataclasses.replace(
            s,
            p_pos=jnp.asarray(p_pos),
            ball_pos=jnp.asarray(tpos + np.asarray([0.5, 0.0]), jnp.float32),
            ball_vel=jnp.zeros(2, jnp.float32),
        )
        status = None
        for _ in range(120):
            s, obs, info = env.step(s, jnp.asarray([C.NOOP], jnp.int32),
                                    jnp.zeros((1,), jnp.float32),
                                    jnp.zeros((1,), jnp.float32))
            if bool(info.done):
                status = int(info.status)
                break
        assert status == C.GOAL


class TestDifficultyLadder:
    """Pin the defender difficulty ordering the calibration harness
    (scripts/calibrate_npcs.py) reports: against a fixed scripted striker,
    dummy concedes like an empty goal, the chaser denies some, the agent2d
    keeper denies most (results/npc_ladder.json has the committed 512-episode
    ladder; this is the fast regression version)."""

    def ladder_rung(self, defender, episodes=64):
        from dqn_hfo_tpu.env.hfo_env import VecHFOEnv
        from dqn_hfo_tpu.env.npc import scripted_striker_action
        cfg = EnvConfig(defense_npcs=1, defense_goalie=True)
        env = HFOEnv(cfg, SP, noise_scale=1.0, npc_policy=defender)
        venv = VecHFOEnv(env, episodes)

        def episode(key):
            states, obs = venv.reset(key)

            def step_fn(carry, _):
                states, obs = carry
                a, p1, p2 = jax.vmap(scripted_striker_action)(obs[:, 0, :])
                states, obs, _ = venv.step_absorb(
                    states, a[:, None], p1[:, None], p2[:, None])
                return (states, obs), None

            (states, _), _ = jax.lax.scan(
                step_fn, (states, obs), None, length=SP.frames_per_trial)
            return states.status

        status = np.asarray(jax.jit(episode)(jax.random.PRNGKey(17)))
        return float(np.mean(status == C.GOAL))

    def test_ladder_ordering(self):
        dummy = self.ladder_rung("dummy")
        chaser = self.ladder_rung("chaser")
        agent2d = self.ladder_rung("agent2d")
        assert dummy > 0.6                      # near-empty goal
        assert chaser < dummy - 0.05            # chaser denies some
        assert agent2d < chaser - 0.2           # keeper denies most
        assert agent2d < 0.45


class TestOffenseOnBall:
    """HFO --offense-on-ball semantics (bin/HFO): an index names a fixed
    offense player; a value beyond the roster gives the ball to a RANDOM
    offense player each episode (the reference's 2v1 config passes 10 with
    2 agents, /root/reference/scripts/train.sh:41-53)."""

    def _holder(self, env, key):
        s, _ = env.reset(key)
        d = np.linalg.norm(
            np.asarray(s.p_pos[: env.cfg.n_offense]) - np.asarray(s.ball_pos),
            axis=-1,
        )
        return int(np.argmin(d)), float(d.min())

    def test_fixed_index_pins_holder(self):
        cfg = EnvConfig(offense_agents=2, defense_npcs=1,
                        defense_goalie=True, offense_on_ball=2)
        env = HFOEnv(cfg, SP, noise_scale=0.0, npc_policy="agent2d")
        for seed in range(6):
            h, d = self._holder(env, jax.random.PRNGKey(seed))
            assert h == 1 and d < SP.kickable_area

    def test_overflow_index_randomizes_holder(self):
        cfg = EnvConfig(offense_agents=2, defense_npcs=1,
                        defense_goalie=True, offense_on_ball=10,
                        ball_x_min=0.6)
        env = HFOEnv(cfg, SP, noise_scale=0.0, npc_policy="agent2d")
        holders = set()
        for seed in range(16):
            h, d = self._holder(env, jax.random.PRNGKey(seed))
            assert d < SP.kickable_area
            holders.add(h)
        assert holders == {0, 1}
