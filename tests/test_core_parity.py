"""Golden-trajectory parity: JAX engine vs. the C++ reference core.

SURVEY.md §7 layer 1 / BASELINE.json config 1: the vectorized XLA engine must
reproduce the scalar C++ core's trajectories under deterministic dynamics.
Both implement identical float32 formulas; XLA fusion may reorder a few ops,
so comparison uses tight tolerances rather than bit equality.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.core_bridge import CoreEnv
from dqn_hfo_tpu.env.hfo_env import HFOEnv
from dqn_hfo_tpu.env.state import EnvConfig

ATOL = 2e-4  # accumulated float32 reassociation tolerance over many steps


def run_pair(cfg, n_steps, policy, seed=0, npc_policy="chaser",
             offense_policy="dummy"):
    """Run JAX env and C++ core in lockstep from the same initial state."""
    env = HFOEnv(cfg, DEFAULT_PARAMS, noise_scale=0.0, npc_policy=npc_policy,
                 offense_policy=offense_policy)
    jstep = jax.jit(env.step)
    s, obs = env.reset(jax.random.PRNGKey(seed))

    core = CoreEnv(cfg, DEFAULT_PARAMS, noise_scale=0.0, npc_policy=npc_policy,
                   offense_policy=offense_policy)
    core.set_state_from_env(s)
    core.init_shaping()
    core_obs = np.stack([core.observe(a) for a in range(cfg.offense_agents)])
    np.testing.assert_allclose(np.asarray(obs), core_obs, atol=1e-5)

    rng = np.random.RandomState(seed)
    for i in range(n_steps):
        a, p1, p2 = policy(np.asarray(obs), rng)
        s, obs, info = jstep(
            s, jnp.asarray(a, jnp.int32), jnp.asarray(p1, jnp.float32),
            jnp.asarray(p2, jnp.float32),
        )
        cobs, crew, cstatus = core.step(a, p1, p2)
        np.testing.assert_allclose(
            np.asarray(obs), cobs, atol=ATOL,
            err_msg=f"obs diverged at step {i}")
        np.testing.assert_allclose(
            np.asarray(info.reward), crew, atol=ATOL,
            err_msg=f"reward diverged at step {i}")
        assert int(info.status) == cstatus, f"status diverged at step {i}"
        if bool(info.done):
            return i + 1, int(info.status)
    return n_steps, int(info.status)


def random_policy(obs, rng):
    A = obs.shape[0]
    a = rng.randint(0, 4, size=A)
    a[a == C.TACKLE] = C.DASH  # reference decode excludes tackle
    p1 = np.zeros(A, np.float32)
    p2 = np.zeros(A, np.float32)
    for i in range(A):
        if a[i] == C.DASH:
            p1[i] = rng.uniform(-100, 100)
            p2[i] = rng.uniform(-180, 180)
        elif a[i] == C.TURN:
            p1[i] = rng.uniform(-180, 180)
        elif a[i] == C.KICK:
            p1[i] = rng.uniform(0, 100)
            p2[i] = rng.uniform(-180, 180)
    return a, p1, p2


def scripted_policy(obs, rng):
    """Dash to ball, then shoot — exercises kick/goal paths."""
    A = obs.shape[0]
    a = np.zeros(A, np.int64)
    p1 = np.zeros(A, np.float32)
    p2 = np.zeros(A, np.float32)
    for i in range(A):
        if obs[i, 12] > 0:
            a[i] = C.KICK
            p1[i] = 100.0
            p2[i] = np.degrees(np.arctan2(obs[i, 13], obs[i, 14]))
        else:
            a[i] = C.DASH
            p1[i] = 100.0
            p2[i] = np.degrees(np.arctan2(obs[i, 51], obs[i, 52]))
    return a, p1, p2


class TestTrajectoryParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_policy_full_episode(self, seed):
        steps, status = run_pair(EnvConfig(), 520, random_policy, seed)
        assert steps > 10  # the episode ran

    def test_scripted_scoring_episode(self):
        steps, status = run_pair(EnvConfig(ball_x_min=0.1, ball_x_max=0.1),
                                 520, scripted_policy, seed=1)
        assert status == C.GOAL

    def test_multiagent_parity(self):
        cfg = EnvConfig(offense_agents=2)
        steps, status = run_pair(cfg, 200, random_policy, seed=5)
        assert steps > 10

    def test_chaser_keeper_parity(self):
        """1v1 vs the scripted chaser goalie: the JAX in-env NPC branch and
        the C++ core_npc_action counterpart must produce identical
        trajectories (SURVEY.md §2 NPC mapping row)."""
        cfg = EnvConfig(offense_agents=1, defense_npcs=1, defense_goalie=True)
        steps, status = run_pair(cfg, 520, scripted_policy, seed=2,
                                 npc_policy="chaser")
        assert steps > 5
        # the keeper either captures or the striker scores/goes OOB; either
        # way the trajectories agreed step-for-step to termination
        assert status != C.IN_GAME

    def test_dummy_goalie_parity(self):
        cfg = EnvConfig(offense_agents=1, defense_npcs=1, defense_goalie=True)
        steps, status = run_pair(cfg, 520, random_policy, seed=3,
                                 npc_policy="dummy")
        assert steps > 10

    def test_mixed_defense_parity(self):
        """Chaser goalie + idle second defender (per-defender policy list),
        the reference's chaser+dummy mixed topology (dqn_main.cpp:427-436)."""
        cfg = EnvConfig(offense_agents=1, defense_npcs=2, defense_goalie=True)
        steps, status = run_pair(cfg, 300, scripted_policy, seed=4,
                                 npc_policy=("chaser", "dummy"))
        assert steps > 5

    def test_agent2d_defender_parity(self):
        """Agent2d-flavored goalie + field defender: the JAX in-env branches
        and the C++ core counterparts must track step-for-step (the role
        HFO's agent2d bots fill behind --defense-npcs)."""
        cfg = EnvConfig(offense_agents=1, defense_npcs=2, defense_goalie=True)
        steps, status = run_pair(cfg, 520, scripted_policy, seed=6,
                                 npc_policy="agent2d")
        assert steps > 5
        assert status != C.IN_GAME

    def test_agent2d_teammate_parity(self):
        """2v1: learning agent + agent2d-flavored offense teammate vs a
        chaser keeper (the reference's 2v1 passing topology,
        train.sh:116-150)."""
        cfg = EnvConfig(offense_agents=1, offense_npcs=1, defense_npcs=1,
                        defense_goalie=True)
        steps, status = run_pair(cfg, 400, random_policy, seed=7,
                                 npc_policy="chaser",
                                 offense_policy="agent2d")
        assert steps > 5

    def test_agent2d_teammate_shoots_parity(self):
        """Teammate receives and plays the ball: run with the scripted
        striker so the ball reaches the teammate's zone and its kick branch
        executes in both engines."""
        cfg = EnvConfig(offense_agents=1, offense_npcs=1, defense_npcs=1,
                        defense_goalie=True, offense_on_ball=1)
        steps, status = run_pair(cfg, 400, scripted_policy, seed=8,
                                 npc_policy="agent2d",
                                 offense_policy="agent2d")
        assert steps > 5
