"""Multi-agent training tests: agent axis, layer sharing (P3), shared
replay (P2)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.hfo_env import HFOEnv, VecHFOEnv
from dqn_hfo_tpu.env.state import EnvConfig
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.ddpg import DDPGConfig
from dqn_hfo_tpu.learner.multi import (MultiConfig, init_multi_collector,
                                       init_multi_learner,
                                       multi_rollout_chunk, multi_update_n)

A, E, K = 2, 4, 32
SP = dataclasses.replace(DEFAULT_PARAMS, frames_per_trial=24,
                         untouched_time=16)


def setup(share_actor=0, share_critic=0, share_replay=False, seed=0):
    env = HFOEnv(EnvConfig(offense_agents=A), SP, noise_scale=1.0)
    venv = VecHFOEnv(env, E)
    dcfg = DDPGConfig(state_size=env.cfg.state_size, memory_threshold=32)
    mcfg = MultiConfig(n_agents=A, share_actor_layers=share_actor,
                       share_critic_layers=share_critic,
                       share_replay=share_replay)
    mls = init_multi_learner(jax.random.PRNGKey(seed), dcfg, mcfg)
    rs = rp.init_replay(A * E * 256, A * E, dcfg.state_size)
    cs = init_multi_collector(venv, jax.random.PRNGKey(seed + 1), K, A)
    roll = jax.jit(functools.partial(
        multi_rollout_chunk, venv=venv, chunk_len=K, gamma=dcfg.gamma,
        n_agents=A))
    upd = jax.jit(functools.partial(
        multi_update_n, dcfg=dcfg, mcfg=mcfg, max_updates=4))
    return mls, rs, cs, roll, upd


class TestMultiAgent:
    def test_stacked_learner_shapes(self):
        mls, *_ = setup()
        assert mls.actor["tower"][0]["w"].shape[0] == A

    def test_rollout_and_update(self):
        mls, rs, cs, roll, upd = setup()
        for _ in range(3):
            cs, rs, m = roll(cs, rs, mls.actor, jnp.asarray(1.0))
        assert int(rp.valid_count(rs)) > 0
        mls, um = upd(mls, rs, n_updates=jnp.asarray(4))
        assert int(um["updates"]) == 4
        assert int(mls.iteration[0]) == 4 and int(mls.iteration[1]) == 4

    def test_agents_diverge_without_sharing(self):
        mls, rs, cs, roll, upd = setup()
        for _ in range(3):
            cs, rs, m = roll(cs, rs, mls.actor, jnp.asarray(1.0))
        mls, _ = upd(mls, rs, n_updates=jnp.asarray(4))
        w = np.asarray(mls.actor["tower"][0]["w"])
        assert not np.allclose(w[0], w[1])  # independent inits + updates

    def test_shared_layers_stay_identical(self):
        mls, rs, cs, roll, upd = setup(share_actor=2, share_critic=1)
        w = np.asarray(mls.actor["tower"][0]["w"])
        np.testing.assert_array_equal(w[0], w[1])  # broadcast at init
        for _ in range(3):
            cs, rs, m = roll(cs, rs, mls.actor, jnp.asarray(1.0))
        mls, um = upd(mls, rs, n_updates=jnp.asarray(4))
        assert int(um["updates"]) == 4
        # shared prefix identical after updates...
        for i in (0, 1):
            wa = np.asarray(mls.actor["tower"][i]["w"])
            np.testing.assert_array_equal(wa[0], wa[1])
        wc = np.asarray(mls.critic["tower"][0]["w"])
        np.testing.assert_array_equal(wc[0], wc[1])
        # ...and it moved (updates applied)
        assert not np.allclose(w[0], np.asarray(mls.actor["tower"][0]["w"])[0])
        # unshared layers diverge
        w3 = np.asarray(mls.actor["tower"][2]["w"])
        assert not np.allclose(w3[0], w3[1])

    def test_shared_replay_spans_agents(self):
        mls, rs, cs, roll, upd = setup(share_replay=True)
        for _ in range(3):
            cs, rs, m = roll(cs, rs, mls.actor, jnp.asarray(1.0))
        # valid entries exist in both agents' column blocks
        valid = np.asarray(rs.valid)
        assert valid[:, :E].any() and valid[:, E:].any()

    def test_per_agent_rewards_differ(self):
        """Agents occupy different positions -> different shaped rewards."""
        mls, rs, cs, roll, upd = setup()
        cs, rs, m = roll(cs, rs, mls.actor, jnp.asarray(1.0))
        rews = np.asarray(rs.reward[: K - 1])  # (steps, A*E)
        a0 = rews[:, :E]
        a1 = rews[:, E:]
        assert not np.allclose(a0, a1)


class Test2v2:
    """BASELINE config 5 topology: 2 learning agents vs chaser defense."""

    def test_2v2_rollout_and_update(self):
        import functools
        cfg = EnvConfig(offense_agents=2, defense_npcs=2, defense_goalie=True)
        env = HFOEnv(cfg, SP, noise_scale=1.0, npc_policy="chaser")
        venv = VecHFOEnv(env, E)
        assert cfg.n_players == 4 and cfg.state_size == 86
        dcfg = DDPGConfig(state_size=86, memory_threshold=32)
        mcfg = MultiConfig(n_agents=2, share_actor_layers=2,
                           share_replay=True)
        mls = init_multi_learner(jax.random.PRNGKey(0), dcfg, mcfg)
        rs = rp.init_replay(2 * E * 128, 2 * E, 86)
        cs = init_multi_collector(venv, jax.random.PRNGKey(1), K, 2)
        roll = jax.jit(functools.partial(
            multi_rollout_chunk, venv=venv, chunk_len=K, gamma=dcfg.gamma,
            n_agents=2))
        upd = jax.jit(functools.partial(
            multi_update_n, dcfg=dcfg, mcfg=mcfg, max_updates=4))
        for _ in range(3):
            cs, rs, m = roll(cs, rs, mls.actor, jnp.asarray(1.0))
        assert int(rp.valid_count(rs)) > 0
        mls, um = upd(mls, rs, n_updates=jnp.asarray(4))
        assert int(um["updates"]) == 4
        # defense captures happen against random agents
        assert int(m["episodes"]) > 0


class Test3v3:
    """The agent axis generalizes past A=2 (the reference's thread model
    allowed up to 10 player threads, dqn_main.cpp:62): 3 learning agents
    with a shared 2-layer prefix + shared replay vs keeper + 2 chasers."""

    def test_3v3_rollout_update_and_sharing(self):
        cfg = EnvConfig(offense_agents=3, defense_npcs=3,
                        defense_goalie=True)
        env = HFOEnv(cfg, SP, noise_scale=1.0, npc_policy="chaser")
        venv = VecHFOEnv(env, E)
        assert cfg.n_players == 6 and cfg.state_size == 50 + 9 * 6
        dcfg = DDPGConfig(state_size=cfg.state_size, memory_threshold=32)
        mcfg = MultiConfig(n_agents=3, share_actor_layers=2,
                           share_critic_layers=2, share_replay=True)
        mls = init_multi_learner(jax.random.PRNGKey(0), dcfg, mcfg)
        rs = rp.init_replay(3 * E * 256, 3 * E, dcfg.state_size)
        cs = init_multi_collector(venv, jax.random.PRNGKey(1), K, 3)
        roll = jax.jit(functools.partial(
            multi_rollout_chunk, venv=venv, chunk_len=K, gamma=dcfg.gamma,
            n_agents=3))
        upd = jax.jit(functools.partial(
            multi_update_n, dcfg=dcfg, mcfg=mcfg, max_updates=4))
        for _ in range(2):
            cs, rs, m = roll(cs, rs, mls.actor, jnp.asarray(1.0))
            mls, um = upd(mls, rs, n_updates=4)
        assert int(um["updates"]) == 4
        assert m["sum_episode_return"].shape == (3,)
        # shared prefix identical across all 3 agents after updates
        w = np.asarray(mls.actor["tower"][0]["w"])
        np.testing.assert_array_equal(w[0], w[1])
        np.testing.assert_array_equal(w[1], w[2])
        # unshared heads diverge
        ph = np.asarray(mls.actor["param_head"]["w"])
        assert not np.allclose(ph[0], ph[1])


class TestShareModes:
    """P3 sharing has two update modes (multi.py module docstring):
    "batched" (default; one vmapped program, prefix deltas summed once per
    iteration — the deterministic analogue of the reference's concurrent
    unsynchronized ShareData mutation, dqn.cpp:1037-1046) and "serialized"
    (rounds 2-4 agent-by-agent unroll).  They are NOT bitwise-identical —
    serialized computes agent a's gradient at the prefix agent a-1 just
    wrote — but must agree to first order in the learning rate."""

    def _run(self, mode, n_updates=8, seed=0):
        env = HFOEnv(EnvConfig(offense_agents=A), SP, noise_scale=1.0)
        venv = VecHFOEnv(env, E)
        dcfg = DDPGConfig(state_size=env.cfg.state_size, memory_threshold=32)
        mcfg = MultiConfig(n_agents=A, share_actor_layers=2,
                           share_critic_layers=2, share_mode=mode)
        mls = init_multi_learner(jax.random.PRNGKey(seed), dcfg, mcfg)
        rs = rp.init_replay(A * E * 256, A * E, dcfg.state_size)
        cs = init_multi_collector(venv, jax.random.PRNGKey(seed + 1), K, A)
        roll = jax.jit(functools.partial(
            multi_rollout_chunk, venv=venv, chunk_len=K, gamma=dcfg.gamma,
            n_agents=A))
        for _ in range(3):
            cs, rs, _ = roll(cs, rs, mls.actor, jnp.asarray(1.0))
        upd = jax.jit(functools.partial(
            multi_update_n, dcfg=dcfg, mcfg=mcfg, max_updates=n_updates))
        mls0 = mls
        mls, um = upd(mls, rs, n_updates=jnp.asarray(n_updates))
        assert int(um["updates"]) == n_updates
        return mls0, mls

    def test_batched_prefix_stays_identical_and_moves(self):
        mls0, mls = self._run("batched")
        for i in (0, 1):
            w = np.asarray(mls.actor["tower"][i]["w"])
            np.testing.assert_array_equal(w[0], w[1])
            wc = np.asarray(mls.critic["tower"][i]["w"])
            np.testing.assert_array_equal(wc[0], wc[1])
        assert not np.allclose(np.asarray(mls0.actor["tower"][0]["w"]),
                               np.asarray(mls.actor["tower"][0]["w"]))
        # unshared layers diverge between agents
        w3 = np.asarray(mls.actor["tower"][2]["w"])
        assert not np.allclose(w3[0], w3[1])

    def test_serialized_prefix_stays_identical(self):
        _, mls = self._run("serialized")
        for i in (0, 1):
            w = np.asarray(mls.actor["tower"][i]["w"])
            np.testing.assert_array_equal(w[0], w[1])

    def _run_sgd(self, mode, lr):
        """One update burst under plain SGD (no momentum, no Adam
        normalization) — the regime where the serialized/batched gap is
        provably second-order: gap = lr * (g(P + d0) - g(P)) = O(lr^2)
        while the move itself is O(lr)."""
        env = HFOEnv(EnvConfig(offense_agents=A), SP, noise_scale=1.0)
        venv = VecHFOEnv(env, E)
        dcfg = DDPGConfig(state_size=env.cfg.state_size, memory_threshold=32,
                          solver="sgd", momentum=0.0, actor_lr=lr,
                          critic_lr=lr, tau=0.0)
        mcfg = MultiConfig(n_agents=A, share_actor_layers=2,
                           share_critic_layers=2, share_mode=mode)
        mls = init_multi_learner(jax.random.PRNGKey(0), dcfg, mcfg)
        rs = rp.init_replay(A * E * 256, A * E, dcfg.state_size)
        cs = init_multi_collector(venv, jax.random.PRNGKey(1), K, A)
        roll = jax.jit(functools.partial(
            multi_rollout_chunk, venv=venv, chunk_len=K, gamma=dcfg.gamma,
            n_agents=A))
        for _ in range(3):
            cs, rs, _ = roll(cs, rs, mls.actor, jnp.asarray(1.0))
        upd = jax.jit(functools.partial(
            multi_update_n, dcfg=dcfg, mcfg=mcfg, max_updates=1))
        mls0 = mls
        mls, _ = upd(mls, rs, n_updates=jnp.asarray(1))
        return mls0, mls

    def test_modes_agree_to_first_order_sgd(self):
        """Serialized computes agent 1's gradient at the prefix agent 0
        just wrote; batched computes it at the common starting prefix.
        Under SGD the resulting gap is second order in the lr, so at a
        small lr it must vanish relative to the update itself.  (Under
        Adam the per-coordinate normalization amplifies early-training
        sign flips and the modes only agree in direction — the
        capability-level check for the Adam path is the committed 2v2
        sharing ablation run with share_mode=batched, RESULTS.md r5.)"""
        mls0_b, mls_b = self._run_sgd("batched", lr=1e-4)
        _, mls_s = self._run_sgd("serialized", lr=1e-4)
        for net in ("actor", "critic"):
            for i in (0, 1):
                w0 = np.asarray(getattr(mls0_b, net)["tower"][i]["w"])[0]
                wb = np.asarray(getattr(mls_b, net)["tower"][i]["w"])[0]
                ws = np.asarray(getattr(mls_s, net)["tower"][i]["w"])[0]
                move = np.linalg.norm(ws - w0)
                gap = np.linalg.norm(wb - ws)
                assert move > 0.0
                assert gap < 0.01 * move, (net, i, gap, move, gap / move)


class TestPresampledMultiUpdate:
    """multi_update_n hoists per-agent replay sampling out of its scan
    (multi_presample: one validity prefix-sum per agent per burst — the
    frozen-buffer hoist of ddpg.update_n, reference per-update sampling
    semantics dqn.cpp:846,501-509)."""

    def _filled_replay(self, seed=0):
        mls, rs, cs, roll, _ = setup(seed=seed)
        for _ in range(3):
            cs, rs, m = roll(cs, rs, mls.actor, jnp.asarray(1.0))
        return rs

    def test_presample_respects_agent_views(self):
        """Unshared: agent a's presampled flat indices must all fall in its
        own column block of the (S+1, A*E) buffer."""
        from dqn_hfo_tpu.learner.multi import multi_presample
        rs = self._filled_replay()
        dcfg = DDPGConfig(state_size=59, memory_threshold=32)
        mcfg = MultiConfig(n_agents=A, share_replay=False)
        keys = jax.random.split(jax.random.PRNGKey(3), A)
        idx, has_data = jax.jit(
            lambda rs, keys: multi_presample(rs, dcfg, mcfg, keys, 256))(
                rs, keys)
        assert bool(np.all(np.asarray(has_data)))
        cols = np.asarray(idx) % (A * E)   # flat index -> column
        for a in range(A):
            assert np.all((cols[a] >= a * E) & (cols[a] < (a + 1) * E)), \
                f"agent {a} sampled outside its block"

    def test_identical_agents_stay_identical_without_sharing(self):
        """Two agents with identical params/rng and identical (unshared)
        replay blocks must produce bitwise-identical updates — pins that
        presampled indices are drawn consistently per agent VIEW (the k-th
        valid entry of each block), not from the global buffer."""
        rs = self._filled_replay()
        # duplicate agent 0's columns into agent 1's block
        def dup(x):
            x = np.array(x)
            x[:, E:2 * E] = x[:, :E]
            return jnp.asarray(x)
        rs = rp.ReplayState(**{k: (dup(v) if k != "cursor" else v)
                               for k, v in rs._asdict().items()})
        dcfg = DDPGConfig(state_size=rs.obs.shape[-1], memory_threshold=32)
        mcfg = MultiConfig(n_agents=A, share_replay=False)
        from dqn_hfo_tpu.learner.multi import (init_multi_learner,
                                               multi_update_n)
        mls = init_multi_learner(jax.random.PRNGKey(5), dcfg, mcfg)
        # clone agent 0's full learner slice (params, opt, rng) into agent 1
        mls = jax.tree_util.tree_map(
            lambda x: x.at[1].set(x[0]), mls)
        mls, um = jax.jit(functools.partial(
            multi_update_n, dcfg=dcfg, mcfg=mcfg, max_updates=3))(
                mls, rs, n_updates=3)
        assert int(um["updates"]) == 3
        for leaf in jax.tree_util.tree_leaves(
                (mls.actor, mls.critic, mls.actor_opt, mls.critic_opt)):
            x = np.asarray(leaf)
            np.testing.assert_array_equal(x[0], x[1])
