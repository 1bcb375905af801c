"""Integration tests for the DDPG learner and the rollout collector."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.hfo_env import HFOEnv, VecHFOEnv
from dqn_hfo_tpu.env.state import EnvConfig
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.agent import (calculate_epsilon, decode_action,
                                       random_actor_output)
from dqn_hfo_tpu.learner.collector import init_collector, rollout_chunk
from dqn_hfo_tpu.learner.ddpg import (DDPGConfig, init_learner, update_n,
                                      update_once)


class TestAgentMachinery:
    def test_decode_excludes_tackle(self):
        out = jnp.zeros((4, 10)).at[:, C.TACKLE].set(99.0)
        a, _, _, _ = decode_action(out)
        assert not np.any(np.asarray(a) == C.TACKLE)

    def test_decode_param_slots(self):
        # dash wins: arg1 = params[0], arg2 = params[1]
        out = jnp.zeros((1, 10))
        out = out.at[0, C.DASH].set(1.0)
        out = out.at[0, 4 + 0].set(55.0).at[0, 4 + 1].set(-30.0)
        a, p1, p2, _ = decode_action(out)
        assert int(a[0]) == C.DASH
        assert float(p1[0]) == 55.0 and float(p2[0]) == -30.0
        # turn wins: arg1 = params[2], arg2 = 0
        out = jnp.zeros((1, 10)).at[0, C.TURN].set(1.0).at[0, 4 + 2].set(77.0)
        a, p1, p2, _ = decode_action(out)
        assert int(a[0]) == C.TURN
        assert float(p1[0]) == 77.0 and float(p2[0]) == 0.0
        # kick wins: arg1 = params[4], arg2 = params[5]
        out = (jnp.zeros((1, 10)).at[0, C.KICK].set(1.0)
               .at[0, 4 + 4].set(88.0).at[0, 4 + 5].set(12.0))
        a, p1, p2, _ = decode_action(out)
        assert int(a[0]) == C.KICK
        assert float(p1[0]) == 88.0 and float(p2[0]) == 12.0

    def test_random_output_ranges(self):
        out = np.asarray(
            random_actor_output(jax.random.PRNGKey(0), (512,))
        )
        assert out.shape == (512, 10)
        assert np.all(out[:, :4] >= -1) and np.all(out[:, :4] <= 1)
        assert np.all(out[:, 4] >= -100) and np.all(out[:, 4] <= 100)  # dash pow
        assert np.all(out[:, 8] >= 0) and np.all(out[:, 8] <= 100)    # kick pow
        for j in (5, 6, 7, 9):
            assert np.all(out[:, j] >= -180) and np.all(out[:, j] <= 180)

    def test_epsilon_schedule(self):
        assert float(calculate_epsilon(0, 10000, 0.1)) == pytest.approx(1.0)
        assert float(calculate_epsilon(5000, 10000, 0.1)) == pytest.approx(0.55)
        assert float(calculate_epsilon(10000, 10000, 0.1)) == pytest.approx(0.1)
        assert float(calculate_epsilon(999999, 10000, 0.1)) == pytest.approx(0.1)


class TestDDPGUpdate:
    def _fill_replay(self, cfg, key, n=256):
        """Synthetic supervised task: target = sum(obs)."""
        rs = rp.init_replay(1024, 8, cfg.state_size)
        keys = jax.random.split(key, n // 8)
        for k in keys:
            obs = jax.random.normal(k, (8, cfg.state_size))
            act = random_actor_output(k, (8,))
            tgt = jnp.sum(obs, axis=-1)
            rs, sid = rp.write_step(rs, obs, act, tgt, obs,
                                    jnp.ones(8, bool))
            rs = rp.label_rows(rs, jnp.asarray([sid], jnp.int32),
                               tgt[None, :], jnp.ones((1, 8), bool))
        return rs

    def test_critic_loss_decreases(self):
        cfg = DDPGConfig(state_size=8, memory_threshold=32, beta=1.0,
                         critic_lr=1e-3)
        key = jax.random.PRNGKey(0)
        ls = init_learner(key, cfg)
        rs = self._fill_replay(cfg, jax.random.PRNGKey(1))
        upd = jax.jit(functools.partial(update_once, cfg=cfg))
        losses = []
        for i in range(300):
            ls, (loss, q, _) = upd(ls, rs)
            losses.append(float(loss))
        assert np.mean(losses[-50:]) < 0.25 * np.mean(losses[:50])

    def test_actor_pushes_q_up(self):
        cfg = DDPGConfig(state_size=8, memory_threshold=32, beta=1.0,
                         actor_lr=1e-3)
        key = jax.random.PRNGKey(0)
        ls = init_learner(key, cfg)
        rs = self._fill_replay(cfg, jax.random.PRNGKey(1))
        upd = jax.jit(functools.partial(update_once, cfg=cfg))
        qs = []
        for i in range(300):
            ls, (loss, q, _) = upd(ls, rs)
            qs.append(float(q))
        assert np.mean(qs[-50:]) > np.mean(qs[:50])

    def test_update_n_respects_threshold(self):
        cfg = DDPGConfig(state_size=8, memory_threshold=10**9)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        rs = self._fill_replay(cfg, jax.random.PRNGKey(1))
        ls2, m = jax.jit(
            functools.partial(update_n, cfg=cfg, max_updates=4)
        )(ls, rs, n_updates=jnp.asarray(4))
        assert int(m["updates"]) == 0
        assert int(ls2.iteration) == 0

    def test_soft_update_moves_targets(self):
        cfg = DDPGConfig(state_size=8, memory_threshold=1, tau=0.5)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        rs = self._fill_replay(cfg, jax.random.PRNGKey(1))
        w0 = np.asarray(ls.actor_target["tower"][0]["w"])
        ls, _ = jax.jit(functools.partial(update_once, cfg=cfg))(ls, rs)
        w1l = np.asarray(ls.actor["tower"][0]["w"])
        w1t = np.asarray(ls.actor_target["tower"][0]["w"])
        np.testing.assert_allclose(w1t, 0.5 * w1l + 0.5 * w0, atol=1e-6)


class TestCollector:
    def test_rollout_chunk_end_to_end(self):
        E, K = 8, 64
        env = HFOEnv(EnvConfig(), DEFAULT_PARAMS, noise_scale=1.0)
        venv = VecHFOEnv(env, E)
        cfg = DDPGConfig(state_size=59)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        rs = rp.init_replay(4096, E, 59)
        cs = init_collector(venv, jax.random.PRNGKey(1), K)

        roll = jax.jit(functools.partial(
            rollout_chunk, venv=venv, chunk_len=K, gamma=cfg.gamma))
        # epsilon=1: pure exploration
        cs, rs, m = roll(cs, rs, ls.actor, jnp.asarray(1.0))
        assert int(m["env_steps"]) == E * K
        # second chunk: first chunk's completed episodes become sampleable
        cs, rs, m2 = roll(cs, rs, ls.actor, jnp.asarray(1.0))
        assert int(rp.valid_count(rs)) > 0
        # all labeled rows hold finite targets
        valid = np.asarray(rs.valid)
        assert np.all(np.isfinite(np.asarray(rs.target)[valid]))

    def test_labels_match_reference_recurrence(self):
        """Replay MC targets equal r_i + gamma * t_{i+1} within episodes."""
        E, K = 4, 128
        env = HFOEnv(EnvConfig(), DEFAULT_PARAMS, noise_scale=1.0)
        venv = VecHFOEnv(env, E)
        cfg = DDPGConfig(state_size=59)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        rs = rp.init_replay(E * K * 4, E, 59)
        cs = init_collector(venv, jax.random.PRNGKey(1), K)
        roll = jax.jit(functools.partial(
            rollout_chunk, venv=venv, chunk_len=K, gamma=cfg.gamma))
        for _ in range(3):
            cs, rs, _ = roll(cs, rs, ls.actor, jnp.asarray(1.0))
        valid = np.asarray(rs.valid)      # (S+1, E)
        tgt = np.asarray(rs.target)
        rew = np.asarray(rs.reward)
        term = np.asarray(rs.terminal)
        S = rp.steps_capacity(rs)
        checked = 0
        for s, e in zip(*np.nonzero(valid)):
            if term[s, e]:
                assert tgt[s, e] == pytest.approx(rew[s, e], abs=1e-5)
                checked += 1
            else:
                # same env's next step is the next step-row (ring-wrapped)
                s2 = (s + 1) % S
                if valid[s2, e]:
                    assert tgt[s, e] == pytest.approx(
                        rew[s, e] + cfg.gamma * tgt[s2, e], abs=1e-4)
                    checked += 1
        assert checked > 100
