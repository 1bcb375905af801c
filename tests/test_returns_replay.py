"""Tests for MC-return labeling (ops/returns) and the on-device replay."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.ops.returns import episode_end_index, label_mask, mc_returns


def ref_label(rewards, gamma):
    """LabelTransitions (dqn.cpp:783-797) on a single episode."""
    out = np.zeros_like(rewards)
    out[-1] = rewards[-1]
    for i in range(len(rewards) - 2, -1, -1):
        out[i] = rewards[i] + gamma * out[i + 1]
    return out


class TestMCReturns:
    def test_single_episode_matches_reference(self):
        r = np.asarray([0.1, -0.2, 0.0, 5.0], np.float32)
        d = np.asarray([False, False, False, True])
        got = mc_returns(jnp.asarray(r)[:, None], jnp.asarray(d)[:, None], 0.99)
        np.testing.assert_allclose(np.asarray(got)[:, 0], ref_label(r, 0.99),
                                   rtol=1e-6)

    def test_multiple_episodes_cut(self):
        r = np.asarray([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
        d = np.asarray([False, True, False, False, True])
        got = np.asarray(
            mc_returns(jnp.asarray(r)[:, None], jnp.asarray(d)[:, None], 0.5)
        )[:, 0]
        np.testing.assert_allclose(got[:2], ref_label(r[:2], 0.5), rtol=1e-6)
        np.testing.assert_allclose(got[2:], ref_label(r[2:], 0.5), rtol=1e-6)

    def test_episode_end_index(self):
        d = jnp.asarray([[0, 1, 0, 0, 1, 0]], bool).T  # (6, 1)
        j = np.asarray(episode_end_index(d))[:, 0]
        np.testing.assert_array_equal(j, [1, 1, 4, 4, 4, 6])

    def test_label_mask_window(self):
        # window of 6 = [prev 3 | cur 3]; dones at 1 (prev) and 4 (cur)
        d = jnp.asarray([[0, 1, 0, 0, 1, 0]], bool).T
        m = np.asarray(label_mask(d, 3))[:, 0]
        # entries 2..4 belong to the episode ending at 4 (in cur chunk)
        np.testing.assert_array_equal(m, [False, False, True, True, True, False])


class TestReplay:
    def make(self, cap=64, E=8, F=4):
        return rp.init_replay(cap, E, F)

    @staticmethod
    def _ids(step_id):
        return jnp.asarray([step_id], jnp.int32)

    def test_write_and_label_roundtrip(self):
        E, F = 8, 4
        rs = self.make(64, E, F)
        obs = jnp.arange(E * F, dtype=jnp.float32).reshape(E, F)
        act = jnp.ones((E, 10))
        rew = jnp.arange(E, dtype=jnp.float32)
        rs, sid = rp.write_step(rs, obs, act, rew, obs + 1, jnp.zeros(E, bool))
        assert int(rp.valid_count(rs)) == 0  # unlabeled yet
        targets = jnp.full((1, E), 7.0)
        rs = rp.label_rows(rs, self._ids(sid), targets, jnp.ones((1, E), bool))
        assert int(rp.valid_count(rs)) == E
        idx = jnp.arange(E)  # step 0, envs 0..E-1 are flat entries 0..E-1
        o, a, r, t, no, term = rp.gather(rs, idx)
        np.testing.assert_allclose(np.asarray(t), 7.0)
        np.testing.assert_allclose(np.asarray(o), np.asarray(obs))
        np.testing.assert_allclose(np.asarray(no), np.asarray(obs) + 1)

    def test_ring_eviction_invalidates(self):
        E, F = 8, 4
        rs = self.make(16, E, F)  # 2 step-rows
        ids = []
        for i in range(3):  # third write wraps and overwrites first
            obs = jnp.full((E, F), float(i))
            rs, sid = rp.write_step(rs, obs, jnp.zeros((E, 10)),
                                    jnp.zeros(E), obs, jnp.zeros(E, bool))
            ids.append(sid)
        # labeling the overwritten first write must be a no-op
        rs = rp.label_rows(rs, self._ids(ids[0]), jnp.ones((1, E)),
                           jnp.ones((1, E), bool))
        assert int(rp.valid_count(rs)) == 0
        # labeling the freshest write works
        rs = rp.label_rows(rs, self._ids(ids[2]), jnp.ones((1, E)),
                           jnp.ones((1, E), bool))
        assert int(rp.valid_count(rs)) == E

    def test_sample_only_valid(self):
        E, F = 8, 4
        rs = self.make(64, E, F)
        obs = jnp.zeros((E, F))
        rs, sid = rp.write_step(rs, obs, jnp.zeros((E, 10)),
                                jnp.zeros(E), obs, jnp.zeros(E, bool))
        # only label the first 3 env columns of step 0
        m = jnp.zeros((1, E), bool).at[0, :3].set(True)
        rs = rp.label_rows(rs, self._ids(sid), jnp.zeros((1, E)), m)
        idx = rp.sample(rs, jax.random.PRNGKey(0), 256)
        assert set(np.asarray(idx).tolist()) <= {0, 1, 2}

    def test_capacity_rounding(self):
        rs = rp.init_replay(100, 8, 4)
        assert rp.capacity_of(rs) == 104  # 13 step-rows x 8 envs

    def test_trash_row_never_sampled(self):
        E, F = 4, 3
        rs = self.make(8, E, F)  # S = 2
        S = rp.steps_capacity(rs)
        obs = jnp.zeros((E, F))
        rs, sid = rp.write_step(rs, obs, jnp.zeros((E, 10)), jnp.zeros(E),
                                obs, jnp.zeros(E, bool))
        # stale id scatters into the trash row, which must stay invalid
        rs = rp.label_rows(rs, jnp.asarray([-1], jnp.int32),
                           jnp.ones((1, E)), jnp.ones((1, E), bool))
        assert not bool(rs.valid[S].any())
        assert int(rp.valid_count(rs)) == 0

    def test_sampling_uniformity(self):
        E, F = 8, 4
        rs = self.make(64, E, F)
        obs = jnp.zeros((E, F))
        for _ in range(2):
            rs, sid = rp.write_step(rs, obs, jnp.zeros((E, 10)),
                                    jnp.zeros(E), obs, jnp.zeros(E, bool))
            rs = rp.label_rows(rs, self._ids(sid), jnp.zeros((1, E)),
                               jnp.ones((1, E), bool))
        idx = np.asarray(rp.sample(rs, jax.random.PRNGKey(1), 4096))
        counts = np.bincount(idx, minlength=16)[:16]
        assert counts.min() > 150  # ~256 expected each
