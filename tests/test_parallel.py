"""Data-parallel training tests on a simulated 8-device CPU mesh
(SURVEY.md §4: multi-host logic testable without a pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.hfo_env import HFOEnv
from dqn_hfo_tpu.env.state import EnvConfig
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.ddpg import DDPGConfig, init_learner
from dqn_hfo_tpu.parallel.mesh import DataParallel, make_mesh


def make_dp(n_envs=16, chunk_len=32, memory=4096, minibatch=32,
            max_updates=8):
    mesh = make_mesh()
    # short trials so episodes complete within a chunk (window invariant:
    # chunk_len >= frames_per_trial)
    import dataclasses
    sp = dataclasses.replace(DEFAULT_PARAMS, frames_per_trial=24,
                             untouched_time=16)
    env = HFOEnv(EnvConfig(), sp, noise_scale=1.0)
    dcfg = DDPGConfig(state_size=59, minibatch=minibatch, memory_threshold=64)
    return DataParallel(
        mesh=mesh, env=env, n_envs=n_envs, chunk_len=chunk_len, dcfg=dcfg,
        memory=memory, max_updates=max_updates, gamma=dcfg.gamma,
    )


@pytest.fixture(scope="module")
def dp():
    return make_dp()


class TestDataParallel:
    def test_mesh_has_8_devices(self):
        assert make_mesh().devices.size == 8

    def test_sharded_init_distinct_shards(self, dp):
        cs, rs = dp.init_state(jax.random.PRNGKey(0))
        # env ball positions must differ across shards (per-shard key folding)
        bp = np.asarray(cs.env_states.ball_pos)       # (16, 2)
        assert len({tuple(np.round(r, 5)) for r in bp}) > 8
        assert rs.obs.shape[1] == 16                  # global env axis

    def test_train_step_runs_and_aggregates(self, dp):
        ls = init_learner(jax.random.PRNGKey(1), dp.dcfg)
        ls = dp.replicate_learner(ls)
        cs, rs = dp.init_state(jax.random.PRNGKey(0))
        ls, cs, rs, m, um = dp.train_step(ls, cs, rs, 1.0, 8)
        assert int(m["env_steps"]) == 16 * 32          # global psum
        # second chunk: labels land, updates run
        ls, cs, rs, m, um = dp.train_step(ls, cs, rs, 1.0, 8)
        assert int(rp.valid_count(rs)) > 0
        assert int(um["updates"]) == 8
        assert int(ls.iteration) in (8, 16)  # chunk 1 may already update
        assert np.isfinite(float(um["critic_loss"]))

    def test_learner_stays_replicated(self, dp):
        """After pmean'd updates the replicated learner must be identical on
        every device (the DP invariant)."""
        ls = init_learner(jax.random.PRNGKey(1), dp.dcfg)
        ls = dp.replicate_learner(ls)
        cs, rs = dp.init_state(jax.random.PRNGKey(0))
        for _ in range(3):
            ls, cs, rs, m, um = dp.train_step(ls, cs, rs, 1.0, 4)
        w = ls.actor["tower"][0]["w"]
        shards = [np.asarray(s.data) for s in w.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

    def test_dp_matches_single_device_update_semantics(self):
        """A DP update with global batch 32 over 8 shards equals (in
        expectation structure, not exact sample) a single update: check the
        gradient-pmean plumbing by verifying the iteration counter and that
        params actually move."""
        dp = make_dp(n_envs=8, chunk_len=16, minibatch=32, max_updates=4,
                     memory=2048)
        ls = init_learner(jax.random.PRNGKey(2), dp.dcfg)
        ls = dp.replicate_learner(ls)
        w0 = np.asarray(ls.actor["tower"][0]["w"])
        cs, rs = dp.init_state(jax.random.PRNGKey(3))
        for _ in range(3):
            ls, cs, rs, m, um = dp.train_step(ls, cs, rs, 1.0, 4)
        assert int(ls.iteration) > 0
        assert not np.allclose(w0, np.asarray(ls.actor["tower"][0]["w"]))
