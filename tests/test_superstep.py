"""The fused superstep (runtime/superstep.py) must be semantically
equivalent to the sequential per-chunk path: scanning N chunks of
(epsilon-from-iteration -> rollout_chunk -> update_n) in one program has to
produce the same learner/collector/replay state and the same per-chunk
metrics as dispatching the same N chunks one by one (the reference cadence,
dqn_main.cpp:352-363)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.hfo_env import HFOEnv, VecHFOEnv
from dqn_hfo_tpu.env.state import EnvConfig
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.agent import calculate_epsilon
from dqn_hfo_tpu.learner.collector import init_collector, rollout_chunk
from dqn_hfo_tpu.learner.ddpg import DDPGConfig, init_learner, update_n
from dqn_hfo_tpu.runtime.superstep import build_superstep

E, CHUNK, UPC = 4, 30, 12  # envs, chunk_len, updates per chunk


def _setup():
    sp = dataclasses.replace(DEFAULT_PARAMS, frames_per_trial=30,
                             untouched_time=20)
    env = HFOEnv(EnvConfig(), sp, noise_scale=1.0)
    venv = VecHFOEnv(env, E)
    dcfg = DDPGConfig(state_size=59, memory_threshold=8,
                      actor_tower=(32,), critic_tower=(32,))
    ls = init_learner(jax.random.PRNGKey(0), dcfg)
    rs = rp.init_replay(600, E, 59)
    cs = init_collector(venv, jax.random.PRNGKey(1), CHUNK)
    roll = functools.partial(rollout_chunk, venv=venv, chunk_len=CHUNK,
                             gamma=0.99)
    upd = lambda l, r, n: update_n(l, r, cfg=dcfg, n_updates=n,
                                   max_updates=UPC)
    return ls, cs, rs, roll, upd


class TestSuperstepEquivalence:
    def test_matches_sequential_chunks(self):
        ls, cs, rs, roll, upd = _setup()
        S = 3
        ss = jax.jit(build_superstep(roll, upd, UPC, 0.1, S))
        ls2, cs2, rs2, rows = ss(ls, cs, rs, jnp.asarray(S), jnp.asarray(100), jnp.asarray(0))

        # sequential reference path, same epsilon schedule
        roll_j, upd_j = jax.jit(roll), jax.jit(upd)
        seq = []
        for _ in range(S):
            eps = calculate_epsilon(jnp.max(ls.iteration), 100, 0.1)
            cs, rs, m = roll_j(cs, rs, ls.actor, eps)
            ls, um = upd_j(ls, rs, jnp.asarray(UPC))
            seq.append((m, um))

        # learner params identical (same op order, same keys)
        for a, b in zip(jax.tree_util.tree_leaves(ls.actor),
                        jax.tree_util.tree_leaves(ls2.actor)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
        assert int(ls.iteration) == int(ls2.iteration) == S * UPC
        np.testing.assert_array_equal(np.asarray(rs.valid),
                                      np.asarray(rs2.valid))
        # per-chunk metric rows match the sequential metrics
        for i, (m, um) in enumerate(seq):
            assert bool(rows["active"][i])
            assert int(rows["episodes"][i]) == int(m["episodes"])
            assert int(rows["u_updates"][i]) == int(um["updates"])
            np.testing.assert_allclose(float(rows["u_critic_loss"][i]),
                                       float(um["critic_loss"]), atol=1e-5)
            assert int(rows["iter"][i]) == (i + 1) * UPC

    def test_inactive_tail_chunks_are_skipped(self):
        ls, cs, rs, roll, upd = _setup()
        S = 4
        ss = jax.jit(build_superstep(roll, upd, UPC, 0.1, S))
        ls2, cs2, rs2, rows = ss(ls, cs, rs, jnp.asarray(2), jnp.asarray(100), jnp.asarray(0))
        assert list(np.asarray(rows["active"])) == [True, True, False, False]
        assert int(ls2.iteration) == 2 * UPC
        # skipped rows are zero-filled with finite=True
        assert int(rows["env_steps"][2]) == 0
        assert bool(rows["u_finite"][3])
