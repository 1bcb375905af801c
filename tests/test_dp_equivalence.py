"""DP numerical-equivalence tests: pin the per-shard-sampling + gradient
pmean semantics the distribution story rests on.

(a) a 1-device mesh reproduces the unsharded `update_n` bitwise;
(b) an N-device mesh with a controlled global sample stream matches a
    single-device batch-32 update (allclose — reduction order differs);
(c) same as (a) for `multi_update_n` with layer sharing + shared replay.

Reference semantics being preserved: the single-GPU update
(/root/reference/src/dqn.cpp:828-972) — DP must be a pure batch-split of it.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.ddpg import (DDPGConfig, init_learner, update_n,
                                      update_once)
from dqn_hfo_tpu.learner.multi import (MultiConfig, init_multi_learner,
                                       multi_update_n)
from dqn_hfo_tpu.parallel.mesh import replay_specs

F = 23  # small state for speed


def synth_replay(key, E, S=32, n_valid=24, obs_size=F, action_size=10):
    """A filled replay: rows [0, n_valid) valid across all E columns."""
    ks = jax.random.split(key, 6)
    rs = rp.init_replay(S * E, E, obs_size, action_size=action_size)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -1.0, 1.0)
    valid = jnp.zeros((S + 1, E), bool).at[:n_valid].set(True)
    return rs._replace(
        obs=u(ks[0], rs.obs.shape),
        action=u(ks[1], rs.action.shape),
        reward=u(ks[2], rs.reward.shape),
        target=u(ks[3], rs.target.shape),
        next_obs=u(ks[4], rs.next_obs.shape),
        terminal=jax.random.bernoulli(ks[5], 0.2, rs.terminal.shape),
        valid=valid,
        cursor=jnp.asarray(n_valid, jnp.int32),
    )


def tree_assert(fn, a, b):
    jax.tree_util.tree_map(
        lambda x, y: fn(np.asarray(x), np.asarray(y)), a, b)


def small_cfg(**kw):
    kw.setdefault("state_size", F)
    kw.setdefault("memory_threshold", 8)
    kw.setdefault("actor_tower", (16, 16))
    kw.setdefault("critic_tower", (16, 16))
    return DDPGConfig(**kw)


class TestOneDeviceMeshBitwise:
    def test_update_n_1device_mesh_equals_unsharded(self):
        cfg = small_cfg(minibatch=16)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        rs = synth_replay(jax.random.PRNGKey(1), E=4)

        ref_ls, ref_m = jax.jit(functools.partial(
            update_n, cfg=cfg, max_updates=4))(ls, rs, n_updates=4)

        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        fn = shard_map(
            lambda ls, rs, n: update_n(ls, rs, cfg, n[0], 4,
                                       axis_name="data"),
            mesh=mesh, in_specs=(P(), replay_specs(), P()),
            out_specs=(P(), P()), check_vma=False)
        dp_ls, dp_m = jax.jit(fn)(ls, rs, jnp.asarray([4], jnp.int32))

        tree_assert(np.testing.assert_array_equal, ref_ls, dp_ls)
        assert int(ref_m["updates"]) == int(dp_m["updates"]) == 4
        np.testing.assert_array_equal(np.asarray(ref_m["critic_loss"]),
                                      np.asarray(dp_m["critic_loss"]))

    @pytest.mark.parametrize("mode", ["serialized", "batched"])
    def test_multi_update_n_sharing_1device_mesh_equals_unsharded(self, mode):
        """serialized: bitwise (the sharing step is pure copies, so the
        mesh/unsharded programs fuse identically).  batched: the
        once-per-iteration prefix delta-sum is new arithmetic whose fusion
        XLA orders differently inside shard_map — equality holds to f32
        ULP (observed max 3e-12 absolute), pinned at atol 1e-9."""
        cfg = small_cfg(minibatch=16)
        mcfg = MultiConfig(n_agents=2, share_actor_layers=2,
                           share_critic_layers=1, share_replay=True,
                           share_mode=mode)
        mls = init_multi_learner(jax.random.PRNGKey(2), cfg, mcfg)
        rs = synth_replay(jax.random.PRNGKey(3), E=8)  # (A=2) x (E=4) cols

        ref_ls, ref_m = jax.jit(functools.partial(
            multi_update_n, dcfg=cfg, mcfg=mcfg, max_updates=3))(
                mls, rs, n_updates=3)

        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        fn = shard_map(
            lambda mls, rs, n: multi_update_n(mls, rs, cfg, mcfg, n[0], 3,
                                              axis_name="data"),
            mesh=mesh, in_specs=(P(), replay_specs(), P()),
            out_specs=(P(), P()), check_vma=False)
        dp_ls, dp_m = jax.jit(fn)(mls, rs, jnp.asarray([3], jnp.int32))

        if mode == "serialized":
            tree_assert(np.testing.assert_array_equal, ref_ls, dp_ls)
        else:
            tree_assert(
                functools.partial(np.testing.assert_allclose,
                                  rtol=0, atol=1e-9), ref_ls, dp_ls)
        assert int(ref_m["updates"]) == int(dp_m["updates"]) == 3


class TestNShardControlledStream:
    def test_4shard_controlled_batch_matches_single_batch32(self):
        """Four shards, each updating from a hand-picked 8-transition slice
        of its local replay columns, must produce the same post-update
        learner as one device updating from the union batch of 32."""
        n_shards, E_local, B = 4, 2, 32
        E = n_shards * E_local
        cfg = small_cfg(minibatch=B)
        ls = init_learner(jax.random.PRNGKey(4), cfg)
        rs = synth_replay(jax.random.PRNGKey(5), E=E)
        S1 = rs.obs.shape[0]  # S+1 rows

        rng = np.random.RandomState(7)
        rows = rng.randint(0, 24, size=B)          # valid rows
        e_local = rng.randint(0, E_local, size=B)
        shard_of = np.repeat(np.arange(n_shards), B // n_shards)
        # local flat index within a (S1, E_local) shard buffer
        idx_local = (rows * E_local + e_local).astype(np.int32)
        # the same transitions' flat index in the (S1, E) global buffer
        e_global = shard_of * E_local + e_local
        idx_global = (rows * E + e_global).astype(np.int32)

        ref_ls, _ = jax.jit(
            lambda ls, rs, idx: update_once(ls, rs, cfg, idx=idx))(
                ls, rs, jnp.asarray(idx_global))

        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("data",))
        fn = shard_map(
            lambda ls, rs, idx: update_once(ls, rs, cfg, axis_name="data",
                                            idx=idx),
            mesh=mesh, in_specs=(P(), replay_specs(), P("data")),
            out_specs=(P(), P()), check_vma=False)
        dp_ls, _ = jax.jit(fn)(ls, rs, jnp.asarray(idx_local))

        close = functools.partial(np.testing.assert_allclose,
                                  rtol=2e-5, atol=1e-6)
        tree_assert(close, ref_ls.actor, dp_ls.actor)
        tree_assert(close, ref_ls.critic, dp_ls.critic)
        tree_assert(close, ref_ls.actor_target, dp_ls.actor_target)
        tree_assert(close, ref_ls.critic_target, dp_ls.critic_target)

    def test_4shard_wrong_scaling_would_fail(self):
        """Sanity: the controlled-stream test has teeth — a x4 lr error
        (the classic silent DP bug) moves params far beyond tolerance."""
        n_shards, E_local, B = 4, 2, 32
        E = n_shards * E_local
        cfg = small_cfg(minibatch=B)
        cfg4 = small_cfg(minibatch=B, actor_lr=cfg.actor_lr * 4,
                         critic_lr=cfg.critic_lr * 4)
        ls = init_learner(jax.random.PRNGKey(4), cfg)
        rs = synth_replay(jax.random.PRNGKey(5), E=E)
        idx = jnp.arange(B, dtype=jnp.int32)
        a, _ = jax.jit(lambda: update_once(ls, rs, cfg, idx=idx))()
        b, _ = jax.jit(lambda: update_once(ls, rs, cfg4, idx=idx))()
        with np.testing.assert_raises(AssertionError):
            tree_assert(functools.partial(np.testing.assert_allclose,
                                          rtol=2e-5, atol=1e-6),
                        a.critic, b.critic)


class TestReplaySnapshotPortability:
    """canonical_replay/shard_replay: the snapshot column permutation that
    makes DP replay snapshots resumable across topologies (agent-major
    global order <-> shard-major device layout)."""

    def make_dp(self, n_devices, n_agents):
        import dataclasses
        from dqn_hfo_tpu.constants import DEFAULT_PARAMS
        from dqn_hfo_tpu.env.hfo_env import HFOEnv
        from dqn_hfo_tpu.env.state import EnvConfig
        from dqn_hfo_tpu.learner.multi import MultiConfig
        from dqn_hfo_tpu.parallel.mesh import DataParallel, make_mesh
        sp = dataclasses.replace(DEFAULT_PARAMS, frames_per_trial=8,
                                 untouched_time=6)
        cfg = (EnvConfig(offense_agents=n_agents) if n_agents > 1
               else EnvConfig())
        env = HFOEnv(cfg, sp, noise_scale=1.0)
        dcfg = small_cfg(state_size=env.cfg.state_size,
                         minibatch=n_devices * 2, memory_threshold=1)
        mcfg = MultiConfig(n_agents=n_agents) if n_agents > 1 else None
        return DataParallel(
            mesh=make_mesh(n_devices), env=env, n_envs=n_devices * 2,
            chunk_len=8, dcfg=dcfg, memory=n_devices * 2 * n_agents * 16,
            max_updates=2, gamma=0.99, mcfg=mcfg)

    def test_round_trip_and_agent_major_order(self):
        dp = self.make_dp(n_devices=4, n_agents=2)
        _, rs = dp.init_state(jax.random.PRNGKey(0))
        # stamp every entry with a recognizable (row, global_col) value
        S1, Cols = rs.reward.shape
        stamp = (jnp.arange(S1)[:, None] * 1000
                 + jnp.arange(Cols)[None, :]).astype(jnp.float32)
        # write the stamp THROUGH the sharded layout so each device holds
        # its own shard-major columns
        rs = rs._replace(reward=jax.device_put(stamp, rs.reward.sharding))

        host = dp.canonical_replay(rs)
        # canonical col a*E + shard*E_s + e: agent-0 block first.
        # shard s's local cols were [a0e0, a0e1, a1e0, a1e1] (agent-major
        # within shard); canonical must interleave shards within each agent
        E_s, A, n = dp.env_per_shard, dp.n_agents, dp.n_shards
        E = n * E_s
        expect = np.empty((S1, Cols), np.float32)
        for a in range(A):
            for s in range(n):
                for e in range(E_s):
                    src_col = s * (A * E_s) + a * E_s + e
                    expect[:, a * E + s * E_s + e] = np.asarray(
                        stamp[:, src_col])
        np.testing.assert_array_equal(np.asarray(host.reward), expect)

        # round trip back onto the mesh reproduces the device layout
        back = dp.shard_replay(host)
        np.testing.assert_array_equal(np.asarray(back.reward),
                                      np.asarray(rs.reward))

    def test_single_agent_is_identity(self):
        dp = self.make_dp(n_devices=4, n_agents=1)
        _, rs = dp.init_state(jax.random.PRNGKey(1))
        host = dp.canonical_replay(rs)
        np.testing.assert_array_equal(np.asarray(host.obs),
                                      np.asarray(rs.obs))
        back = dp.shard_replay(host)
        np.testing.assert_array_equal(np.asarray(back.obs),
                                      np.asarray(rs.obs))


class TestZeroValidShardGuard:
    """A shard whose LOCAL replay has no labeled rows can still pass the
    psum'd memory-threshold gate (update_n/multi_update_n psum the count so
    shards agree).  Its sample() then searches an all-zero cumsum and
    gathers garbage rows; the guard must zero that shard's contribution and
    average over the data-holding shards only."""

    def _empty_shard_replay(self, key, n_shards, E_local, poison=np.nan):
        """Shards 1..n-1 valid; shard 0 has valid=False everywhere and its
        buffers poisoned so any leak through sampling is loudly non-finite."""
        E = n_shards * E_local
        rs = synth_replay(key, E=E)
        col = np.arange(E)
        empty = col < E_local  # shard 0's columns
        valid = np.array(rs.valid)
        valid[:, empty] = False
        poison_arr = lambda x: jnp.asarray(
            np.where(empty[None, :, None] if x.ndim == 3 else empty[None, :],
                     poison, np.asarray(x)), jnp.float32)
        return rs._replace(
            obs=poison_arr(rs.obs), action=poison_arr(rs.action),
            reward=poison_arr(rs.reward), target=poison_arr(rs.target),
            next_obs=poison_arr(rs.next_obs), valid=jnp.asarray(valid))

    def test_empty_shard_contributes_nothing(self):
        """2 shards, shard 0 empty+poisoned: the DP update must equal the
        single-device update on shard 1's batch alone (mean over ONE
        data-holding shard, not /2), and stay finite."""
        n_shards, E_local, B = 2, 4, 16
        E = n_shards * E_local
        cfg = small_cfg(minibatch=B, memory_threshold=1)
        ls = init_learner(jax.random.PRNGKey(6), cfg)
        rs = self._empty_shard_replay(jax.random.PRNGKey(7), n_shards,
                                      E_local)
        S1 = rs.obs.shape[0]

        rng = np.random.RandomState(11)
        rows = rng.randint(0, 24, size=B)
        e_local = rng.randint(0, E_local, size=B)
        # shard 1's local flat indices; shard 0 gets arbitrary (poisoned)
        # indices it must ignore
        idx_data = (rows * E_local + e_local).astype(np.int32)
        idx_garbage = np.zeros(B, np.int32)
        idx_stacked = np.concatenate([idx_garbage, idx_data])
        # the same transitions in the global buffer (shard 1's columns)
        idx_global = (rows * E + (E_local + e_local)).astype(np.int32)

        # single-device reference: only shard 1's transitions
        ref_ls, (ref_loss, ref_q, ref_fin) = jax.jit(
            lambda ls, rs, idx: update_once(ls, rs, cfg, idx=idx))(
                ls, rs, jnp.asarray(idx_global))

        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("data",))
        fn = shard_map(
            lambda ls, rs, idx: update_once(
                ls, rs, cfg, axis_name="data", idx=idx,
                has_data=rp.valid_count(rs) > 0),
            mesh=mesh, in_specs=(P(), replay_specs(), P("data")),
            out_specs=(P(), P()), check_vma=False)
        dp_ls, (dp_loss, dp_q, dp_fin) = jax.jit(fn)(
            ls, rs, jnp.asarray(idx_stacked))

        assert bool(dp_fin), "finite flag must exempt the empty shard"
        for leaf in jax.tree_util.tree_leaves(dp_ls):
            assert np.all(np.isfinite(np.asarray(leaf)))
        close = functools.partial(np.testing.assert_allclose,
                                  rtol=2e-5, atol=1e-6)
        tree_assert(close, ref_ls.actor, dp_ls.actor)
        tree_assert(close, ref_ls.critic, dp_ls.critic)
        np.testing.assert_allclose(np.asarray(dp_loss),
                                   np.asarray(ref_loss), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dp_q),
                                   np.asarray(ref_q), rtol=1e-5)

    def test_update_n_gate_passes_with_empty_shard(self):
        """End-to-end through update_n on a 2-shard mesh: the psum'd gate
        passes on the total count while shard 0 is empty; the burst must
        run all its updates and stay finite."""
        n_shards, E_local = 2, 4
        cfg = small_cfg(minibatch=8, memory_threshold=8)
        ls = init_learner(jax.random.PRNGKey(8), cfg)
        rs = self._empty_shard_replay(jax.random.PRNGKey(9), n_shards,
                                      E_local)
        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("data",))
        fn = shard_map(
            lambda ls, rs, n: update_n(ls, rs, cfg, n[0], 3,
                                       axis_name="data"),
            mesh=mesh, in_specs=(P(), replay_specs(), P()),
            out_specs=(P(), P()), check_vma=False)
        dp_ls, dp_m = jax.jit(fn)(ls, rs, jnp.asarray([3], jnp.int32))
        assert int(dp_m["updates"]) == 3
        assert bool(dp_m["finite"])
        for leaf in jax.tree_util.tree_leaves(dp_ls):
            assert np.all(np.isfinite(np.asarray(leaf)))
