"""Multi-host replay snapshot: per-process shard files + canonical
reassembly (runtime/checkpoint.py snapshot_replay_shards /
load_sharded_replay, parallel/mesh.py local_replay_shards).

The reference always checkpoints the replay (dqn.cpp:1146-1226); the
multi-host form writes each process's addressable columns as one shard
file with canonical column ids, so the set reassembles to the exact
canonical snapshot without any cross-host gather.  Run here on the
8-virtual-device mesh with the per-process split emulated by slicing the
payload; the real 2-process path is exercised by
tests/test_distributed_2proc.py.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.hfo_env import HFOEnv
from dqn_hfo_tpu.env.state import EnvConfig
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.ddpg import DDPGConfig
from dqn_hfo_tpu.learner.multi import MultiConfig
from dqn_hfo_tpu.parallel.mesh import DataParallel, make_mesh
from dqn_hfo_tpu.runtime import checkpoint as ckpt


def make_dp(n_devices=8, n_agents=2, n_envs=None):
    sp = dataclasses.replace(DEFAULT_PARAMS, frames_per_trial=8,
                             untouched_time=6)
    cfg = (EnvConfig(offense_agents=n_agents) if n_agents > 1
           else EnvConfig())
    env = HFOEnv(cfg, sp, noise_scale=1.0)
    n_envs = n_envs or n_devices * 2
    dcfg = DDPGConfig(state_size=env.cfg.state_size, minibatch=n_devices * 2,
                      memory_threshold=1, actor_tower=(16,),
                      critic_tower=(16,))
    mcfg = MultiConfig(n_agents=n_agents) if n_agents > 1 else None
    return DataParallel(
        mesh=make_mesh(n_devices), env=env, n_envs=n_envs,
        chunk_len=8, dcfg=dcfg, memory=n_envs * n_agents * 16,
        max_updates=2, gamma=0.99, mcfg=mcfg)


def stamped_replay(dp):
    """Sharded replay whose every entry encodes (row, global_col)."""
    _, rs = dp.init_state(jax.random.PRNGKey(0))
    S1, Cols = rs.reward.shape
    stamp = (jnp.arange(S1)[:, None] * 10000
             + jnp.arange(Cols)[None, :]).astype(jnp.float32)
    valid = (jnp.arange(S1)[:, None] % 3 == 0) & jnp.ones((1, Cols), bool)
    return rs._replace(
        reward=jax.device_put(stamp, rs.reward.sharding),
        obs=jax.device_put(
            jnp.broadcast_to(stamp[..., None], rs.obs.shape),
            rs.obs.sharding),
        valid=jax.device_put(valid, rs.valid.sharding),
        cursor=jnp.asarray(77, jnp.int32))


def split_payload(payload, n_parts):
    """Emulate per-process payloads by slicing the single-process payload's
    column axis into contiguous parts."""
    C = payload["col_ids"].shape[0]
    step = C // n_parts
    outs = []
    for p in range(n_parts):
        sl = slice(p * step, (p + 1) * step if p < n_parts - 1 else C)
        part = {}
        for k, v in payload.items():
            if k in ("cursor", "n_cols_global"):
                part[k] = v
            elif k == "col_ids":
                part[k] = v[sl]
            else:
                part[k] = v[:, sl]
        outs.append(part)
    return outs


class TestShardSnapshotSet:
    def test_roundtrip_matches_canonical(self, tmp_path):
        dp = make_dp()
        rs = stamped_replay(dp)
        want = dp.canonical_replay(rs)

        payload = dp.local_replay_shards(rs)
        # single process holds every column; ids must be a permutation
        np.testing.assert_array_equal(
            np.sort(payload["col_ids"]),
            np.arange(rs.reward.shape[1]))

        prefix = os.path.join(str(tmp_path), "run")
        for p, part in enumerate(split_payload(payload, 2)):
            ckpt.snapshot_replay_shards(prefix, 77, part, p, 2)

        base = f"{prefix}_iter_77.replaymemory"
        got = ckpt.load_sharded_replay(base)
        for k in rp.ReplayState._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(got, k)), np.asarray(getattr(want, k)),
                err_msg=k)

        # find_latest_snapshot surfaces the set as its stem
        _, _, mem_p = ckpt.find_latest_snapshot(prefix)
        assert mem_p == base

        # resume: re-shard onto the mesh reproduces the device layout
        back = dp.shard_replay(got)
        for k in ("obs", "reward", "valid", "cursor"):
            np.testing.assert_array_equal(
                np.asarray(getattr(back, k)), np.asarray(getattr(rs, k)),
                err_msg=k)

    def test_incomplete_set_refuses(self, tmp_path):
        dp = make_dp(n_agents=1)
        rs = stamped_replay(dp)
        payload = dp.local_replay_shards(rs)
        prefix = os.path.join(str(tmp_path), "run")
        parts = split_payload(payload, 3)
        for p, part in enumerate(parts[:2]):  # one missing
            ckpt.snapshot_replay_shards(prefix, 5, part, p, 3)
        try:
            ckpt.load_sharded_replay(f"{prefix}_iter_5.replaymemory")
        except FileNotFoundError as e:
            assert "incomplete" in str(e)
        else:
            raise AssertionError("incomplete shard set must not load")

    def test_overlapping_shards_refuse(self, tmp_path):
        # Two shard files claiming the same canonical columns (e.g. stale
        # files from a run restarted with a different process->column map)
        # must refuse rather than silently double-write.
        dp = make_dp(n_agents=1)
        rs = stamped_replay(dp)
        payload = dp.local_replay_shards(rs)
        prefix = os.path.join(str(tmp_path), "run")
        parts = split_payload(payload, 2)
        ckpt.snapshot_replay_shards(prefix, 5, parts[0], 0, 2)
        ckpt.snapshot_replay_shards(prefix, 5, parts[0], 1, 2)  # same cols
        with pytest.raises(ValueError, match="re-claims"):
            ckpt.load_sharded_replay(f"{prefix}_iter_5.replaymemory")

    def test_coverage_gap_refuses(self, tmp_path):
        # A complete-by-count set that leaves canonical columns uncovered
        # (shards from mismatched topologies) must refuse with the gap.
        dp = make_dp(n_agents=1)
        rs = stamped_replay(dp)
        payload = dp.local_replay_shards(rs)
        prefix = os.path.join(str(tmp_path), "run")
        parts = split_payload(payload, 3)
        ckpt.snapshot_replay_shards(prefix, 5, parts[0], 0, 2)
        ckpt.snapshot_replay_shards(prefix, 5, parts[1], 1, 2)  # part 2 lost
        with pytest.raises(ValueError, match="uncovered"):
            ckpt.load_sharded_replay(f"{prefix}_iter_5.replaymemory")

    def test_mixed_topology_set_refuses(self, tmp_path):
        dp = make_dp(n_agents=1)
        rs = stamped_replay(dp)
        payload = dp.local_replay_shards(rs)
        prefix = os.path.join(str(tmp_path), "run")
        parts = split_payload(payload, 2)
        ckpt.snapshot_replay_shards(prefix, 5, parts[0], 0, 2)
        ckpt.snapshot_replay_shards(prefix, 5, parts[1], 1, 3)  # -of-3 file
        with pytest.raises(ValueError, match="mixes topologies"):
            ckpt.load_sharded_replay(f"{prefix}_iter_5.replaymemory")

    def test_partial_newest_set_falls_back(self, tmp_path):
        # Crash mid-snapshot: iter-20 has only 1 of 2 shards and no
        # completion marker; find_latest_snapshot must select the marked
        # iter-10 set instead of aborting resume (advisor r4).
        dp = make_dp(n_agents=1)
        rs = stamped_replay(dp)
        payload = dp.local_replay_shards(rs)
        prefix = os.path.join(str(tmp_path), "run")
        parts = split_payload(payload, 2)
        for p, part in enumerate(parts):
            ckpt.snapshot_replay_shards(prefix, 10, part, p, 2)
        ckpt.mark_snapshot_complete(prefix, 10)
        ckpt.snapshot_replay_shards(prefix, 20, parts[0], 0, 2)  # torn set
        _, _, mem_p = ckpt.find_latest_snapshot(prefix)
        assert mem_p == f"{prefix}_iter_10.replaymemory"
        got = ckpt.load_sharded_replay(mem_p)
        np.testing.assert_array_equal(
            np.asarray(got.reward),
            np.asarray(dp.canonical_replay(rs).reward))

    def test_gc_removes_markers(self, tmp_path):
        dp = make_dp(n_agents=1)
        rs = stamped_replay(dp)
        payload = dp.local_replay_shards(rs)
        prefix = os.path.join(str(tmp_path), "run")
        for it in (10, 20):
            for p, part in enumerate(split_payload(payload, 2)):
                ckpt.snapshot_replay_shards(prefix, it, part, p, 2)
            ckpt.mark_snapshot_complete(prefix, it)
        ckpt.remove_snapshots(prefix, 20)
        files = os.listdir(str(tmp_path))
        assert not any("iter_10" in f for f in files)
        assert f"run_iter_20.replaymemory.complete" in files

    def test_topology_change_via_canonical(self, tmp_path):
        """A shard set written on an 8-device topology restores onto a
        4-device mesh (the canonicalizer makes snapshots portable)."""
        dp8 = make_dp(n_devices=8, n_agents=2)
        rs = stamped_replay(dp8)
        payload = dp8.local_replay_shards(rs)
        prefix = os.path.join(str(tmp_path), "run")
        for p, part in enumerate(split_payload(payload, 2)):
            ckpt.snapshot_replay_shards(prefix, 9, part, p, 2)
        got = ckpt.load_sharded_replay(f"{prefix}_iter_9.replaymemory")

        # same global env count so the column count matches
        dp4 = make_dp(n_devices=4, n_agents=2, n_envs=dp8.n_envs)
        rs4 = dp4.shard_replay(got)
        np.testing.assert_array_equal(
            np.asarray(dp4.canonical_replay(rs4).reward),
            np.asarray(dp8.canonical_replay(rs).reward))
