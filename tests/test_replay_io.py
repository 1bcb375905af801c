"""Tests for the reference-format .replaymemory codec (byte-exact layout)."""

import gzip
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.runtime.replay_io import (load_reference_replay,
                                           save_reference_replay)


def make_replay_with_episodes(E=4, steps=20, F=6, seed=0):
    """Build a labeled replay of short complete episodes."""
    rng = np.random.RandomState(seed)
    rs = rp.init_replay(E * steps, E, F)
    for s in range(steps):
        obs = rng.randn(E, F).astype(np.float32)
        act = rng.randn(E, 10).astype(np.float32)
        rew = rng.randn(E).astype(np.float32)
        term = np.zeros(E, bool)
        term[:] = (s % 5) == 4  # episodes of length 5
        rs, sid = rp.write_step(rs, jnp.asarray(obs), jnp.asarray(act),
                                jnp.asarray(rew), jnp.asarray(obs + 1),
                                jnp.asarray(term))
        rs = rp.label_rows(rs, jnp.asarray([sid], jnp.int32),
                           jnp.asarray(rng.randn(1, E), jnp.float32),
                           jnp.ones((1, E), bool))
    return rs


class TestCodec:
    def test_roundtrip(self, tmp_path):
        rs = make_replay_with_episodes()
        path = str(tmp_path / "mem.replaymemory")
        n = save_reference_replay(path, rs)
        assert n == 4 * 20  # all episodes complete
        rs2 = load_reference_replay(path, 6, n_envs=4)
        assert int(rp.valid_count(rs2)) == n
        # data payload preserved (order may regroup by env column)
        a = np.sort(np.asarray(rs.reward[:20]).ravel())
        b = np.sort(np.asarray(rs2.reward)[np.asarray(rs2.valid)])
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_byte_layout_matches_reference(self, tmp_path):
        """Parse the file with plain gzip+struct per dqn.cpp:1146-1178."""
        rs = make_replay_with_episodes(E=2, steps=5, F=3)
        path = str(tmp_path / "mem.replaymemory")
        n = save_reference_replay(path, rs)
        raw = gzip.open(path, "rb").read()
        (count,) = struct.unpack_from("<i", raw, 0)
        assert count == n
        off = 4
        rec = 3 * 4 + 10 * 4 + 4 + 4 + 1  # state + ActorOutput + r + t + term
        assert len(raw) == 4 + n * rec
        # walk transitions; terminal every 5th within each column block
        terms = []
        for i in range(n):
            base = off + i * rec
            state = struct.unpack_from("<3f", raw, base)
            term = raw[base + rec - 1]
            terms.append(term)
            assert term in (0, 1)
        assert sum(terms) == n // 5

    def test_trailing_incomplete_episode_dropped(self, tmp_path):
        E, F = 2, 3
        rs = rp.init_replay(64, E, F)
        rng = np.random.RandomState(0)
        for s in range(7):  # episode ends at step 4; steps 5-6 unfinished
            term = np.full(E, s == 4)
            rs, sid = rp.write_step(
                rs, jnp.asarray(rng.randn(E, F), jnp.float32),
                jnp.zeros((E, 10)), jnp.zeros(E), jnp.zeros((E, F)),
                jnp.asarray(term))
            rs = rp.label_rows(rs, jnp.asarray([sid], jnp.int32),
                               jnp.zeros((1, E)), jnp.ones((1, E), bool))
        path = str(tmp_path / "m.replaymemory")
        n = save_reference_replay(path, rs)
        assert n == 5 * E  # the 2 unfinished steps per env are dropped

    def test_next_state_reconstruction(self, tmp_path):
        rs = make_replay_with_episodes(E=1, steps=10, F=4)
        path = str(tmp_path / "m.replaymemory")
        save_reference_replay(path, rs)
        rs2 = load_reference_replay(path, 4, n_envs=1)
        obs = np.asarray(rs2.obs)[np.asarray(rs2.valid)]
        nxt = np.asarray(rs2.next_obs)[np.asarray(rs2.valid)]
        term = np.asarray(rs2.terminal)[np.asarray(rs2.valid)]
        for i in range(len(obs) - 1):
            if not term[i]:
                np.testing.assert_allclose(nxt[i], obs[i + 1], atol=1e-6)
