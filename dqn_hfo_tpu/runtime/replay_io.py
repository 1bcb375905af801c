"""Reference-format replay-memory interop (.replaymemory gzip files).

The reference snapshots its replay deque as a gzip binary stream
(SnapshotReplayMemory / LoadReplayMemory, /root/reference/src/dqn.cpp:
1146-1226).  The C++ codec (core/replay_codec.cpp, zlib) reads/writes that
exact byte layout; this module maps it onto the on-device (S+1, E) replay:

- import: next-states are reconstructed from stream adjacency within
  episodes (as the reference loader does, dqn.cpp:1218-1220), then the flat
  stream is laid into the (steps, envs) grid — adjacency is not required
  afterwards because this replay stores next_obs explicitly.
- export: each env column's valid run is emitted contiguously with trailing
  non-terminal entries dropped, so the reference loader's adjacency-based
  next-state reconstruction stays correct at column boundaries.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu.learner import replay as rp

_CORE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "core")
_SO = os.path.join(_CORE_DIR, "libreplay_codec.so")

_lib = None


def _load():
    global _lib
    if _lib is None:
        if not os.path.exists(_SO):
            subprocess.run(["make", "-s", "-C", _CORE_DIR], check=True)
        lib = ctypes.CDLL(_SO)
        fp = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.replay_load.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                                    ctypes.c_int32, ctypes.c_int32, fp, fp,
                                    fp, fp, u8p]
        lib.replay_load.restype = ctypes.c_int32
        lib.replay_save.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                                    ctypes.c_int32, ctypes.c_int32, fp, fp,
                                    fp, fp, u8p]
        lib.replay_save.restype = ctypes.c_int32
        _lib = lib
    return _lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def load_reference_replay(path: str, state_size: int, n_envs: int,
                          capacity: int = 0, action_dim: int = 10
                          ) -> rp.ReplayState:
    """Read a reference .replaymemory file into a ReplayState."""
    lib = _load()
    p = path.encode()
    n = lib.replay_load(p, state_size, action_dim, 0, None, None, None,
                        None, None)
    if n < 0:
        raise IOError(f"cannot read replay memory: {path}")
    states = np.zeros((n, state_size), np.float32)
    actions = np.zeros((n, action_dim), np.float32)
    rewards = np.zeros((n,), np.float32)
    targets = np.zeros((n,), np.float32)
    terminals = np.zeros((n,), np.uint8)
    got = lib.replay_load(p, state_size, action_dim, n, _fp(states),
                          _fp(actions), _fp(rewards), _fp(targets),
                          _u8p(terminals))
    if got != n:
        raise IOError(f"short read ({got}/{n}) from {path}")

    # reconstruct next states from adjacency (dqn.cpp:1218-1220)
    next_states = np.zeros_like(states)
    next_states[:-1] = states[1:]
    term = terminals.astype(bool)

    cap = max(capacity, n)
    rs = rp.init_replay(cap, n_envs, state_size, action_dim)
    S = rp.steps_capacity(rs)
    E = n_envs
    rows = min((n + E - 1) // E, S)
    pad = rows * E - n

    def grid(x):
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        return x.reshape(rows, E, *x.shape[1:])

    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return rp.ReplayState(
        obs=rs.obs.at[:rows].set(jnp.asarray(grid(states))),
        action=rs.action.at[:rows].set(jnp.asarray(grid(actions))),
        reward=rs.reward.at[:rows].set(jnp.asarray(grid(rewards))),
        target=rs.target.at[:rows].set(jnp.asarray(grid(targets))),
        next_obs=rs.next_obs.at[:rows].set(jnp.asarray(grid(next_states))),
        terminal=rs.terminal.at[:rows].set(jnp.asarray(grid(term))),
        valid=rs.valid.at[:rows].set(jnp.asarray(grid(valid))),
        cursor=jnp.asarray(rows, jnp.int32),
    )


def save_reference_replay(path: str, rs: rp.ReplayState) -> int:
    """Write valid transitions as a reference .replaymemory file.

    Emits per-env-column contiguous runs (episode order preserved within a
    column) and drops each column's trailing non-terminal tail so the
    reference loader's next-state linking stays correct."""
    lib = _load()
    S = rp.steps_capacity(rs)
    valid = np.asarray(rs.valid[:S])          # (S, E)
    obs = np.asarray(rs.obs[:S])
    action = np.asarray(rs.action[:S])
    reward = np.asarray(rs.reward[:S])
    target = np.asarray(rs.target[:S])
    term = np.asarray(rs.terminal[:S])
    cursor = int(rs.cursor)

    cols = []
    E = valid.shape[1]
    # time order within the ring: oldest row = cursor % S
    order = (np.arange(S) + cursor) % S if cursor > S else np.arange(S)
    for e in range(E):
        v = valid[order, e]
        idx = order[v]
        if idx.size == 0:
            continue
        t = term[idx, e]
        last_term = np.nonzero(t)[0]
        if last_term.size == 0:
            continue
        idx = idx[: last_term[-1] + 1]
        cols.append((
            obs[idx, e], action[idx, e], reward[idx, e], target[idx, e],
            term[idx, e],
        ))
    if not cols:
        n = 0
        arrs = (np.zeros((0, obs.shape[-1]), np.float32),
                np.zeros((0, action.shape[-1]), np.float32),
                np.zeros((0,), np.float32), np.zeros((0,), np.float32),
                np.zeros((0,), np.uint8))
    else:
        arrs = tuple(
            np.ascontiguousarray(np.concatenate([c[i] for c in cols]))
            for i in range(5))
        arrs = arrs[:4] + (arrs[4].astype(np.uint8),)
        n = arrs[0].shape[0]
    wrote = lib.replay_save(
        path.encode(), obs.shape[-1], action.shape[-1], n,
        _fp(arrs[0].astype(np.float32)), _fp(arrs[1].astype(np.float32)),
        _fp(arrs[2].astype(np.float32)), _fp(arrs[3].astype(np.float32)),
        _u8p(arrs[4]),
    )
    if wrote != n:
        raise IOError(f"short write ({wrote}/{n}) to {path}")
    return n
