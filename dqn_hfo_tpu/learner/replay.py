"""On-device uniform replay memory for batched rollout ingestion.

Replaces the reference's host-side `std::deque<Transition>` ring with
preallocated device arrays (reference: dqn.hpp:187, AddTransitions eviction
dqn.cpp:775-781, uniform with-replacement sampling dqn.cpp:501-509).

Design (SURVEY.md §7 "replay at scale on device"):

- One global ring of `capacity` rows; every env step writes its E transitions
  contiguously at the cursor (capacity is rounded to a multiple of E so the
  write is a single dynamic_update_slice — no scatter).
- A transition's on-policy MC target is unknown until its episode completes
  (the reference labels whole episodes post-hoc, dqn_main.cpp:145-149), so
  rows are written with `valid=False` and flipped valid by a label pass that
  runs once per rollout chunk over a two-chunk window (ops/returns.py).
- Sampling is uniform over valid rows via categorical on a 0/-inf mask —
  the exact analogue of uniform over the deque.

All state is a pytree; every op is jit/donate friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

F32 = jnp.float32


class ReplayState(NamedTuple):
    obs: jnp.ndarray        # (Cap+1, F)  — last row is the trash slot
    action: jnp.ndarray     # (Cap+1, 10) ActorOutput
    reward: jnp.ndarray     # (Cap+1,)
    target: jnp.ndarray     # (Cap+1,) on-policy MC return
    next_obs: jnp.ndarray   # (Cap+1, F)
    terminal: jnp.ndarray   # (Cap+1,) bool
    valid: jnp.ndarray      # (Cap+1,) bool — labeled & sampleable
    cursor: jnp.ndarray     # () i32 — total rows ever written


def round_capacity(capacity: int, n_envs: int) -> int:
    """Round capacity up to a multiple of n_envs (keeps writes sliced)."""
    return ((capacity + n_envs - 1) // n_envs) * n_envs


def init_replay(capacity: int, n_envs: int, obs_size: int,
                action_size: int = 10) -> ReplayState:
    cap = round_capacity(capacity, n_envs)
    return ReplayState(
        obs=jnp.zeros((cap + 1, obs_size), F32),
        action=jnp.zeros((cap + 1, action_size), F32),
        reward=jnp.zeros((cap + 1,), F32),
        target=jnp.zeros((cap + 1,), F32),
        next_obs=jnp.zeros((cap + 1, obs_size), F32),
        terminal=jnp.zeros((cap + 1,), bool),
        valid=jnp.zeros((cap + 1,), bool),
        cursor=jnp.asarray(0, jnp.int32),
    )


def capacity_of(rs: ReplayState) -> int:
    return rs.obs.shape[0] - 1


def write_step(rs: ReplayState, obs, action, reward, next_obs, terminal):
    """Append E transitions (one lockstep env tick) at the cursor.

    Returns (new ReplayState, slots (E,) i32) — slots feed the label pass.
    """
    E = obs.shape[0]
    cap = capacity_of(rs)
    start = jnp.mod(rs.cursor, cap)
    # absolute row ids (monotonic) — lets the label pass detect rows that the
    # ring has already overwritten
    slots = rs.cursor + jnp.arange(E, dtype=jnp.int32)

    def upd(buf, rows):
        return jax.lax.dynamic_update_slice_in_dim(buf, rows, start, axis=0)

    return ReplayState(
        obs=upd(rs.obs, obs.astype(F32)),
        action=upd(rs.action, action.astype(F32)),
        reward=upd(rs.reward, reward.astype(F32)),
        target=upd(rs.target, jnp.zeros((E,), F32)),
        next_obs=upd(rs.next_obs, next_obs.astype(F32)),
        terminal=upd(rs.terminal, terminal),
        valid=upd(rs.valid, jnp.zeros((E,), bool)),
        cursor=rs.cursor + E,
    ), slots


def label_rows(rs: ReplayState, abs_ids, targets, mask):
    """Write MC targets and mark rows valid.

    Args:
      abs_ids: (W, E) i32 absolute row id of each window entry (from
               write_step; -1 for padding entries predating the buffer).
      targets: (W, E) f32 MC returns.
      mask: (W, E) bool — entries whose episode completed this chunk.

    Rows the ring has already overwritten (write frontier advanced more than
    `capacity` past them inside the window) are skipped so newer data is not
    corrupted.
    """
    cap = capacity_of(rs)
    fresh = (abs_ids >= 0) & (rs.cursor - abs_ids <= cap)
    m = mask & fresh
    flat_slots = jnp.where(m, jnp.mod(abs_ids, cap), cap).reshape(-1)
    flat_targets = targets.reshape(-1)
    new_target = rs.target.at[flat_slots].set(flat_targets)
    new_valid = rs.valid.at[flat_slots].set(True)
    # trash slot stays invalid
    new_valid = new_valid.at[cap].set(False)
    return rs._replace(target=new_target, valid=new_valid)


def sample(rs: ReplayState, key, n: int):
    """Uniform with-replacement over valid rows (dqn.cpp:501-509).

    Returns (idx (n,) i32).  Caller must ensure >= 1 valid row (the
    memory_threshold gate, dqn.cpp:800-802).
    """
    logits = jnp.where(rs.valid, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits, shape=(n,))


def gather(rs: ReplayState, idx):
    """Fetch a transition batch by row index."""
    return (
        rs.obs[idx],
        rs.action[idx],
        rs.reward[idx],
        rs.target[idx],
        rs.next_obs[idx],
        rs.terminal[idx],
    )


def valid_count(rs: ReplayState):
    return jnp.sum(rs.valid.astype(jnp.int32))
