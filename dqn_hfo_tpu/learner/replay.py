"""On-device uniform replay memory for batched rollout ingestion.

Replaces the reference's host-side `std::deque<Transition>` ring with
preallocated device arrays (reference: dqn.hpp:187, AddTransitions eviction
dqn.cpp:775-781, uniform with-replacement sampling dqn.cpp:501-509).

Layout is (S+1, E, ...): a ring over S time-steps x E envs, plus one trash
row (index S) absorbing masked scatters.  The env axis is the data-parallel
axis — under a `Mesh(('data',))` sharding of E, every write and label pass
is shard-local (each device owns its envs' columns); only the tiny sampled
minibatch gather crosses shards.  One lockstep env tick writes one (E, ...)
row via dynamic_update_slice — no scatter in the hot path.

A transition's on-policy MC target is unknown until its episode completes
(the reference labels whole episodes post-hoc, dqn_main.cpp:145-149), so
rows are written `valid=False` and flipped valid by a label pass that runs
once per rollout chunk over a two-chunk window (ops/returns.py).  Sampling
is uniform over valid entries via categorical on a 0/-inf mask — the exact
analogue of uniform over the deque.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

F32 = jnp.float32


class ReplayState(NamedTuple):
    obs: jnp.ndarray        # (S+1, E, F)
    action: jnp.ndarray     # (S+1, E, 10) ActorOutput
    reward: jnp.ndarray     # (S+1, E)
    target: jnp.ndarray     # (S+1, E) on-policy MC return
    next_obs: jnp.ndarray   # (S+1, E, F)
    terminal: jnp.ndarray   # (S+1, E) bool
    valid: jnp.ndarray      # (S+1, E) bool — labeled & sampleable
    cursor: jnp.ndarray     # () i32 — total steps (rows) ever written


def init_replay(capacity: int, n_envs: int, obs_size: int,
                action_size: int = 10) -> ReplayState:
    """capacity counts transitions; rounded up to a multiple of n_envs."""
    S = max((capacity + n_envs - 1) // n_envs, 2)
    E = n_envs
    return ReplayState(
        obs=jnp.zeros((S + 1, E, obs_size), F32),
        action=jnp.zeros((S + 1, E, action_size), F32),
        reward=jnp.zeros((S + 1, E), F32),
        target=jnp.zeros((S + 1, E), F32),
        next_obs=jnp.zeros((S + 1, E, obs_size), F32),
        terminal=jnp.zeros((S + 1, E), bool),
        valid=jnp.zeros((S + 1, E), bool),
        cursor=jnp.asarray(0, jnp.int32),
    )


def steps_capacity(rs: ReplayState) -> int:
    return rs.obs.shape[0] - 1


def n_envs_of(rs: ReplayState) -> int:
    return rs.obs.shape[1]


def capacity_of(rs: ReplayState) -> int:
    return steps_capacity(rs) * n_envs_of(rs)


def write_step(rs: ReplayState, obs, action, reward, next_obs, terminal):
    """Append one lockstep tick of E transitions.

    Returns (new ReplayState, abs_step_id () i32) — the monotonic step id
    feeds the label pass, which detects overwritten rows by comparing ids
    against the write frontier.
    """
    S = steps_capacity(rs)
    slot = jnp.mod(rs.cursor, S)

    def upd(buf, row):
        return jax.lax.dynamic_update_slice_in_dim(
            buf, row[None].astype(buf.dtype), slot, axis=0)

    E = obs.shape[0]
    return ReplayState(
        obs=upd(rs.obs, obs),
        action=upd(rs.action, action),
        reward=upd(rs.reward, reward),
        target=upd(rs.target, jnp.zeros((E,), F32)),
        next_obs=upd(rs.next_obs, next_obs),
        terminal=upd(rs.terminal, terminal),
        valid=upd(rs.valid, jnp.zeros((E,), bool)),
        cursor=rs.cursor + 1,
    ), rs.cursor


def label_rows(rs: ReplayState, abs_ids, targets, mask):
    """Write MC targets and mark rows valid.

    Args:
      abs_ids: (W,) i32 absolute step id of each window row (-1 = padding
               predating the buffer).
      targets: (W, E) f32 MC returns.
      mask: (W, E) bool — entries whose episode completed this chunk.

    Rows the ring has already overwritten inside the window are skipped
    (write frontier advanced more than S steps past them), so newer data is
    not corrupted.  Stale rows scatter into the trash slot S; fresh slots
    are unique, keeping the scatter deterministic.
    """
    S = steps_capacity(rs)
    fresh = (abs_ids >= 0) & (rs.cursor - abs_ids <= S)
    slots = jnp.where(fresh, jnp.mod(abs_ids, S), S)
    m = mask & fresh[:, None]
    new_t = jnp.where(m, targets, rs.target[slots])
    new_v = jnp.where(m, True, rs.valid[slots])
    target = rs.target.at[slots].set(new_t)
    valid = rs.valid.at[slots].set(new_v)
    valid = valid.at[S].set(False)  # trash row never sampleable
    return rs._replace(target=target, valid=valid)


def sample(rs: ReplayState, key, n: int):
    """Uniform with-replacement over valid entries (dqn.cpp:501-509).

    Inverse-CDF over the validity mask: one prefix-sum over the buffer plus
    a searchsorted per draw — O(N + n log N) versus O(n*N) for a categorical
    over masked logits.  Returns flat indices into the (S+1)*E entry space.
    Caller must ensure >= 1 valid entry (the memory_threshold gate,
    dqn.cpp:800-802).
    """
    c = jnp.cumsum(rs.valid.reshape(-1).astype(jnp.int32))
    total = c[-1]
    u = jax.random.randint(key, (n,), 0, jnp.maximum(total, 1))
    idx = jnp.searchsorted(c, u, side="right").astype(jnp.int32)
    # All-invalid mask => searchsorted returns len(c), one past the last
    # entry.  Clip explicitly so the degenerate case lands on the (never-
    # valid) trash row by construction rather than by relying on XLA's
    # out-of-bounds gather clamping downstream (advisor r4).  Callers gate
    # on memory_threshold / has_data, so clipped draws are never consumed.
    return jnp.minimum(idx, c.shape[0] - 1)


def gather(rs: ReplayState, idx):
    """Fetch a transition batch by flat entry index."""
    F = rs.obs.shape[-1]
    A = rs.action.shape[-1]
    return (
        rs.obs.reshape(-1, F)[idx],
        rs.action.reshape(-1, A)[idx],
        rs.reward.reshape(-1)[idx],
        rs.target.reshape(-1)[idx],
        rs.next_obs.reshape(-1, F)[idx],
        rs.terminal.reshape(-1)[idx],
    )


def valid_count(rs: ReplayState):
    return jnp.sum(rs.valid.astype(jnp.int32))
