"""Parameterized action spaces.

The reference hard-codes one space: 4 discrete actions x 6 continuous params
(dqn.hpp:18-21) with per-slot bounds for gradient inversion (dqn.cpp:927-957)
and native-range exploration (dqn.cpp:664-682).  BASELINE.json config 4 also
calls for a mid-level macro set (KickTo/MoveTo/Dribble).  This module makes
the space a first-class spec so nets, decode, exploration, and gradient
inversion all derive from it.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from dqn_hfo_tpu import constants as C

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class ActionSpace:
    name: str
    # discrete-action activations come first in the ActorOutput, then params
    n_actions: int
    param_bounds: Tuple[Tuple[float, float], ...]     # inversion bounds
    explore_ranges: Tuple[Tuple[float, float], ...]   # uniform exploration
    env_action_ids: Tuple[int, ...]   # discrete index -> env action id
    arg_offsets: Tuple[Tuple[int, int, int], ...]     # per action: slots for
                                                      # (arg1, arg2, arg3); -1 = unused
    excluded: Tuple[int, ...] = ()    # indices removed from the argmax

    @property
    def n_params(self) -> int:
        return len(self.param_bounds)

    @property
    def output_size(self) -> int:
        return self.n_actions + self.n_params

    def bounds_arrays(self):
        mins = jnp.asarray(
            [C.ACTION_BOUND_MIN] * self.n_actions
            + [b[0] for b in self.param_bounds], F32)
        maxs = jnp.asarray(
            [C.ACTION_BOUND_MAX] * self.n_actions
            + [b[1] for b in self.param_bounds], F32)
        return mins, maxs


# --- The reference's low-level space (exact parity) -----------------------
LOW_LEVEL = ActionSpace(
    name="low_level",
    n_actions=4,
    param_bounds=C.PARAM_BOUNDS,
    explore_ranges=C.EXPLORE_PARAM_RANGES,
    env_action_ids=(C.DASH, C.TURN, C.TACKLE, C.KICK),
    arg_offsets=((0, 1, -1), (2, -1, -1), (3, -1, -1), (4, 5, -1)),
    excluded=(C.TACKLE,),  # GetAction forcibly excludes TACKLE (dqn.cpp:198)
)

# --- Mid-level macro space (BASELINE.json config 4) -----------------------
# KICK_TO(x, y, speed), MOVE_TO(x, y), DRIBBLE_TO(x, y); x/y are normalized
# field coordinates in [-1, 1], speed in [0, 3] (ball_speed_max).
MID_LEVEL = ActionSpace(
    name="mid_level",
    n_actions=3,
    param_bounds=(
        (-1.0, 1.0), (-1.0, 1.0), (0.0, 3.0),   # KICK_TO x, y, speed
        (-1.0, 1.0), (-1.0, 1.0),               # MOVE_TO x, y
        (-1.0, 1.0), (-1.0, 1.0),               # DRIBBLE_TO x, y
    ),
    explore_ranges=(
        (-1.0, 1.0), (-1.0, 1.0), (0.0, 3.0),
        (-1.0, 1.0), (-1.0, 1.0),
        (-1.0, 1.0), (-1.0, 1.0),
    ),
    env_action_ids=(C.KICK_TO, C.MOVE_TO, C.DRIBBLE_TO),
    arg_offsets=((0, 1, 2), (3, 4, -1), (5, 6, -1)),
)

SPACES = {s.name: s for s in (LOW_LEVEL, MID_LEVEL)}


def decode(space: ActionSpace, actor_output):
    """ActorOutput (..., n_out) -> (env_action_id, arg1, arg2, arg3).

    Argmax over discrete activations with `excluded` indices forced to
    -99999 (GetAction, dqn.cpp:196-208), then the winner's param slots.
    """
    acts = actor_output[..., : space.n_actions]
    for e in space.excluded:
        acts = acts.at[..., e].set(-99999.0)
    idx = jnp.argmax(acts, axis=-1).astype(jnp.int32)
    params = actor_output[..., space.n_actions:]
    env_ids = jnp.asarray(space.env_action_ids, jnp.int32)
    offs = jnp.asarray(space.arg_offsets, jnp.int32)       # (n_actions, 3)

    def pick(col):
        o = offs[idx, col]
        v = jnp.take_along_axis(
            params, jnp.maximum(o, 0)[..., None], axis=-1)[..., 0]
        return jnp.where(o < 0, 0.0, v).astype(F32)

    return env_ids[idx], pick(0), pick(1), pick(2)


def sample_decode(space: ActionSpace, actor_output, key):
    """Stochastic decode — SampleAction (dqn.cpp:180-194).

    Discrete action sampled with probability max(0, activation + 1), with
    `excluded` indices forced to probability 0 (the reference zeroes TACKLE at
    dqn.cpp:185-186); params picked from the winner's slots exactly as in
    `decode`.  Rows where every allowed probability is 0 fall back to uniform
    over the allowed actions (std::discrete_distribution's all-zero-weight
    case is undefined; uniform is the neutral completion).
    """
    acts = actor_output[..., : space.n_actions]
    probs = jnp.maximum(acts + 1.0, 0.0)
    allowed = jnp.ones((space.n_actions,), F32)
    for e in space.excluded:
        allowed = allowed.at[e].set(0.0)
    probs = probs * allowed
    total = jnp.sum(probs, axis=-1, keepdims=True)
    uniform = allowed / jnp.sum(allowed)
    probs = jnp.where(total > 0.0, probs / jnp.maximum(total, 1e-30), uniform)
    idx = jax.random.categorical(key, jnp.log(probs + 1e-30), axis=-1)
    idx = idx.astype(jnp.int32)

    params = actor_output[..., space.n_actions:]
    env_ids = jnp.asarray(space.env_action_ids, jnp.int32)
    offs = jnp.asarray(space.arg_offsets, jnp.int32)

    def pick(col):
        o = offs[idx, col]
        v = jnp.take_along_axis(
            params, jnp.maximum(o, 0)[..., None], axis=-1)[..., 0]
        return jnp.where(o < 0, 0.0, v).astype(F32)

    return env_ids[idx], pick(0), pick(1), pick(2)


def random_output(space: ActionSpace, key, shape=()):
    """Uniform exploration in native ranges (dqn.cpp:664-682)."""
    k1, k2 = jax.random.split(key)
    acts = jax.random.uniform(k1, shape + (space.n_actions,), F32, -1.0, 1.0)
    lo = jnp.asarray([r[0] for r in space.explore_ranges], F32)
    hi = jnp.asarray([r[1] for r in space.explore_ranges], F32)
    u = jax.random.uniform(k2, shape + (space.n_params,), F32)
    return jnp.concatenate([acts, lo + u * (hi - lo)], axis=-1)
