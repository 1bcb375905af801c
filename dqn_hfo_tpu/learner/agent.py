"""Action selection: ActorOutput decode, exploration, epsilon schedule.

Reference semantics:
- GetAction: argmax over the 4 discrete activations with TACKLE forcibly
  excluded, then the winning action's param slots
  (/root/reference/src/dqn.cpp:196-208, offsets :162-178).
- GetRandomActorOutput: uniform activations in [-1,1], params in native
  ranges — including dash power in [-100,100] (dqn.cpp:664-682).
- SelectActions: with prob epsilon use random outputs, else the actor net
  (dqn.cpp:695-711); batched here as a per-env Bernoulli.
- CalculateEpsilon: linear 1.0 -> epsilon over `explore` iters
  (dqn_main.cpp:65-71).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.models.nets import actor_apply

F32 = jnp.float32

# arg1/arg2 param-slot index per discrete action (GetParamOffset,
# dqn.cpp:162-178); -1 = no second arg.
_ARG1_OFFSET = jnp.asarray([0, 2, 3, 4], jnp.int32)
_ARG2_OFFSET = jnp.asarray([1, -1, -1, 5], jnp.int32)


def decode_action(actor_output):
    """ActorOutput (..., 10) -> (action_id, arg1, arg2), tackle excluded.

    Mirrors GetAction (dqn.cpp:196-208): TACKLE's activation is forced to
    -99999 before the argmax.
    """
    acts = actor_output[..., : C.K_ACTION_SIZE]
    acts = acts.at[..., C.TACKLE].set(-99999.0)
    action = jnp.argmax(acts, axis=-1).astype(jnp.int32)
    params = actor_output[..., C.K_ACTION_SIZE:]
    a1_idx = _ARG1_OFFSET[action]
    a2_idx = _ARG2_OFFSET[action]
    arg1 = jnp.take_along_axis(params, a1_idx[..., None], axis=-1)[..., 0]
    arg2 = jnp.where(
        a2_idx < 0,
        0.0,
        jnp.take_along_axis(
            params, jnp.maximum(a2_idx, 0)[..., None], axis=-1
        )[..., 0],
    )
    return action, arg1.astype(F32), arg2.astype(F32)


def random_actor_output(key, shape=()):
    """Uniform exploration outputs in native ranges (dqn.cpp:664-682)."""
    k1, k2 = jax.random.split(key)
    acts = jax.random.uniform(k1, shape + (C.K_ACTION_SIZE,), F32, -1.0, 1.0)
    lo = jnp.asarray([r[0] for r in C.EXPLORE_PARAM_RANGES], F32)
    hi = jnp.asarray([r[1] for r in C.EXPLORE_PARAM_RANGES], F32)
    u = jax.random.uniform(k2, shape + (C.K_ACTION_PARAM_SIZE,), F32)
    params = lo + u * (hi - lo)
    return jnp.concatenate([acts, params], axis=-1)


def select_actions(params, obs, key, epsilon, dtype=None):
    """Batched epsilon-greedy: (E, F) obs -> ActorOutput (E, 10).

    Per-env Bernoulli(epsilon) exploration (the reference draws one uniform
    per batch-of-1 call, dqn.cpp:700; per-env is the vectorized equivalent).
    """
    k_b, k_r = jax.random.split(key)
    greedy = actor_apply(params, obs, dtype)
    rand = random_actor_output(k_r, obs.shape[:-1])
    explore = jax.random.uniform(k_b, obs.shape[:-1], F32) < epsilon
    return jnp.where(explore[..., None], rand, greedy)


def calculate_epsilon(iteration, explore_iters, final_epsilon):
    """Linear anneal 1.0 -> final over explore_iters (dqn_main.cpp:65-71)."""
    frac = jnp.minimum(iteration / jnp.maximum(explore_iters, 1), 1.0)
    return jnp.where(
        iteration < explore_iters,
        1.0 - (1.0 - final_epsilon) * frac,
        final_epsilon,
    ).astype(F32)
