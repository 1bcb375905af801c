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
from dqn_hfo_tpu import spaces
from dqn_hfo_tpu.models.nets import actor_apply

F32 = jnp.float32


def decode_action(actor_output, space: spaces.ActionSpace = spaces.LOW_LEVEL):
    """ActorOutput -> (env_action_id, arg1, arg2, arg3).

    Mirrors GetAction (dqn.cpp:196-208) for the low-level space: excluded
    actions (TACKLE) are forced to -99999 before the argmax.
    """
    return spaces.decode(space, actor_output)


def sample_action(actor_output, key,
                  space: spaces.ActionSpace = spaces.LOW_LEVEL):
    """Stochastic decode, SampleAction (dqn.cpp:180-194): discrete action
    drawn with prob max(0, activation+1), excluded actions at prob 0."""
    return spaces.sample_decode(space, actor_output, key)


def random_actor_output(key, shape=(),
                        space: spaces.ActionSpace = spaces.LOW_LEVEL):
    """Uniform exploration outputs in native ranges (dqn.cpp:664-682)."""
    return spaces.random_output(space, key, shape)


def select_actions(params, obs, key, epsilon, dtype=None,
                   space: spaces.ActionSpace = spaces.LOW_LEVEL):
    """Batched epsilon-greedy: (E, F) obs -> ActorOutput (E, n_out).

    Per-env Bernoulli(epsilon) exploration (the reference draws one uniform
    per batch-of-1 call, dqn.cpp:700; per-env is the vectorized equivalent).
    """
    k_b, k_r = jax.random.split(key)
    greedy = actor_apply(params, obs, dtype)
    rand = random_actor_output(k_r, obs.shape[:-1], space)
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
