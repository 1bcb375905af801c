"""Actor & critic networks as pure functions over parameter pytrees.

Architecture parity with the reference's programmatic Caffe nets
(/root/reference/src/dqn.cpp:418-454):

  Actor : state -> [1024,512,256,128] leaky-ReLU(0.01) tower
          -> two heads: 4 discrete-action activations + 6 params
          (dqn.cpp:418-429; ReLU slope dqn.cpp:292-301)
  Critic: concat(state, actions4, params6) -> same tower -> scalar Q
          (dqn.cpp:431-454)

Weights ~ Gaussian(0.01), biases zero (Caffe fillers, dqn.cpp:350-352).
Plain dict pytrees (no framework modules) keep cross-agent layer sharing
(reference P3, dqn.cpp:1037-1079) a literal array-aliasing operation, and
make target-net soft updates a tree_map.

Compute runs in float32 by default for parity; `dtype=jnp.bfloat16` is a
throughput option for the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from dqn_hfo_tpu import constants as C

TOWER = (1024, 512, 256, 128)
LEAKY_SLOPE = 0.01
INIT_STD = 0.01

Params = Dict[str, Any]


def _init_linear(key, fan_in: int, fan_out: int) -> Params:
    w = jax.random.normal(key, (fan_in, fan_out), jnp.float32) * INIT_STD
    b = jnp.zeros((fan_out,), jnp.float32)
    return {"w": w, "b": b}


def _linear(p: Params, x, dtype=None):
    w, b = p["w"], p["b"]
    if dtype is not None:
        w, b, x = w.astype(dtype), b.astype(dtype), x.astype(dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32) + b.astype(jnp.float32)


def _leaky_relu(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def _tower(params: Sequence[Params], x, dtype=None):
    for p in params:
        x = _leaky_relu(_linear(p, x, dtype))
    return x


def actor_init(key, state_size: int, tower: Sequence[int] = TOWER,
               n_actions: int = C.K_ACTION_SIZE,
               n_params: int = C.K_ACTION_PARAM_SIZE) -> Params:
    keys = jax.random.split(key, len(tower) + 2)
    layers = []
    fan_in = state_size
    for i, width in enumerate(tower):
        layers.append(_init_linear(keys[i], fan_in, width))
        fan_in = width
    return {
        "tower": layers,
        "action_head": _init_linear(keys[-2], fan_in, n_actions),
        "param_head": _init_linear(keys[-1], fan_in, n_params),
    }


def actor_apply(params: Params, states, dtype=None):
    """states: (B, F) -> ActorOutput (B, 10) = [4 activations | 6 params]."""
    h = _tower(params["tower"], states, dtype)
    actions = _linear(params["action_head"], h, dtype)
    action_params = _linear(params["param_head"], h, dtype)
    return jnp.concatenate([actions, action_params], axis=-1)


def critic_init(key, state_size: int, tower: Sequence[int] = TOWER,
                action_dim: int = C.K_ACTION_SIZE + C.K_ACTION_PARAM_SIZE
                ) -> Params:
    keys = jax.random.split(key, len(tower) + 1)
    layers = []
    fan_in = state_size + action_dim
    for i, width in enumerate(tower):
        layers.append(_init_linear(keys[i], fan_in, width))
        fan_in = width
    return {"tower": layers, "q_head": _init_linear(keys[-1], fan_in, 1)}


def critic_apply(params: Params, states, actor_out, dtype=None):
    """(B, F), (B, 10) -> Q (B,)."""
    x = jnp.concatenate([states, actor_out], axis=-1)
    h = _tower(params["tower"], x, dtype)
    return _linear(params["q_head"], h, dtype)[:, 0]


def soft_update(target: Params, live: Params, tau: float) -> Params:
    """target <- tau*live + (1-tau)*target (reference SoftUpdateNet,
    dqn.cpp:1085-1096)."""
    return jax.tree_util.tree_map(
        lambda t, l: tau * l + (1.0 - tau) * t, target, live
    )


def share_layers(owner: Params, slave: Params, n_layers: int) -> Params:
    """Tie the first n param-bearing layers of `slave` to `owner`'s arrays
    (reference ShareLayer/ShareParameters, dqn.cpp:1037-1079).  In the
    functional setting this returns a new slave pytree whose leading tower
    layers (and heads, if n exceeds the tower) ARE the owner's arrays; the
    trainer must then treat them as a single parameter."""
    out = dict(slave)
    tower = list(slave["tower"])
    shared = 0
    for i in range(len(tower)):
        if shared >= n_layers:
            break
        tower[i] = owner["tower"][i]
        shared += 1
    out["tower"] = tower
    heads = [k for k in ("action_head", "param_head", "q_head") if k in slave]
    for k in heads:
        if shared >= n_layers:
            break
        out[k] = owner[k]
        shared += 1
    return out
