"""Gradient inversion for bounded parameterized actions, as a custom VJP.

Replicates the reference's in-place diff rewrite between the critic backward
and the actor backward (/root/reference/src/dqn.cpp:927-957), from
Hausknecht & Stone ICLR'16 §3.3 ("inverting gradients"):

    if diff < 0: diff *= (max - x) / (max - min)     # pushing x up
    if diff > 0: diff *= (x - min) / (max - min)     # pushing x down

(`diff` is dL/dx for the descent direction; with L = -Q, diff<0 increases x.)
Outputs outside [min, max] flip the gradient sign, which is what squashes
runaway activations back into range.

Implemented as an identity whose backward rescales the cotangent, so
`jax.grad` through actor->inversion->critic reproduces the reference's
actor update exactly; bounds per slot from constants (discrete [-1,1],
powers [0,100], angles [-180,180]; dqn.cpp:932, 944-949).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dqn_hfo_tpu import constants as C

# Per-slot bounds for the full 10-dim ActorOutput.
_MINS = jnp.asarray(
    [C.ACTION_BOUND_MIN] * C.K_ACTION_SIZE + [b[0] for b in C.PARAM_BOUNDS],
    jnp.float32,
)
_MAXS = jnp.asarray(
    [C.ACTION_BOUND_MAX] * C.K_ACTION_SIZE + [b[1] for b in C.PARAM_BOUNDS],
    jnp.float32,
)


def invert_scale(g, x, mins=_MINS, maxs=_MAXS):
    """The reference's diff rewrite, exposed for property tests."""
    width = maxs - mins
    down = g * (maxs - x) / width   # applied when g < 0
    up = g * (x - mins) / width     # applied when g > 0
    return jnp.where(g < 0, down, jnp.where(g > 0, up, g))


@jax.custom_vjp
def invert_gradients(actor_out):
    """Identity on (B, 10) ActorOutput (low-level space); backward applies
    gradient inversion."""
    return actor_out


def _fwd(actor_out):
    return actor_out, (actor_out,)


def _bwd(res, g):
    (x,) = res
    return (invert_scale(g, x),)


invert_gradients.defvjp(_fwd, _bwd)


@jax.custom_vjp
def invert_gradients_bounded(actor_out, mins, maxs):
    """Identity with gradient inversion for an arbitrary ActionSpace's
    bounds (spaces.ActionSpace.bounds_arrays)."""
    return actor_out


def _fwd_b(actor_out, mins, maxs):
    return actor_out, (actor_out, mins, maxs)


def _bwd_b(res, g):
    x, mins, maxs = res
    return invert_scale(g, x, mins, maxs), jnp.zeros_like(mins), jnp.zeros_like(maxs)


invert_gradients_bounded.defvjp(_fwd_b, _bwd_b)
