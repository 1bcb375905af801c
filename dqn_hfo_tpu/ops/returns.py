"""Episode-return labeling and window bookkeeping as scans.

The reference labels each completed episode with backward discounted
Monte-Carlo returns before inserting it into replay
(`LabelTransitions`, /root/reference/src/dqn.cpp:783-797):

    target[T] = r[T];  target[i] = r[i] + gamma * target[i+1]

Here episodes arrive as a (W, E) window of lockstep env steps with `done`
flags cutting episode boundaries; a single reverse `lax.scan` labels every
env column at once (SURVEY.md §5 long-context note).  The window spans two
rollout chunks so that any episode finishing in the current chunk lies fully
inside it (max episode length == frames_per_trial <= chunk length).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mc_returns(rewards, dones, gamma: float):
    """Backward discounted returns with episode cuts.

    Args:
      rewards: (W, E) f32, step-major (index 0 oldest).
      dones:   (W, E) bool, True where the transition ended its episode.
      gamma:   discount.

    Returns (W, E) f32 targets; entries of unfinished trailing episodes hold
    partial sums and must be masked by the caller (see label_mask).
    """

    def step(carry, xs):
        r, d = xs
        tgt = r + gamma * jnp.where(d, 0.0, carry)
        return tgt, tgt

    _, ys = jax.lax.scan(step, jnp.zeros_like(rewards[0]), (rewards, dones),
                         reverse=True)
    return ys


def episode_end_index(dones):
    """For each window entry, the index of its episode's terminal entry.

    Returns (W, E) i32: j(k) = smallest j >= k with dones[j]; W (one past the
    end) where the episode has not finished inside the window.
    """
    W = dones.shape[0]
    idx = jnp.arange(W, dtype=jnp.int32)

    def step(carry, xs):
        d, k = xs
        j = jnp.where(d, k, carry)
        return j, j

    init = jnp.full(dones.shape[1:], W, jnp.int32)
    _, ys = jax.lax.scan(step, init, (dones, idx), reverse=True)
    return ys


def label_mask(dones, chunk_len: int):
    """Mask of window entries whose episode terminates inside the current
    chunk (window = [prev chunk | current chunk], current = last chunk_len
    rows).  Exactly these entries become labeled/valid this round; earlier
    episodes were labeled last round, unfinished tails next round."""
    W = dones.shape[0]
    j = episode_end_index(dones)
    return (j >= (W - chunk_len)) & (j < W)
