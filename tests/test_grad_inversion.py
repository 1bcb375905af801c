"""Property tests for gradient inversion vs. the reference formula
(/root/reference/src/dqn.cpp:927-957)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.learner.ddpg import DDPGConfig, actor_loss_fn
from dqn_hfo_tpu.models.nets import (actor_apply, actor_init, critic_apply,
                                     critic_init)
from dqn_hfo_tpu.ops.grad_inversion import _MAXS, _MINS, invert_scale


def ref_invert(diff, output, mins, maxs):
    """Literal transcription of dqn.cpp:927-957."""
    out = np.array(diff, np.float64)
    for i in np.ndindex(out.shape):
        d = out[i]
        x = output[i]
        mn, mx = mins[i[-1]], maxs[i[-1]]
        if d < 0:
            d *= (mx - x) / (mx - mn)
        elif d > 0:
            d *= (x - mn) / (mx - mn)
        out[i] = d
    return out


class TestInvertScale:
    def test_matches_reference_formula(self):
        rng = np.random.RandomState(0)
        x = rng.uniform(-200, 200, size=(16, 10)).astype(np.float32)
        g = rng.uniform(-3, 3, size=(16, 10)).astype(np.float32)
        mins = np.asarray(_MINS)
        maxs = np.asarray(_MAXS)
        got = np.asarray(invert_scale(jnp.asarray(g), jnp.asarray(x)))
        want = ref_invert(g, x, mins, maxs)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_gradient_flips_outside_bounds(self):
        # x above max with g<0 (pushing x up): scale (max-x) < 0 flips sign.
        x = jnp.full((1, 10), 0.0).at[0, 0].set(1.5)  # discrete bound [-1,1]
        g = jnp.full((1, 10), -1.0)
        out = invert_scale(g, x)
        assert float(out[0, 0]) > 0  # flipped
        assert float(out[0, 1]) < 0  # in-range slot keeps direction

    def test_zero_gradient_unchanged(self):
        x = jnp.zeros((2, 10))
        g = jnp.zeros((2, 10))
        assert np.all(np.asarray(invert_scale(g, x)) == 0)

    def test_scale_magnitude_at_center(self):
        # at the center of the range the scale is exactly 0.5 either way
        x = jnp.zeros((1, 10)).at[0, 4].set(50.0)  # dash power center
        g = jnp.full((1, 10), -2.0)
        out = invert_scale(g, x)
        assert float(out[0, 4]) == pytest.approx(-1.0)  # -2 * (100-50)/100


class TestActorGradientPath:
    def test_actor_grads_equal_manual_reference_procedure(self):
        """jax.grad through invert_gradients == the reference's 4-step
        procedure (critic backward, rewrite diffs, actor backward)."""
        cfg = DDPGConfig(state_size=12)
        key = jax.random.PRNGKey(0)
        ka, kc, ks = jax.random.split(key, 3)
        actor = actor_init(ka, 12, tower=(32, 16))
        critic = critic_init(kc, 12, tower=(32, 16))
        obs = jax.random.normal(ks, (8, 12))

        # our path
        grads = jax.grad(
            lambda a: actor_loss_fn(a, critic, cfg, obs)[0]
        )(actor)

        # manual reference procedure
        out = actor_apply(actor, obs)
        dq_da = jax.grad(
            lambda a: -jnp.sum(critic_apply(critic, obs, a))
        )(out)
        inverted = invert_scale(dq_da, out)
        _, vjp = jax.vjp(lambda p: actor_apply(p, obs), actor)
        (manual_grads,) = vjp(inverted)

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            grads, manual_grads,
        )

    def test_per_sample_dq_is_minus_one(self):
        """dL/dq_i == -1 for every sample (dqn.cpp:918-921)."""
        key = jax.random.PRNGKey(1)
        kc, ks, ko = jax.random.split(key, 3)
        critic = critic_init(kc, 12, tower=(16,))
        obs = jax.random.normal(ks, (8, 12))
        out = jax.random.normal(ko, (8, 10))
        q, vjp_fn = jax.vjp(lambda a: critic_apply(critic, obs, a), out)
        loss_grad = jax.grad(lambda qv: -jnp.sum(qv))(q)
        np.testing.assert_array_equal(np.asarray(loss_grad), -np.ones(8, np.float32))
