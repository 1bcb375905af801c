"""Fused Pallas target-Q kernel vs. the composed XLA path (interpret mode
on CPU; the compiled kernel runs on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu.learner.ddpg import DDPGConfig, init_learner
from dqn_hfo_tpu.models.nets import actor_apply, critic_apply
from dqn_hfo_tpu.ops.fused_target import fused_target_q


class TestFusedTarget:
    def test_matches_composed_path(self):
        cfg = DDPGConfig(state_size=59)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        obs = jax.random.normal(jax.random.PRNGKey(1), (32, 59))
        ref = critic_apply(ls.critic_target, obs,
                           actor_apply(ls.actor_target, obs))
        got = fused_target_q(ls.actor_target, ls.critic_target, obs,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-4)

    def test_nontrivial_state_size(self):
        cfg = DDPGConfig(state_size=77)  # 3-player feature size
        ls = init_learner(jax.random.PRNGKey(2), cfg)
        obs = jax.random.normal(jax.random.PRNGKey(3), (32, 77))
        ref = critic_apply(ls.critic_target, obs,
                           actor_apply(ls.actor_target, obs))
        got = fused_target_q(ls.actor_target, ls.critic_target, obs,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-4)

    def test_midlevel_space_output_dims(self):
        cfg = DDPGConfig(state_size=59, action_space="mid_level")
        ls = init_learner(jax.random.PRNGKey(4), cfg)
        obs = jax.random.normal(jax.random.PRNGKey(5), (32, 59))
        ref = critic_apply(ls.critic_target, obs,
                           actor_apply(ls.actor_target, obs))
        got = fused_target_q(ls.actor_target, ls.critic_target, obs,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-4)
