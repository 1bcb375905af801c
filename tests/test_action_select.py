"""Stochastic action decode (SampleAction, dqn.cpp:180-194) and the solver
registry / lr_policy surface (dqn_main.cpp:30-38)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu import spaces
from dqn_hfo_tpu.learner.agent import sample_action
from dqn_hfo_tpu.learner.ddpg import (DDPGConfig, init_learner,
                                      make_lr_schedule, make_optimizer,
                                      update_once)
from dqn_hfo_tpu.learner import replay as rp


class TestSampleDecode:
    def test_probabilities_follow_activations(self):
        # DASH activation 1.0 (prob 2), TURN -1 (prob 0), TACKLE 1 (excluded),
        # KICK 0 (prob 1) -> P(DASH)=2/3, P(KICK)=1/3, never TURN/TACKLE.
        out = jnp.asarray([1.0, -1.0, 1.0, 0.0] + [float(i) for i in range(6)])
        out = jnp.tile(out, (4096, 1))
        keys = jax.random.split(jax.random.PRNGKey(0), 4096)
        a, p1, p2, p3 = jax.vmap(lambda o, k: sample_action(o, k))(out, keys)
        a = np.asarray(a)
        counts = {i: int((a == i).sum()) for i in range(4)}
        assert counts[C.TURN] == 0 and counts[C.TACKLE] == 0
        assert abs(counts[C.DASH] / 4096 - 2 / 3) < 0.05
        assert abs(counts[C.KICK] / 4096 - 1 / 3) < 0.05

    def test_param_slots_match_greedy_decode(self):
        # Deterministic case (one allowed action has all the mass): the
        # sampled decode must pick the same param slots as GetAction.
        out = jnp.asarray([[-1.0, -1.0, -1.0, 1.0,
                            10.0, 20.0, 30.0, 40.0, 55.0, 66.0]])
        a, p1, p2, p3 = sample_action(out, jax.random.PRNGKey(1))
        ga, gp1, gp2, gp3 = spaces.decode(spaces.LOW_LEVEL, out)
        assert int(a[0]) == int(ga[0]) == C.KICK
        assert float(p1[0]) == float(gp1[0]) == 55.0
        assert float(p2[0]) == float(gp2[0]) == 66.0

    def test_all_zero_mass_falls_back_uniform_over_allowed(self):
        out = jnp.asarray([-1.0, -1.0, -1.0, -1.0] + [0.0] * 6)
        out = jnp.tile(out, (2048, 1))
        keys = jax.random.split(jax.random.PRNGKey(2), 2048)
        a, *_ = jax.vmap(lambda o, k: sample_action(o, k))(out, keys)
        a = np.asarray(a)
        assert (a == C.TACKLE).sum() == 0
        for act in (C.DASH, C.TURN, C.KICK):
            assert abs((a == act).mean() - 1 / 3) < 0.06


def _one_update(cfg):
    ls = init_learner(jax.random.PRNGKey(0), cfg)
    rs = rp.init_replay(256, 8, cfg.state_size)
    key = jax.random.PRNGKey(1)
    for _ in range(4):
        key, k = jax.random.split(key)
        obs = jax.random.normal(k, (8, cfg.state_size))
        act = jax.random.uniform(k, (8, 10), minval=-1.0, maxval=1.0)
        rs, sid = rp.write_step(rs, obs, act, jnp.zeros(8), obs,
                                jnp.ones(8, bool))
        rs = rp.label_rows(rs, jnp.asarray([sid], jnp.int32),
                           jnp.zeros((1, 8)), jnp.ones((1, 8), bool))
    new_ls, (closs, avg_q, _) = jax.jit(
        lambda l, r: update_once(l, r, cfg))(ls, rs)
    return ls, new_ls, float(closs)


class TestSolverRegistry:
    @pytest.mark.parametrize(
        "solver", ["Adam", "SGD", "Nesterov", "AdaGrad", "RMSProp", "AdaDelta"])
    def test_each_solver_steps_finitely(self, solver):
        cfg = DDPGConfig(state_size=16, minibatch=8, memory_threshold=1,
                         actor_tower=(32,), critic_tower=(32,), solver=solver)
        ls, new_ls, closs = _one_update(cfg)
        assert np.isfinite(closs)
        # params actually moved
        moved = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), ls.critic,
            new_ls.critic)
        assert max(jax.tree_util.tree_leaves(moved)) > 0.0
        for leaf in jax.tree_util.tree_leaves(new_ls.critic):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_unknown_solver_raises(self):
        cfg = DDPGConfig(solver="Vanilla")
        with pytest.raises(ValueError, match="solver"):
            make_optimizer(1e-3, cfg)


class TestLrPolicy:
    def test_schedules_match_caffe_formulas(self):
        base = 0.1
        cfg = DDPGConfig(lr_gamma=0.5, lr_power=2.0, lr_stepsize=10,
                         max_iter=100)
        t = jnp.asarray(20.0)
        cases = {
            "fixed": base,
            "step": base * 0.5 ** 2,
            "exp": base * 0.5 ** 20,
            "inv": base * (1 + 0.5 * 20) ** -2.0,
            "poly": base * (1 - 20 / 100) ** 2.0,
            "sigmoid": base / (1 + np.exp(-0.5 * (20 - 10))),
        }
        import dataclasses
        for pol, want in cases.items():
            sched = make_lr_schedule(
                base, dataclasses.replace(cfg, lr_policy=pol))
            np.testing.assert_allclose(float(sched(t)), want, rtol=1e-6)

    def test_unknown_policy_raises(self):
        with pytest.raises(ValueError, match="lr_policy"):
            make_lr_schedule(0.1, DDPGConfig(lr_policy="cosine"))

    def test_step_policy_decays_inside_update(self):
        cfg = DDPGConfig(state_size=16, minibatch=8, memory_threshold=1,
                         actor_tower=(32,), critic_tower=(32,),
                         lr_policy="step", lr_gamma=0.1, lr_stepsize=1)
        ls, new_ls, closs = _one_update(cfg)
        assert np.isfinite(closs)
