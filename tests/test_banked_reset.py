"""VecHFOEnv.step_banked: banked auto-reset must be semantically equivalent
to the per-step vmap(reset) path (fresh valid trials on done, untouched
continuation otherwise)."""

import jax
import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.hfo_env import HFOEnv, VecHFOEnv
from dqn_hfo_tpu.env.state import EnvConfig

B = 8


def make_venv():
    env = HFOEnv(EnvConfig(), DEFAULT_PARAMS, noise_scale=0.0)
    return VecHFOEnv(env, B)


def dash_actions():
    return (jnp.full((B, 1), C.DASH, jnp.int32),
            jnp.full((B, 1), 100.0, jnp.float32),
            jnp.zeros((B, 1), jnp.float32), jnp.zeros((B, 1), jnp.float32))


class TestBankedReset:
    def test_no_done_matches_plain_step(self):
        venv = make_venv()
        states, obs = jax.jit(venv.reset)(jax.random.PRNGKey(0))
        bank = jax.jit(lambda k: venv.make_reset_bank(k, 4))(
            jax.random.PRNGKey(1))
        counters = jnp.zeros((B,), jnp.int32)
        a, p1, p2, p3 = dash_actions()
        s_plain, o_plain, i_plain = jax.jit(venv.step)(states, a, p1, p2, p3)
        s_bank, counters, o_bank, i_bank = jax.jit(venv.step_banked)(
            states, counters, bank, a, p1, p2, p3)
        assert not bool(jnp.any(i_plain.done))
        np.testing.assert_allclose(np.asarray(o_plain), np.asarray(o_bank))
        np.testing.assert_allclose(np.asarray(s_plain.ball_pos),
                                   np.asarray(s_bank.ball_pos))
        assert int(counters.sum()) == 0
        np.testing.assert_array_equal(np.asarray(i_plain.reward),
                                      np.asarray(i_bank.reward))

    def test_done_env_adopts_bank_entry_and_counts(self):
        venv = make_venv()
        states, obs = jax.jit(venv.reset)(jax.random.PRNGKey(0))
        bank_states, bank_obs = jax.jit(
            lambda k: venv.make_reset_bank(k, 4))(jax.random.PRNGKey(1))
        # Force env 0 to terminate this step: one cycle from the time cap.
        import dataclasses
        t = states.t.at[0].set(DEFAULT_PARAMS.frames_per_trial - 1)
        states = dataclasses.replace(states, t=t)
        counters = jnp.zeros((B,), jnp.int32)
        a, p1, p2, p3 = (jnp.full((B, 1), C.NOOP, jnp.int32),
                         jnp.zeros((B, 1)), jnp.zeros((B, 1)),
                         jnp.zeros((B, 1)))
        s, counters, o, info = jax.jit(venv.step_banked)(
            states, counters, (bank_states, bank_obs), a, p1, p2, p3)
        assert bool(info.done[0]) and int(info.status[0]) == C.OUT_OF_TIME
        assert int(counters[0]) == 1 and int(counters[1:].sum()) == 0
        # env 0's new state/obs is bank entry (0, 0)
        np.testing.assert_allclose(np.asarray(s.ball_pos[0]),
                                   np.asarray(bank_states.ball_pos[0, 0]))
        np.testing.assert_allclose(np.asarray(o[0]),
                                   np.asarray(bank_obs[0, 0]))
        assert int(s.t[0]) == int(bank_states.t[0, 0])

    def test_counter_wraps_modulo_rounds(self):
        venv = make_venv()
        states, _ = jax.jit(venv.reset)(jax.random.PRNGKey(0))
        bank = jax.jit(lambda k: venv.make_reset_bank(k, 2))(
            jax.random.PRNGKey(1))
        bank_states, bank_obs = bank
        import dataclasses
        counters = jnp.full((B,), 5, jnp.int32)  # 5 % 2 == 1 -> round 1
        t = states.t.at[:].set(DEFAULT_PARAMS.frames_per_trial - 1)
        states = dataclasses.replace(states, t=t)
        a = jnp.full((B, 1), C.NOOP, jnp.int32)
        z = jnp.zeros((B, 1))
        s, counters, o, info = jax.jit(venv.step_banked)(
            states, counters, bank, a, z, z, z)
        assert bool(jnp.all(info.done))
        np.testing.assert_allclose(np.asarray(o), np.asarray(bank_obs[1]))
        assert int(counters[0]) == 6

    def test_bank_entries_are_valid_fresh_trials(self):
        venv = make_venv()
        bank_states, bank_obs = jax.jit(
            lambda k: venv.make_reset_bank(k, 3))(jax.random.PRNGKey(2))
        assert bank_obs.shape[:2] == (3, B)
        # every entry is a live in-game trial at its first cycle
        assert bool(jnp.all(bank_states.status == C.IN_GAME))
        assert bool(jnp.all(bank_states.t == bank_states.t[0, 0]))
        # distinct start states across rounds and envs (random ball x/y)
        flat = np.asarray(bank_states.ball_pos).reshape(-1, 2)
        assert len({tuple(r) for r in np.round(flat, 6)}) > 3 * B // 2
