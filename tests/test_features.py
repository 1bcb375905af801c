"""Tests for the low-level feature encoder (index contract + normalization).

The reward shaping depends on exact feature indices
(/root/reference/src/hfo_game.cpp:131-152); these tests pin them.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.features import observe
from dqn_hfo_tpu.env.hfo_env import HFOEnv
from dqn_hfo_tpu.env.state import EnvConfig


def reset(cfg=None, seed=0, noise=0.0):
    env = HFOEnv(cfg or EnvConfig(), DEFAULT_PARAMS, noise_scale=noise)
    return env, *env.reset(jax.random.PRNGKey(seed))


class TestShape:
    def test_1v0_size(self):
        _, _, obs = reset()
        assert obs.shape == (1, 59)
        assert C.num_state_features(1) == 59

    def test_multiplayer_size(self):
        cfg = EnvConfig(offense_agents=2, defense_npcs=1, defense_goalie=True)
        env = HFOEnv(cfg, DEFAULT_PARAMS, noise_scale=0.0)
        _, obs = env.reset(jax.random.PRNGKey(0))
        assert cfg.n_players == 3
        assert obs.shape == (2, C.num_state_features(3))
        assert obs.shape[-1] == 77

    def test_all_in_unit_range(self):
        _, s, obs = reset()
        o = np.asarray(obs)
        assert np.all(o >= -1.0 - 1e-5) and np.all(o <= 1.0 + 1e-5)
        assert np.all(np.isfinite(o))


class TestIndexContract:
    """Semantic indices relied upon by the reference reward shaping."""

    def test_kickable_flag(self):
        env, s, obs = reset()
        # spawn: not kickable
        assert float(obs[0, 12]) == -1.0
        # teleport player onto the ball
        s2 = dataclasses.replace(
            s, p_pos=s.p_pos.at[0].set(s.ball_pos + jnp.asarray([0.5, 0.0]))
        )
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert float(o2[12]) == 1.0

    def test_ball_angle_and_proximity(self):
        env, s, obs = reset()
        # place player 10m left of ball, facing +x: ball dead ahead
        s2 = dataclasses.replace(
            s,
            p_pos=s.p_pos.at[0].set(s.ball_pos - jnp.asarray([10.0, 0.0])),
            p_body=s.p_body.at[0].set(0.0),
        )
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert float(o2[51]) == np.float32(0.0)  # sin(0)
        assert float(o2[52]) == np.float32(1.0)  # cos(0)
        expected_prox = 1.0 - 2.0 * 10.0 / DEFAULT_PARAMS.max_hfo_dist
        assert abs(float(o2[53]) - expected_prox) < 1e-5

    def test_goal_angle_identity(self):
        env, s, obs = reset()
        hl = DEFAULT_PARAMS.half_length
        s2 = dataclasses.replace(
            s,
            p_pos=s.p_pos.at[0].set(jnp.asarray([hl - 20.0, 0.0])),
            p_body=s.p_body.at[0].set(0.0),
        )
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert abs(float(o2[13])) < 1e-6      # goal straight ahead: sin=0
        assert float(o2[14]) > 0.999          # cos=1
        expected_prox = 1.0 - 2.0 * 20.0 / DEFAULT_PARAMS.max_hfo_dist
        assert abs(float(o2[15]) - expected_prox) < 1e-5

    def test_ball_velocity_features(self):
        env, s, obs = reset()
        s2 = dataclasses.replace(s, ball_vel=jnp.asarray([1.5, 0.0]))
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert float(o2[54]) == 1.0  # valid
        expected = -1.0 + 2.0 * 1.5 / DEFAULT_PARAMS.ball_speed_max
        assert abs(float(o2[55]) - expected) < 1e-5
        # stationary ball maps to -1 (so kPassVelThreshold=-.5 is meaningful)
        o3 = observe(DEFAULT_PARAMS, env.cfg,
                     dataclasses.replace(s, ball_vel=jnp.zeros(2)), 0)
        assert float(o3[55]) == -1.0

    def test_body_angle_feature(self):
        env, s, obs = reset()
        s2 = dataclasses.replace(s, p_body=s.p_body.at[0].set(jnp.pi / 2))
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert abs(float(o2[5]) - 1.0) < 1e-6  # sin
        assert abs(float(o2[6]) - 0.0) < 1e-6  # cos

    def test_stamina_feature(self):
        env, s, obs = reset()
        s2 = dataclasses.replace(
            s, p_stamina=s.p_stamina.at[0].set(DEFAULT_PARAMS.stamina_max / 2)
        )
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert abs(float(o2[7])) < 1e-6


class TestRelativity:
    def test_rotation_invariance_of_proximity(self):
        """Rotating the observer's body changes angles, not proximities."""
        env, s, obs = reset()
        s2 = dataclasses.replace(s, p_body=s.p_body.at[0].set(1.234))
        o1 = observe(DEFAULT_PARAMS, env.cfg, s, 0)
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        assert abs(float(o1[53]) - float(o2[53])) < 1e-6  # ball prox
        assert abs(float(o1[15]) - float(o2[15])) < 1e-6  # goal prox

    def test_angles_shift_with_body(self):
        env, s, obs = reset()
        base = float(np.arctan2(float(obs[0, 51]), float(obs[0, 52])))
        rot = 0.7
        s2 = dataclasses.replace(
            s, p_body=s.p_body.at[0].set(s.p_body[0] + rot)
        )
        o2 = observe(DEFAULT_PARAMS, env.cfg, s2, 0)
        shifted = float(np.arctan2(float(o2[51]), float(o2[52])))
        d = (base - rot - shifted + np.pi) % (2 * np.pi) - np.pi
        assert abs(d) < 1e-5


class TestPublishedLayout:
    """Pin the full HFO LOW_LEVEL_FEATURE_SET ordering (LARG/HFO
    doc/manual.pdf "Low Level State Feature List" +
    src/lowlevel_feature_extractor.cpp), all 59 base indices and the
    9-feature per-player block — not just the reward-critical subset.

    Base map: 0-12 self block, 13-45 eleven landmarks x (ang sin, ang cos,
    prox), 46-49 OOB distances, 50-57 ball block, 58
    Last_Action_Success_Possible; then 9 per other player."""

    SP = DEFAULT_PARAMS

    def place(self, env, s, pos, body=0.0):
        return dataclasses.replace(
            s,
            p_pos=s.p_pos.at[0].set(jnp.asarray(pos, jnp.float32)),
            p_body=s.p_body.at[0].set(body),
        )

    def test_landmark_block_13_to_45(self):
        env, s, _ = reset()
        sp = self.SP
        hl, hw, gw = sp.half_length, sp.half_width, sp.goal_width
        pbx = hl - sp.penalty_area_length
        pbw = sp.penalty_area_width
        published = [  # manual order
            (hl, 0.0),            # 13-15 Goal Center
            (hl, -gw / 2),        # 16-18 Goal Post Top
            (hl, gw / 2),         # 19-21 Goal Post Bottom
            (pbx, 0.0),           # 22-24 Penalty Box Center
            (pbx, -pbw / 2),      # 25-27 Penalty Box Top
            (pbx, pbw / 2),       # 28-30 Penalty Box Bottom
            (0.0, 0.0),           # 31-33 Center Field
            (0.0, -hw),           # 34-36 Corner Top Left
            (hl, -hw),            # 37-39 Corner Top Right
            (hl, hw),             # 40-42 Corner Bottom Right
            (0.0, hw),            # 43-45 Corner Bottom Left
        ]
        px, py, body = 20.0, -5.0, 0.37
        o = observe(sp, env.cfg, self.place(env, s, (px, py), body), 0)
        o = np.asarray(o)
        for k, (lx, ly) in enumerate(published):
            i = 13 + 3 * k
            ang = np.arctan2(ly - py, lx - px) - body
            dist = np.hypot(lx - px, ly - py)
            assert abs(o[i] - np.sin(ang)) < 1e-5, f"landmark {k} sin"
            assert abs(o[i + 1] - np.cos(ang)) < 1e-5, f"landmark {k} cos"
            prox = 1.0 - 2.0 * dist / sp.max_hfo_dist
            assert abs(o[i + 2] - prox) < 1e-5, f"landmark {k} prox"

    def test_oob_distances_46_to_49(self):
        env, s, _ = reset()
        sp = self.SP
        hl, hw = sp.half_length, sp.half_width
        px, py = 30.0, 10.0
        o = np.asarray(observe(sp, env.cfg, self.place(env, s, (px, py)), 0))
        assert abs(o[46] - (-1 + 2 * px / hl)) < 1e-5           # left
        assert abs(o[47] - (-1 + 2 * (hl - px) / hl)) < 1e-5    # right
        assert abs(o[48] - (-1 + 2 * (py + hw) / (2 * hw))) < 1e-5  # top
        assert abs(o[49] - (-1 + 2 * (hw - py) / (2 * hw))) < 1e-5  # bottom

    def test_ball_block_50_to_57_and_58(self):
        env, s, _ = reset()
        sp = self.SP
        s2 = dataclasses.replace(
            self.place(env, s, (10.0, 0.0), 0.0),
            ball_pos=jnp.asarray([20.0, 0.0]),
            ball_vel=jnp.asarray([0.0, 1.0]),
        )
        o = np.asarray(observe(sp, env.cfg, s2, 0))
        assert o[50] == 1.0                                   # pos valid
        assert abs(o[51]) < 1e-6 and abs(o[52] - 1.0) < 1e-6  # dead ahead
        assert abs(o[53] - (1 - 2 * 10.0 / sp.max_hfo_dist)) < 1e-5
        assert o[54] == 1.0                                   # vel valid
        assert abs(o[55] - (-1 + 2 * 1.0 / sp.ball_speed_max)) < 1e-5
        assert abs(o[56] - 1.0) < 1e-6                        # vel ang sin
        assert abs(o[57]) < 1e-6                              # vel ang cos
        assert o[58] == 1.0                    # last-action-success-possible

    def test_self_block_flags(self):
        env, s, _ = reset()
        o = np.asarray(observe(self.SP, env.cfg, s, 0))
        assert o[0] == 1.0 and o[1] == 1.0      # pos/vel valid
        assert o[8] == -1.0                     # not frozen at spawn
        assert o[11] == -1.0                    # no post collision model
        s2 = dataclasses.replace(s, p_frozen=s.p_frozen.at[0].set(5))
        assert np.asarray(observe(self.SP, env.cfg, s2, 0))[8] == 1.0

    def test_per_player_block_order_and_raw_unum(self):
        """59+9k: [ang sin, ang cos, prox, body ang sin/cos (relative),
        vel mag, vel ang sin/cos (relative), raw unum] — teammate first."""
        cfg = EnvConfig(offense_agents=2)
        env = HFOEnv(cfg, self.SP, noise_scale=0.0)
        s, _ = env.reset(jax.random.PRNGKey(0))
        body0 = 0.25
        s = dataclasses.replace(
            s,
            p_pos=jnp.asarray([[10.0, 0.0], [20.0, 5.0]], jnp.float32),
            p_body=jnp.asarray([body0, 1.1], jnp.float32),
            p_vel=jnp.asarray([[0.0, 0.0], [0.3, 0.4]], jnp.float32),
        )
        o = np.asarray(observe(self.SP, env.cfg, s, 0))
        assert o.shape[0] == 59 + 9
        blk = o[59:68]
        ang = np.arctan2(5.0, 10.0) - body0
        assert abs(blk[0] - np.sin(ang)) < 1e-5
        assert abs(blk[1] - np.cos(ang)) < 1e-5
        dist = np.hypot(10.0, 5.0)
        assert abs(blk[2] - (1 - 2 * dist / self.SP.max_hfo_dist)) < 1e-5
        rel_body = 1.1 - body0
        assert abs(blk[3] - np.sin(rel_body)) < 1e-5
        assert abs(blk[4] - np.cos(rel_body)) < 1e-5
        speed = 0.5
        assert abs(blk[5] - (-1 + 2 * speed / self.SP.player_speed_max)) < 1e-5
        va = np.arctan2(0.4, 0.3) - body0
        assert abs(blk[6] - np.sin(va)) < 1e-5
        assert abs(blk[7] - np.cos(va)) < 1e-5
        # HFO leaves uniform numbers unnormalized — the one documented
        # out-of-range feature (teammate unums follow the observer's)
        assert blk[8] == float(np.asarray(o[59 + 8]))
        assert blk[8] >= 1.0  # raw unum, not squashed into [-1, 1]


class TestEncoderVariants:
    """The three unverified-encoding switches (EnvConfig.center_field_mark /
    oob_feature_norm / player_block_variant) must (a) change only their own
    feature block and (b) NEVER touch the reward-critical indices 12-15 /
    51-55 (hfo_game.cpp:131-152)."""

    REWARD_CRITICAL = list(range(12, 16)) + list(range(51, 56))

    def _pair(self, default_cfg, variant_cfg, seed=3):
        env, s, _ = reset(default_cfg, seed=seed, noise=1.0)
        env2 = HFOEnv(variant_cfg, DEFAULT_PARAMS, noise_scale=1.0)
        o1 = np.asarray(observe(DEFAULT_PARAMS, env.cfg, s, 0))
        o2 = np.asarray(observe(DEFAULT_PARAMS, env2.cfg, s, 0))
        return o1, o2

    def _assert_block(self, o1, o2, changed_lo, changed_hi):
        np.testing.assert_array_equal(o1[self.REWARD_CRITICAL],
                                      o2[self.REWARD_CRITICAL])
        assert not np.array_equal(o1[changed_lo:changed_hi],
                                  o2[changed_lo:changed_hi]), \
            "variant had no effect on its own block"
        outside = np.ones(o1.shape[0], bool)
        outside[changed_lo:changed_hi] = False
        np.testing.assert_array_equal(o1[outside], o2[outside])

    def test_center_field_mark(self):
        base = EnvConfig()
        var = dataclasses.replace(base,
                                  center_field_mark="half_field_center")
        o1, o2 = self._pair(base, var)
        # landmark #6 triple = indices 31-33
        self._assert_block(o1, o2, 31, 34)

    def test_oob_feature_norm(self):
        base = EnvConfig()
        var = dataclasses.replace(base, oob_feature_norm="hfo_prox")
        o1, o2 = self._pair(base, var)
        self._assert_block(o1, o2, 46, 50)

    def test_player_block_variant(self):
        base = EnvConfig(offense_agents=1, defense_npcs=1)
        var = dataclasses.replace(base,
                                  player_block_variant="global_norm_unum")
        o1, o2 = self._pair(base, var)
        self._assert_block(o1, o2, 59, 68)

    def test_cli_flags_reach_env_config(self):
        from dqn_hfo_tpu.runtime.config import parse_args
        from dqn_hfo_tpu.runtime.loop import make_env_config
        cfg = parse_args(["--save", "x",
                          "--center_field_mark", "half_field_center",
                          "--oob_feature_norm", "hfo_prox",
                          "--player_block_variant", "global_norm_unum"])
        ec = make_env_config(cfg)
        assert ec.center_field_mark == "half_field_center"
        assert ec.oob_feature_norm == "hfo_prox"
        assert ec.player_block_variant == "global_norm_unum"

    def test_bad_flag_value_rejected(self):
        import pytest
        from dqn_hfo_tpu.runtime.config import RunConfig
        with pytest.raises(ValueError, match="oob_feature_norm"):
            RunConfig(save="x", oob_feature_norm="nope")
