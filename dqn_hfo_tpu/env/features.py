"""Low-level state feature encoder (the HFO LOW_LEVEL_FEATURE_SET).

The reference requests LOW_LEVEL_FEATURE_SET from the HFO client library
(/root/reference/src/hfo_game.cpp:70) and sizes its nets with
NumStateFeatures = 50 + 9*num_players (/root/reference/src/hfo_game.hpp:14-16).
This encoder reproduces HFO's published low-level feature ordering
(LARG/HFO doc/manual.pdf "Low Level State Feature List" +
src/lowlevel_feature_extractor.cpp), pinned by tests/test_features.py:

   0      Self_Pos_Valid (+1 here: the in-graph simulator is fullstate)
   1      Self_Vel_Valid
   2,3    Self_Vel_Ang (sin, cos; body-relative)
   4      Self_Vel_Mag (normalized by player_speed_max)
   5,6    Self_Ang (sin, cos; global body angle)
   7      Stamina (normalized)
   8      Frozen flag
   9      Colliding_with_ball
   10     Colliding_with_player
   11     Colliding_with_post (posts unmodelled: always -1)
   12     Kickable
   13-45  11 landmarks x (ang sin, ang cos, proximity), order:
          Goal Center, Goal Post Top, Goal Post Bottom,
          Penalty Box Center, Penalty Box Top, Penalty Box Bottom,
          Center Field, Corner Top Left, Corner Top Right,
          Corner Bottom Right, Corner Bottom Left
   46     OOB Left Dist      (proximity to the x=0 mid line)
   47     OOB Right Dist     (proximity to the end line)
   48     OOB Top Dist
   49     OOB Bottom Dist
   50     Ball Pos Valid
   51,52  Ball Ang (sin, cos; body-relative)
   53     Ball Dist (proximity)
   54     Ball Vel Valid
   55     Ball Vel Mag (normalized by ball_speed_max)
   56,57  Ball Vel Ang (sin, cos; body-relative)
   58     Last_Action_Success_Possible (+1: in-graph actions always apply)
   59+9k  per other player (teammates first, then opponents):
          ang sin, ang cos, proximity, body ang sin, body ang cos
          (body-relative), vel mag, vel ang sin, vel ang cos (body-
          relative), uniform number — 9 features each.  Following HFO,
          the uniform-number feature is NOT normalized (raw 1-11), the
          one documented out-of-[-1,1] feature.

Total = 59 + 9*(P-1) = 50 + 9P, matching NumStateFeatures.  The
reward-shaping consumes exactly indices 12-15 and 51-55
(hfo_game.cpp:131-152), which this layout pins bit-for-bit.

Reconstruction confidence (vs the real HFO client, unreachable here):
the base 0-58 index map and the 11-landmark order are the manual's
published table; the Center Field landmark is taken as the pitch center
mark (0,0) and the OOB proximities as linear clip-normalized distances
to the HFO play-region edges — both plausible but unverified details;
the per-player 9-tuple follows FeatureExtractor::addPlayerFeatures
(landmark triple, relative body angle pair, velocity magnitude +
relative direction) with the appended unum.

Each of those three unverified choices is a config switch on EnvConfig
(center_field_mark / oob_feature_norm / player_block_variant, defaults =
the reconstruction above), so a future cross-check against the real
client is a flag flip.  The switches never touch the reward-critical
indices 12-15 / 51-55 (hfo_game.cpp:131-152) — asserted by
tests/test_features.py::TestEncoderVariants.
"""

from __future__ import annotations

import jax.numpy as jnp

from dqn_hfo_tpu.constants import ServerParams
from dqn_hfo_tpu.env.physics import normalize_angle
from dqn_hfo_tpu.env.state import EnvConfig, EnvState, unum_array

F32 = jnp.float32


def _prox(sp: ServerParams, dist):
    return 1.0 - 2.0 * jnp.minimum(dist, sp.max_hfo_dist) / sp.max_hfo_dist


def _flag(b):
    return jnp.where(b, 1.0, -1.0).astype(F32)


def _rel_angle_feats(body, target_pos, self_pos):
    """(sin, cos) of the body-relative bearing to target, plus distance."""
    d = target_pos - self_pos
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ang = normalize_angle(jnp.arctan2(d[..., 1], d[..., 0]) - body)
    return jnp.sin(ang), jnp.cos(ang), dist


def landmarks(sp: ServerParams, center_field_mark: str = "pitch_center"):
    """The 11 landmark positions, (11, 2), in HFO's published order."""
    hl, hw, gw = sp.half_length, sp.half_width, sp.goal_width
    pbx = hl - sp.penalty_area_length     # penalty box front line
    pbw = sp.penalty_area_width
    cfx = 0.0 if center_field_mark == "pitch_center" else hl / 2.0
    return jnp.asarray(
        [
            [hl, 0.0],            # goal center
            [hl, -gw / 2.0],      # goal post top
            [hl, gw / 2.0],       # goal post bottom
            [pbx, 0.0],           # penalty box center
            [pbx, -pbw / 2.0],    # penalty box top
            [pbx, pbw / 2.0],     # penalty box bottom
            [cfx, 0.0],           # center field (EnvConfig.center_field_mark)
            [0.0, -hw],           # corner top left
            [hl, -hw],            # corner top right
            [hl, hw],             # corner bottom right
            [0.0, hw],            # corner bottom left
        ],
        F32,
    )


def observe(sp: ServerParams, cfg: EnvConfig, state: EnvState, agent_idx: int):
    """Encode the feature vector for one observer agent. Returns (50+9P,)."""
    P = cfg.n_players
    a = agent_idx
    pos = state.p_pos[a]
    vel = state.p_vel[a]
    body = state.p_body[a]
    speed = jnp.sqrt(jnp.sum(vel * vel))
    vel_ang = normalize_angle(jnp.arctan2(vel[1], vel[0]) - body)
    unums = unum_array(cfg)

    ball_rel = state.ball_pos - pos
    ball_dist = jnp.sqrt(jnp.sum(ball_rel * ball_rel))
    kickable = ball_dist <= sp.kickable_area
    coll_ball = ball_dist < (sp.player_size + sp.ball_size) * 1.05
    other_dist = jnp.sqrt(jnp.sum((state.p_pos - pos) ** 2, axis=-1))
    coll_player = jnp.any((other_dist < 2.0 * sp.player_size * 1.05)
                          & (jnp.arange(P) != a))

    feats = [
        jnp.asarray(1.0, F32),                       # 0 pos valid
        jnp.asarray(1.0, F32),                       # 1 vel valid
        jnp.sin(vel_ang), jnp.cos(vel_ang),          # 2,3
        -1.0 + 2.0 * jnp.minimum(speed, sp.player_speed_max) / sp.player_speed_max,
        jnp.sin(body), jnp.cos(body),                # 5,6
        -1.0 + 2.0 * state.p_stamina[a] / sp.stamina_max,  # 7
        _flag(state.p_frozen[a] > 0),                # 8
        _flag(coll_ball),                            # 9
        _flag(coll_player),                          # 10
        jnp.asarray(-1.0, F32),                      # 11 colliding w/ post
        _flag(kickable),                             # 12
    ]

    lm = landmarks(sp, cfg.center_field_mark)        # (11, 2)
    s, c, d = _rel_angle_feats(body, lm, pos[None, :])
    lm_feats = jnp.stack([s, c, _prox(sp, d)], axis=-1).reshape(-1)  # (33,)

    hl, hw = sp.half_length, sp.half_width
    if cfg.oob_feature_norm == "linear_clip":
        oob = jnp.asarray(
            [
                -1.0 + 2.0 * jnp.clip(pos[0] / hl, 0.0, 1.0),          # 46 left
                -1.0 + 2.0 * jnp.clip((hl - pos[0]) / hl, 0.0, 1.0),   # 47 right
                -1.0 + 2.0 * jnp.clip((pos[1] + hw) / (2 * hw), 0.0, 1.0),  # 48 top
                -1.0 + 2.0 * jnp.clip((hw - pos[1]) / (2 * hw), 0.0, 1.0),  # 49 bottom
            ],
            F32,
        )
    else:  # "hfo_prox": landmark proximity formula on the edge distance
        edges = jnp.stack([
            jnp.clip(pos[0], 0.0, None),          # dist to the x=0 mid line
            jnp.clip(hl - pos[0], 0.0, None),     # dist to the end line
            jnp.clip(pos[1] + hw, 0.0, None),     # dist to the top line
            jnp.clip(hw - pos[1], 0.0, None),     # dist to the bottom line
        ])
        oob = _prox(sp, edges).astype(F32)

    bs, bc, _ = _rel_angle_feats(body, state.ball_pos, pos)
    ball_speed = jnp.sqrt(jnp.sum(state.ball_vel * state.ball_vel))
    bv_ang = normalize_angle(
        jnp.arctan2(state.ball_vel[1], state.ball_vel[0]) - body
    )
    ball_feats = jnp.stack(
        [
            jnp.asarray(1.0, F32),                   # 50 ball pos valid
            bs,                                      # 51 ball ang sin
            bc,                                      # 52 ball ang cos
            _prox(sp, ball_dist),                    # 53 ball proximity
            jnp.asarray(1.0, F32),                   # 54 ball vel valid
            -1.0 + 2.0 * jnp.minimum(ball_speed, sp.ball_speed_max) / sp.ball_speed_max,
            jnp.sin(bv_ang),                         # 56
            jnp.cos(bv_ang),                         # 57
        ]
    )

    head = jnp.concatenate(
        [jnp.stack(feats), lm_feats, oob, ball_feats,
         jnp.asarray([1.0], F32)]                    # 58 last-action-success
    )

    if P > 1:
        # Other players, observer-relative ordering: teammates first.
        # (Pure-Python ordering from the static config — constants created
        # inside jit are traced in JAX >= 0.9, so no jnp bool conversion.)
        my_side = cfg.side(a)
        order = [i for i in range(P) if i != a and cfg.side(i) == my_side] + [
            i for i in range(P) if i != a and cfg.side(i) != my_side
        ]
        idx = jnp.asarray(order, jnp.int32)
        opos = state.p_pos[idx]
        ovel = state.p_vel[idx]
        obody = state.p_body[idx]
        s, c, d = _rel_angle_feats(body, opos, pos[None, :])
        ospeed = jnp.sqrt(jnp.sum(ovel * ovel, axis=-1))
        if cfg.player_block_variant == "body_rel_raw_unum":
            ova = normalize_angle(jnp.arctan2(ovel[:, 1], ovel[:, 0]) - body)
            obody_feat = normalize_angle(obody - body)   # body-relative
            unum_feat = unums[idx].astype(F32)           # raw unum (HFO quirk)
        else:  # "global_norm_unum": global angles, unum scaled to [-1,1]
            ova = normalize_angle(jnp.arctan2(ovel[:, 1], ovel[:, 0]))
            obody_feat = normalize_angle(obody)
            unum_feat = -1.0 + 2.0 * unums[idx].astype(F32) / 11.0
        blk = jnp.stack(
            [
                s, c, _prox(sp, d),                         # landmark triple
                jnp.sin(obody_feat), jnp.cos(obody_feat),   # body angle pair
                -1.0 + 2.0 * jnp.minimum(ospeed, sp.player_speed_max) / sp.player_speed_max,
                jnp.sin(ova), jnp.cos(ova),                 # vel angle pair
                unum_feat,
            ],
            axis=-1,
        ).reshape(-1)
        head = jnp.concatenate([head, blk])

    return head.astype(F32)
