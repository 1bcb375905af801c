"""Low-level state feature encoder (the HFO LOW_LEVEL_FEATURE_SET analogue).

The reference requests LOW_LEVEL_FEATURE_SET from the HFO client library
(/root/reference/src/hfo_game.cpp:70) and sizes its nets with
NumStateFeatures = 50 + 9*num_players (/root/reference/src/hfo_game.hpp:14-16).
The reward shaping depends on exact feature indices
(/root/reference/src/hfo_game.cpp:131-152):

  [12]    kickable flag
  [13-15] goal-center angle sin/cos + proximity
  [51-53] ball angle sin/cos + proximity
  [54]    ball-velocity valid
  [55]    ball-velocity magnitude

This encoder pins those indices exactly.  Layout for observer agent `a`
(all features in [-1, 1]; angles body-relative as (sin, cos); proximity
 = 1 - 2*dist/max_hfo_dist):

   0      self position valid (+1 under fullstate)
   1      self velocity valid
   2,3    self velocity angle (rel. body)
   4      self speed, normalized by player_speed_max
   5,6    self body angle (absolute)
   7      stamina, normalized
   8      frozen flag
   9      colliding-with-ball
   10     colliding-with-player
   11     colliding-with-post (posts unmodelled: always -1)
   12     kickable
   13-39  9 landmarks x (ang sin, ang cos, prox): goal center, goal post top,
          goal post bottom, penalty-box center, half-field center, and the
          four corners of the HFO play region
   40-43  normalized distance to OOB lines: left, right, top, bottom
   44     trial time remaining (normalized)
   45     untouched-time counter (normalized)
   46,47  self absolute position (normalized; available under --fullstate)
   48     self uniform number (normalized)
   49     reserved (+1)
   50     ball position valid
   51,52  ball angle (rel. body)
   53     ball proximity
   54     ball velocity valid
   55     ball speed, normalized by ball_speed_max
   56,57  ball velocity angle (rel. body)
   58     last-action-success-possible (+1)
   59+9k  per other player (teammates first, then opponents): ang sin,
          ang cos, prox, vel ang sin, vel ang cos, speed, body sin,
          body cos, unum — 9 features each

Total = 59 + 9*(P-1) = 50 + 9P, matching NumStateFeatures.
"""

from __future__ import annotations

import jax.numpy as jnp

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import ServerParams
from dqn_hfo_tpu.env.physics import normalize_angle
from dqn_hfo_tpu.env.state import EnvConfig, EnvState, side_array, unum_array

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


def landmarks(sp: ServerParams):
    """The 9 landmark positions, (9, 2)."""
    hl, hw, gw = sp.half_length, sp.half_width, sp.goal_width
    return jnp.asarray(
        [
            [hl, 0.0],                        # goal center
            [hl, -gw / 2.0],                  # goal post top
            [hl, gw / 2.0],                   # goal post bottom
            [hl - sp.penalty_area_length, 0.0],  # penalty box center
            [hl / 2.0, 0.0],                  # half-field center
            [0.0, -hw],                       # corner TL
            [hl, -hw],                        # corner TR
            [hl, hw],                         # corner BR
            [0.0, hw],                        # corner BL
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
    sides = side_array(cfg)
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

    lm = landmarks(sp)                               # (9, 2)
    s, c, d = _rel_angle_feats(body, lm, pos[None, :])
    lm_feats = jnp.stack([s, c, _prox(sp, d)], axis=-1).reshape(-1)  # (27,)

    hl, hw = sp.half_length, sp.half_width
    oob = jnp.asarray(
        [
            -1.0 + 2.0 * jnp.clip(pos[0] / hl, 0.0, 1.0),          # 40 left
            -1.0 + 2.0 * jnp.clip((hl - pos[0]) / hl, 0.0, 1.0),   # 41 right
            -1.0 + 2.0 * jnp.clip((pos[1] + hw) / (2 * hw), 0.0, 1.0),  # 42 top
            -1.0 + 2.0 * jnp.clip((hw - pos[1]) / (2 * hw), 0.0, 1.0),  # 43 bottom
        ],
        F32,
    )

    misc = jnp.asarray(
        [
            -1.0 + 2.0 * state.t / sp.frames_per_trial,            # 44
            -1.0 + 2.0 * state.untouched / sp.untouched_time,      # 45
            jnp.clip(2.0 * pos[0] / hl - 1.0, -1.0, 1.0),          # 46
            jnp.clip(pos[1] / hw, -1.0, 1.0),                      # 47
            -1.0 + 2.0 * unums[a] / 11.0,                          # 48
            1.0,                                                   # 49 reserved
        ],
        F32,
    )

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
        [jnp.stack(feats), lm_feats, oob, misc, ball_feats,
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
        ova = normalize_angle(jnp.arctan2(ovel[:, 1], ovel[:, 0]) - body)
        blk = jnp.stack(
            [
                s, c, _prox(sp, d),
                jnp.sin(ova), jnp.cos(ova),
                -1.0 + 2.0 * jnp.minimum(ospeed, sp.player_speed_max) / sp.player_speed_max,
                jnp.sin(obody), jnp.cos(obody),
                -1.0 + 2.0 * unums[idx] / 11.0,
            ],
            axis=-1,
        ).reshape(-1)
        head = jnp.concatenate([head, blk])

    return head.astype(F32)
