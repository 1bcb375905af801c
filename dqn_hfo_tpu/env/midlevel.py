"""Mid-level parameterized macros (KICK_TO / MOVE_TO / DRIBBLE_TO /
INTERCEPT) expanded to low-level commands inside the env step.

The HFO client library implements these as agent2d behaviors on the client
side of the socket; here they are pure vectorized functions from env state
to low-level (action, power, angle) commands, so the same physics core
serves both action sets (BASELINE.json config 4).  Target coordinates are
normalized full-field coords: x, y in [-1, 1] map to
[-half_length, half_length] x [-half_width, half_width].
"""

from __future__ import annotations

import jax.numpy as jnp

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import ServerParams
from dqn_hfo_tpu.env.physics import normalize_angle
from dqn_hfo_tpu.env.state import EnvConfig, EnvState

F32 = jnp.float32
_TURN_THRESHOLD = jnp.pi / 2  # dash with omnidir correction below this


def _rad2deg(r):
    return r * (180.0 / jnp.pi)


def _move_to_cmd(rel_ang):
    """TURN toward the target if badly misaligned, else omnidirectional
    DASH 100 with the angular correction as dash_dir."""
    misaligned = jnp.abs(rel_ang) > _TURN_THRESHOLD
    act = jnp.where(misaligned, C.TURN, C.DASH).astype(jnp.int32)
    a1 = jnp.where(misaligned, _rad2deg(rel_ang), 100.0).astype(F32)
    a2 = jnp.where(misaligned, 0.0, _rad2deg(rel_ang)).astype(F32)
    return act, a1, a2


def expand_midlevel(sp: ServerParams, cfg: EnvConfig, state: EnvState,
                    act, a1, a2, a3):
    """Expand mid-level action ids in (act, a1, a2, a3) to low-level
    commands; low-level ids pass through untouched.  All args are (P,)."""
    pos = state.p_pos
    body = state.p_body
    ball_rel = state.ball_pos[None, :] - pos
    ball_dist = jnp.sqrt(jnp.sum(ball_rel * ball_rel, axis=-1))
    kickable = ball_dist <= sp.kickable_area
    ball_ang = normalize_angle(
        jnp.arctan2(ball_rel[:, 1], ball_rel[:, 0]) - body)

    # Targets in field metres
    tx = jnp.clip(a1, -1.0, 1.0) * sp.half_length
    ty = jnp.clip(a2, -1.0, 1.0) * sp.half_width
    t_rel_x = tx - pos[:, 0]
    t_rel_y = ty - pos[:, 1]
    t_ang = normalize_angle(jnp.arctan2(t_rel_y, t_rel_x) - body)

    # Ball-relative bearing of the target (for kicks, from the BALL)
    bt_ang_global = jnp.arctan2(ty - state.ball_pos[1],
                                tx - state.ball_pos[0])
    kick_dir = normalize_angle(bt_ang_global - body)

    # --- chase: move toward an intercept point (ball + short lead) -------
    lead = state.ball_pos[None, :] + 3.0 * state.ball_vel[None, :]
    c_ang = normalize_angle(
        jnp.arctan2(lead[:, 1] - pos[:, 1], lead[:, 0] - pos[:, 0]) - body)
    chase_act, chase_a1, chase_a2 = _move_to_cmd(c_ang)

    # --- MOVE_TO ---------------------------------------------------------
    mv_act, mv_a1, mv_a2 = _move_to_cmd(t_ang)

    # --- KICK_TO: full kick toward target at requested speed -------------
    speed = jnp.clip(a3, 0.0, sp.ball_speed_max)
    # compensate the average distance/angle kick-rate penalty (~0.75)
    kick_pow = jnp.clip(speed / (sp.kick_power_rate * 0.75), 0.0,
                        sp.max_power)
    kt_act = jnp.where(kickable, C.KICK, chase_act).astype(jnp.int32)
    kt_a1 = jnp.where(kickable, kick_pow, chase_a1).astype(F32)
    kt_a2 = jnp.where(kickable, _rad2deg(kick_dir), chase_a2).astype(F32)

    # --- DRIBBLE_TO: gentle push toward target, then chase ---------------
    dr_act = jnp.where(kickable, C.KICK, chase_act).astype(jnp.int32)
    dr_a1 = jnp.where(kickable, 22.0, chase_a1).astype(F32)
    dr_a2 = jnp.where(kickable, _rad2deg(kick_dir), chase_a2).astype(F32)

    # --- INTERCEPT -------------------------------------------------------
    ic_act, ic_a1, ic_a2 = chase_act, chase_a1, chase_a2

    def sel(mid_id, m_act, m_a1, m_a2, cur):
        c_act, c_a1, c_a2 = cur
        hit = act == mid_id
        return (jnp.where(hit, m_act, c_act),
                jnp.where(hit, m_a1, c_a1),
                jnp.where(hit, m_a2, c_a2))

    out = (act.astype(jnp.int32), a1.astype(F32), a2.astype(F32))
    out = sel(C.KICK_TO, kt_act, kt_a1, kt_a2, out)
    out = sel(C.MOVE_TO, mv_act, mv_a1, mv_a2, out)
    out = sel(C.DRIBBLE_TO, dr_act, dr_a1, dr_a2, out)
    out = sel(C.INTERCEPT, ic_act, ic_a1, ic_a2, out)
    return out
