"""rcssserver-style soccer dynamics as a pure JAX function.

This replaces the reference's external simulator (rcssserver launched as a
subprocess, /root/reference/src/hfo_game.cpp:22-38, with all agent traffic
over UDP inside the HFO client library).  Here one cycle of the server —
action application, object movement, collisions, referee — is a single pure
function over fixed-shape arrays, so `vmap` gives thousands of lockstep env
instances and XLA compiles the whole rollout onto the TPU VPU.

Everything is vectorized over the player axis P; no Python control flow
depends on traced values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import ServerParams
from dqn_hfo_tpu.env.state import EnvConfig, EnvState, side_array, unum_array

F32 = jnp.float32


def normalize_angle(a):
    """Wrap angle (radians) to [-pi, pi)."""
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def _deg2rad(d):
    return d * (jnp.pi / 180.0)


def _clamp_norm(v, max_norm):
    """Clamp the L2 norm of a (..., 2) vector to max_norm."""
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-8))
    return v * scale


def _dir_rate(sp: ServerParams, dash_dir_rad):
    """Omnidirectional dash efficiency (rcssserver dir_rate)."""
    adeg = jnp.abs(dash_dir_rad) * (180.0 / jnp.pi)
    forward = sp.side_dash_rate + (1.0 - sp.side_dash_rate) * (1.0 - adeg / 90.0)
    backward = sp.back_dash_rate - (sp.back_dash_rate - sp.side_dash_rate) * (
        1.0 - (adeg - 90.0) / 90.0
    )
    return jnp.where(adeg > 90.0, backward, forward)


def physics_step(sp: ServerParams, cfg: EnvConfig, state: EnvState,
                 action, arg1, arg2, key, noise_scale=1.0):
    """Advance the simulation one cycle.

    Args:
      sp, cfg: static configs.
      state: EnvState (single instance; vmap for batches).
      action: (P,) int32 in {DASH, TURN, TACKLE, KICK, CATCH, NOOP}.
      arg1, arg2: (P,) f32 action parameters (degrees / power).
      key: PRNG key for movement noise.
      noise_scale: multiply server noise (0.0 = deterministic dynamics).

    Returns:
      (new_state_core, kicked): new EnvState with kinematics/referee fields
      updated (reward-shaping fields untouched — see reward.py), plus a (P,)
      bool mask of players that touched the ball this cycle.
    """
    P = cfg.n_players
    sides = side_array(cfg)
    unums = unum_array(cfg)

    frozen = state.p_frozen > 0
    act = jnp.where(frozen, C.NOOP, action)

    body = state.p_body
    pos = state.p_pos
    vel = state.p_vel
    stamina = state.p_stamina

    ball_rel = state.ball_pos[None, :] - pos            # (P, 2)
    ball_dist = jnp.sqrt(jnp.sum(ball_rel * ball_rel, axis=-1))
    ball_dir_global = jnp.arctan2(ball_rel[:, 1], ball_rel[:, 0])
    kickable = ball_dist <= sp.kickable_area

    # ----- DASH ------------------------------------------------------------
    dash_power = jnp.clip(arg1, sp.min_power, sp.max_power)
    dash_dir = normalize_angle(_deg2rad(jnp.clip(arg2, -sp.max_moment, sp.max_moment)))
    # negative power dashes backwards at double stamina cost
    back = dash_power < 0.0
    eff_dir = jnp.where(back, normalize_angle(dash_dir + jnp.pi), dash_dir)
    need = jnp.where(back, 2.0 * jnp.abs(dash_power), dash_power)
    avail = jnp.minimum(need, stamina)
    power_mag = jnp.where(back, avail * 0.5, avail)
    accel_mag = power_mag * sp.dash_power_rate * sp.effort_init * _dir_rate(sp, eff_dir)
    accel_ang = body + eff_dir
    is_dash = act == C.DASH
    p_accel = jnp.where(
        is_dash[:, None],
        accel_mag[:, None] * jnp.stack([jnp.cos(accel_ang), jnp.sin(accel_ang)], -1),
        0.0,
    )
    p_accel = _clamp_norm(p_accel, sp.player_accel_max)
    stamina_used = jnp.where(is_dash, avail, 0.0)

    # ----- TURN ------------------------------------------------------------
    moment = _deg2rad(jnp.clip(arg1, -sp.max_moment, sp.max_moment))
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=-1))
    actual_moment = moment / (1.0 + sp.inertia_moment * speed)
    new_body = jnp.where(act == C.TURN, normalize_angle(body + actual_moment), body)

    # ----- KICK ------------------------------------------------------------
    kick_power = jnp.clip(arg1, 0.0, sp.max_power)
    kick_dir = _deg2rad(jnp.clip(arg2, -sp.max_moment, sp.max_moment))
    rel_ball_ang = normalize_angle(ball_dir_global - body)
    margin_dist = jnp.clip(
        (ball_dist - sp.player_size - sp.ball_size) / sp.kickable_margin, 0.0, 1.0
    )
    kick_rate = sp.kick_power_rate * (
        1.0 - 0.25 * jnp.abs(rel_ball_ang) / jnp.pi - 0.25 * margin_dist
    )
    eff_kick = kick_power * kick_rate
    kick_ang = new_body + kick_dir
    is_kick = (act == C.KICK) & kickable
    ball_accel = jnp.sum(
        jnp.where(
            is_kick[:, None],
            eff_kick[:, None] * jnp.stack([jnp.cos(kick_ang), jnp.sin(kick_ang)], -1),
            0.0,
        ),
        axis=0,
    )

    # ----- TACKLE ----------------------------------------------------------
    # Simplified deterministic tackle: pushes the ball along body+tackle_dir
    # when within tackle range; the tackler freezes for tackle_cycles.
    tackle_dir = _deg2rad(jnp.clip(arg1, -sp.max_moment, sp.max_moment))
    tackle_ok = ball_dist <= sp.tackle_dist
    is_tackle = (act == C.TACKLE) & tackle_ok
    tackle_ang = body + tackle_dir
    ball_accel = ball_accel + jnp.sum(
        jnp.where(
            is_tackle[:, None],
            (sp.max_power * sp.tackle_power_rate)
            * jnp.stack([jnp.cos(tackle_ang), jnp.sin(tackle_ang)], -1),
            0.0,
        ),
        axis=0,
    )
    new_frozen = jnp.where(
        is_tackle, jnp.int32(sp.tackle_cycles), jnp.maximum(state.p_frozen - 1, 0)
    )

    touched = is_kick | is_tackle

    # ----- CATCH (goalie) --------------------------------------------------
    goalie_mask = jnp.zeros((P,), bool)
    if cfg.defense_npcs > 0 and cfg.defense_goalie:
        goalie_mask = goalie_mask.at[cfg.n_offense].set(True)
    catchable = ball_dist <= sp.catchable_area_l
    caught = jnp.any((act == C.CATCH) & goalie_mask & catchable)

    # ----- Movement --------------------------------------------------------
    k_p, k_b = jax.random.split(key)
    ball_accel = _clamp_norm(ball_accel, sp.ball_accel_max)

    new_vel = _clamp_norm(vel + p_accel, sp.player_speed_max)
    if noise_scale != 0.0:
        pn = jax.random.uniform(k_p, (P, 2), F32, -1.0, 1.0)
        pspeed = jnp.sqrt(jnp.sum(new_vel * new_vel, axis=-1, keepdims=True))
        new_vel = new_vel + noise_scale * sp.player_rand * pspeed * pn
    new_pos = pos + new_vel
    new_vel = new_vel * sp.player_decay

    nb_vel = _clamp_norm(state.ball_vel + ball_accel, sp.ball_speed_max)
    if noise_scale != 0.0:
        bn = jax.random.uniform(k_b, (2,), F32, -1.0, 1.0)
        bspeed = jnp.sqrt(jnp.sum(nb_vel * nb_vel))
        nb_vel = nb_vel + noise_scale * sp.ball_rand * bspeed * bn
    nb_pos = state.ball_pos + nb_vel
    nb_vel = nb_vel * sp.ball_decay

    # ----- Ball-player collision (rcssserver: back off, vel *= -0.1) -------
    coll_rel = nb_pos[None, :] - new_pos                 # (P, 2)
    coll_dist = jnp.sqrt(jnp.sum(coll_rel * coll_rel, axis=-1))
    min_sep = sp.player_size + sp.ball_size
    colliding = coll_dist < min_sep
    any_coll = jnp.any(colliding)
    # push ball out of the nearest colliding player along the contact normal
    nearest = jnp.argmin(jnp.where(colliding, coll_dist, jnp.inf))
    normal = coll_rel[nearest] / jnp.maximum(coll_dist[nearest], 1e-6)
    pushed = new_pos[nearest] + normal * min_sep
    nb_pos = jnp.where(any_coll, pushed, nb_pos)
    nb_vel = jnp.where(any_coll, nb_vel * -0.1, nb_vel)

    # ----- Toucher tracking ------------------------------------------------
    any_touch = jnp.any(touched)
    # lowest-index toucher wins on simultaneous kicks (rare)
    toucher = jnp.argmax(touched)
    new_last_side = jnp.where(any_touch, sides[toucher], state.last_toucher_side)
    new_last_unum = jnp.where(any_touch, unums[toucher], state.last_toucher_unum)
    new_untouched = jnp.where(any_touch, 0, state.untouched + 1)

    # ----- Stamina ---------------------------------------------------------
    new_stamina = jnp.clip(stamina - stamina_used + sp.stamina_inc_max,
                           0.0, sp.stamina_max)

    # ----- Referee (HFO trial rules) ---------------------------------------
    half_l = sp.half_length
    half_w = sp.half_width
    goal = (nb_pos[0] > half_l) & (jnp.abs(nb_pos[1]) < sp.goal_width / 2.0)
    oob = (
        (nb_pos[0] < 0.0)
        | (jnp.abs(nb_pos[1]) > half_w)
        | ((nb_pos[0] > half_l) & ~goal)
    )
    # defense possession => captured (HFO ends the trial when defense controls
    # the ball); also an explicit goalie catch.
    def_kickable = jnp.any(
        (sides == C.SIDE_RIGHT)
        & (jnp.sqrt(jnp.sum((nb_pos[None, :] - new_pos) ** 2, -1)) <= sp.kickable_area)
    )
    captured = caught | def_kickable
    new_t = state.t + 1
    out_of_time = (new_t >= sp.frames_per_trial) | (new_untouched >= sp.untouched_time)

    status = jnp.where(
        goal,
        C.GOAL,
        jnp.where(
            captured,
            C.CAPTURED_BY_DEFENSE,
            jnp.where(oob, C.OUT_OF_BOUNDS,
                      jnp.where(out_of_time, C.OUT_OF_TIME, C.IN_GAME)),
        ),
    ).astype(jnp.int32)

    new_state = EnvState(
        ball_pos=nb_pos,
        ball_vel=nb_vel,
        p_pos=new_pos,
        p_vel=new_vel,
        p_body=new_body,
        p_stamina=new_stamina,
        p_frozen=new_frozen,
        t=new_t,
        untouched=new_untouched,
        status=status,
        last_toucher_side=new_last_side,
        last_toucher_unum=new_last_unum,
        sh_old_ball_prox=state.sh_old_ball_prox,
        sh_old_kickable=state.sh_old_kickable,
        sh_old_ball_dist_goal=state.sh_old_ball_dist_goal,
        sh_got_kickable=state.sh_got_kickable,
        sh_pass_active=state.sh_pass_active,
        sh_old_toucher_unum=state.sh_old_toucher_unum,
        sh_old_toucher_side=state.sh_old_toucher_side,
        sh_first_step=state.sh_first_step,
        rng=state.rng,
    )
    return new_state, touched
