"""rcssserver-style soccer dynamics as a pure JAX function.

This replaces the reference's external simulator (rcssserver launched as a
subprocess, /root/reference/src/hfo_game.cpp:22-38, with all agent traffic
over UDP inside the HFO client library).  Here one cycle of the server —
action application, object movement, collisions, referee — is a single pure
function over fixed-shape arrays, so `vmap` gives thousands of lockstep env
instances and XLA compiles the whole rollout onto the TPU VPU.

Mechanics implemented to rcssserver's published parameter semantics
(server.conf defaults; see ARCHITECTURE.md "Simulator fidelity" for the
mechanic-by-mechanic mapping and documented deviations):
  - omnidirectional dash with effort + stamina consumption
  - turn with speed-scaled inertia moment
  - kick with angle/margin falloff and kick_rand polar noise
  - probabilistic tackle (body-frame distance/width exponent model)
  - goalie catch rectangle (catchable_area_l x catchable_area_w along the
    commanded direction) with catch_probability
  - stamina effort/recovery degradation below thresholds
  - player-player and symmetric ball-player collision resolution
  - HFO trial referee (goal / OOB / capture / time / untouched)

Everything is vectorized over the player axis P; no Python control flow
depends on traced values.  `noise_scale=0` disables every random draw
(stochastic branches fall back to deterministic u=0.5 thresholds) so the
trajectory-parity suite can compare against the scalar C++ core.
"""

from __future__ import annotations

import dataclasses

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


def tackle_fail_prob(sp: ServerParams, rel_x, rel_y):
    """rcssserver tackle failure probability in the tackler's body frame:
    (|bx| / tackle_dist)^exp + (|by| / tackle_width)^exp, with
    tackle_back_dist substituted when the ball is behind the player.
    A zero denominator (ball behind, tackle_back_dist=0) means certain
    failure.  Clamped to [0, 1]."""
    denom_x = jnp.where(rel_x >= 0.0, sp.tackle_dist, sp.tackle_back_dist)
    px = jnp.where(
        denom_x > 1e-6,
        (jnp.abs(rel_x) / jnp.maximum(denom_x, 1e-6)) ** sp.tackle_exponent,
        jnp.inf,
    )
    py = (jnp.abs(rel_y) / sp.tackle_width) ** sp.tackle_exponent
    return jnp.minimum(px + py, 1.0)


def physics_step(sp: ServerParams, cfg: EnvConfig, state: EnvState,
                 action, arg1, arg2, key, noise_scale=1.0):
    """Advance the simulation one cycle.

    Args:
      sp, cfg: static configs.
      state: EnvState (single instance; vmap for batches).
      action: (P,) int32 in {DASH, TURN, TACKLE, KICK, CATCH, NOOP}.
      arg1, arg2: (P,) f32 action parameters (degrees / power).  For CATCH,
        arg1 is the catch direction in degrees relative to body.
      key: PRNG key for movement noise and stochastic mechanics.
      noise_scale: multiply server noise; 0.0 = fully deterministic dynamics
        (stochastic success draws become fixed u=0.5 thresholds).

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

    k_p, k_b, k_kick, k_mech = jax.random.split(key, 4)

    ball_rel = state.ball_pos[None, :] - pos            # (P, 2)
    ball_dist = jnp.sqrt(jnp.sum(ball_rel * ball_rel, axis=-1))
    ball_dir_global = jnp.arctan2(ball_rel[:, 1], ball_rel[:, 0])
    kickable = ball_dist <= sp.kickable_area
    # ball offset in each player's body frame (tackle / catch geometry)
    cosb, sinb = jnp.cos(body), jnp.sin(body)
    rel_fwd = ball_rel[:, 0] * cosb + ball_rel[:, 1] * sinb
    rel_lat = -ball_rel[:, 0] * sinb + ball_rel[:, 1] * cosb

    # Stochastic mechanic draws: fixed 0.5 in deterministic mode so success
    # conditions become sharp thresholds the C++ core reproduces exactly.
    if noise_scale != 0.0:
        u_mech = jax.random.uniform(k_mech, (2, P), F32)
    else:
        u_mech = jnp.full((2, P), 0.5, F32)
    u_tackle, u_catch = u_mech[0], u_mech[1]

    # ----- DASH ------------------------------------------------------------
    dash_power = jnp.clip(arg1, sp.min_power, sp.max_power)
    dash_dir = normalize_angle(_deg2rad(jnp.clip(arg2, -sp.max_moment, sp.max_moment)))
    # negative power dashes backwards at double stamina cost
    back = dash_power < 0.0
    eff_dir = jnp.where(back, normalize_angle(dash_dir + jnp.pi), dash_dir)
    need = jnp.where(back, 2.0 * jnp.abs(dash_power), dash_power)
    avail = jnp.minimum(need, stamina)
    power_mag = jnp.where(back, avail * 0.5, avail)
    accel_mag = (power_mag * sp.dash_power_rate * state.p_effort
                 * _dir_rate(sp, eff_dir))
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
    kick_vec = eff_kick[:, None] * jnp.stack(
        [jnp.cos(kick_ang), jnp.sin(kick_ang)], -1)
    if noise_scale != 0.0:
        # rcssserver kick noise: polar-uniform with max radius
        # kick_rand * power / max_power (rcss player.cpp kick()).
        kr = jax.random.uniform(k_kick, (2, P), F32)
        maxrnd = noise_scale * sp.kick_rand * kick_power / sp.max_power
        nr = kr[0] * maxrnd
        nth = (kr[1] * 2.0 - 1.0) * jnp.pi
        kick_vec = kick_vec + jnp.stack(
            [nr * jnp.cos(nth), nr * jnp.sin(nth)], -1)
    ball_accel = jnp.sum(jnp.where(is_kick[:, None], kick_vec, 0.0), axis=0)

    # ----- TACKLE ----------------------------------------------------------
    # Probabilistic tackle: any TACKLE command is an attempt — the tackler
    # freezes for tackle_cycles regardless — but the ball is only accelerated
    # when the body-frame distance model succeeds.  Effective power scales
    # from max_tackle_power (forward) to max_back_tackle_power (backward)
    # with the commanded direction (rcssserver v12+ directional tackle).
    tackle_deg = jnp.clip(arg1, -sp.max_moment, sp.max_moment)
    tackle_dir = _deg2rad(tackle_deg)
    is_attempt = act == C.TACKLE
    fail_p = tackle_fail_prob(sp, rel_fwd, rel_lat)
    is_tackle = is_attempt & (u_tackle < 1.0 - fail_p)
    eff_tackle = (sp.max_back_tackle_power
                  + (sp.max_tackle_power - sp.max_back_tackle_power)
                  * (1.0 - jnp.abs(tackle_deg) / 180.0)) * sp.tackle_power_rate
    tackle_ang = body + tackle_dir
    ball_accel = ball_accel + jnp.sum(
        jnp.where(
            is_tackle[:, None],
            eff_tackle[:, None]
            * jnp.stack([jnp.cos(tackle_ang), jnp.sin(tackle_ang)], -1),
            0.0,
        ),
        axis=0,
    )
    new_frozen = jnp.where(
        is_attempt, jnp.int32(sp.tackle_cycles), jnp.maximum(state.p_frozen - 1, 0)
    )

    touched = is_kick | is_tackle

    # ----- CATCH (goalie) --------------------------------------------------
    # rcssserver catch: the ball must lie inside the catchable rectangle
    # (length catchable_area_l along the commanded direction, width
    # catchable_area_w), and the catch succeeds with catch_probability.
    goalie_mask = jnp.zeros((P,), bool)
    if cfg.defense_npcs > 0 and cfg.defense_goalie:
        goalie_mask = goalie_mask.at[cfg.n_offense].set(True)
    catch_ang = _deg2rad(jnp.clip(arg1, -sp.max_moment, sp.max_moment))
    cosc = jnp.cos(catch_ang)
    sinc = jnp.sin(catch_ang)
    catch_fwd = rel_fwd * cosc + rel_lat * sinc
    catch_lat = -rel_fwd * sinc + rel_lat * cosc
    in_rect = (
        (catch_fwd >= 0.0)
        & (catch_fwd <= sp.catchable_area_l)
        & (jnp.abs(catch_lat) <= sp.catchable_area_w * 0.5)
    )
    caught = jnp.any(
        (act == C.CATCH) & goalie_mask & in_rect
        & (u_catch < sp.catch_probability)
    )

    # ----- Movement --------------------------------------------------------
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

    # ----- Player-player collision resolution ------------------------------
    # rcssserver: overlapping players back off along the center line by half
    # the overlap each, and every collided object's velocity is scaled by
    # -0.1.  One resolution pass per cycle (rcssserver iterates; deviation
    # documented in ARCHITECTURE.md).
    if P > 1:
        diff = new_pos[:, None, :] - new_pos[None, :, :]        # (P, P, 2)
        pdist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        pair = (pdist < 2.0 * sp.player_size) & ~jnp.eye(P, dtype=bool)
        pnormal = diff / jnp.maximum(pdist, 1e-6)[..., None]
        overlap = 0.5 * (2.0 * sp.player_size - pdist)
        disp = jnp.sum(
            jnp.where(pair[..., None], overlap[..., None] * pnormal, 0.0),
            axis=1,
        )
        p_collided = jnp.any(pair, axis=1)
        new_pos = new_pos + disp
        new_vel = jnp.where(p_collided[:, None], new_vel * -0.1, new_vel)

    # ----- Ball-player collision (symmetric: both objects back off by half
    # the overlap, both velocities scaled by -0.1) ---------------------------
    coll_rel = nb_pos[None, :] - new_pos                 # (P, 2)
    coll_dist = jnp.sqrt(jnp.sum(coll_rel * coll_rel, axis=-1))
    min_sep = sp.player_size + sp.ball_size
    colliding = coll_dist < min_sep
    any_coll = jnp.any(colliding)
    # resolve against the nearest colliding player along the contact normal
    nearest = jnp.argmin(jnp.where(colliding, coll_dist, jnp.inf))
    ndist = jnp.maximum(coll_dist[nearest], 1e-6)
    normal = coll_rel[nearest] / ndist
    half_overlap = 0.5 * (min_sep - coll_dist[nearest])
    nb_pos = jnp.where(any_coll, nb_pos + normal * half_overlap, nb_pos)
    nb_vel = jnp.where(any_coll, nb_vel * -0.1, nb_vel)
    hit_player = any_coll & (jnp.arange(P) == nearest)
    new_pos = jnp.where(hit_player[:, None],
                        new_pos - normal[None, :] * half_overlap, new_pos)
    new_vel = jnp.where(hit_player[:, None], new_vel * -0.1, new_vel)

    # ----- Toucher tracking ------------------------------------------------
    any_touch = jnp.any(touched)
    # lowest-index toucher wins on simultaneous kicks (rare)
    toucher = jnp.argmax(touched)
    new_last_side = jnp.where(any_touch, sides[toucher], state.last_toucher_side)
    new_last_unum = jnp.where(any_touch, unums[toucher], state.last_toucher_unum)
    new_untouched = jnp.where(any_touch, 0, state.untouched + 1)

    # ----- Stamina / effort / recovery (rcssserver updateStamina order:
    # consume, degrade/restore effort, degrade recovery, then recover) ------
    st0 = stamina - stamina_used
    effort = state.p_effort
    effort = jnp.where(
        st0 <= sp.effort_dec_thr * sp.stamina_max,
        jnp.maximum(effort - sp.effort_dec, sp.effort_min), effort)
    effort = jnp.where(
        st0 >= sp.effort_inc_thr * sp.stamina_max,
        jnp.minimum(effort + sp.effort_inc, sp.effort_max), effort)
    recovery = jnp.where(
        st0 <= sp.recover_dec_thr * sp.stamina_max,
        jnp.maximum(state.p_recovery - sp.recover_dec, sp.recover_min),
        state.p_recovery)
    new_stamina = jnp.clip(st0 + recovery * sp.stamina_inc_max,
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

    new_state = dataclasses.replace(
        state,
        ball_pos=nb_pos,
        ball_vel=nb_vel,
        p_pos=new_pos,
        p_vel=new_vel,
        p_body=new_body,
        p_stamina=new_stamina,
        p_effort=effort,
        p_recovery=recovery,
        p_frozen=new_frozen,
        t=new_t,
        untouched=new_untouched,
        status=status,
        last_toucher_side=new_last_side,
        last_toucher_unum=new_last_unum,
    )
    return new_state, touched
