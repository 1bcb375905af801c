"""Scripted NPC policies as pure JAX branches.

The reference runs NPCs as separate OS processes connected over UDP
(/root/reference/src/hfo_policies/{chaser,dummy_goalie,dummy_teammate}.cxx,
launched via system() in hfo_game.cpp:40-63; `--offense-npcs`/
`--defense-npcs` slots are filled by HFO's agent2d base-team bots, distinct
from the NOOP `*_dummies`, dqn_main.cpp:53-59).  Here they are pure
functions evaluated inside the vectorized env step — no processes, no
sockets:

  dummy_action            NOOP forever (dummy_teammate/dummy_goalie.cxx)
  chaser_action           CATCH / TURN / DASH-at-ball (chaser.cxx:41-52)
  agent2d_defender_action goal-side mark + ball-intercept geometry, the
                          in-graph stand-in for the agent2d base defender
  agent2d_teammate_action support positioning + shoot/pass when on the
                          ball, the stand-in for the agent2d base attacker
                          (makes 2v1 pass curricula trainable: it moves,
                          draws defenders, receives and shoots)

Every policy has a scalar C++ counterpart in core/hfo_core.cpp
(core_npc_action) exercised by the trajectory-parity suite.
"""

from __future__ import annotations

import jax.numpy as jnp

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import ServerParams
from dqn_hfo_tpu.env.physics import normalize_angle
from dqn_hfo_tpu.env.state import EnvConfig, EnvState


def dummy_action(P):
    """NOOP forever (dummy_teammate.cxx:26 / dummy_goalie.cxx:25)."""
    return (
        jnp.full((P,), C.NOOP, jnp.int32),
        jnp.zeros((P,), jnp.float32),
        jnp.zeros((P,), jnp.float32),
    )


def chaser_action(sp: ServerParams, state: EnvState, player_idx, is_goalie):
    """Scripted chaser (chaser.cxx:41-52): CATCH if the goalie can, TURN
    toward the ball if misaligned, otherwise DASH 100 forward.

    The reference chaser uses high-level features where angles are normalized
    by pi; its threshold |ball_ang - orientation| > .1 therefore corresponds
    to 0.1*pi radians here.
    """
    pos = state.p_pos[player_idx]
    body = state.p_body[player_idx]
    rel = state.ball_pos - pos
    dist = jnp.sqrt(jnp.sum(rel * rel))
    rel_ang = normalize_angle(jnp.arctan2(rel[1], rel[0]) - body)

    can_catch = is_goalie & (dist <= sp.catchable_area_l)
    misaligned = jnp.abs(rel_ang) > 0.1 * jnp.pi

    act = jnp.where(
        can_catch, C.CATCH, jnp.where(misaligned, C.TURN, C.DASH)
    ).astype(jnp.int32)
    # TURN moment: 90 * normalized angle error (chaser.cxx:48), in degrees.
    # CATCH arg1 is the catch direction (degrees relative to body): aim the
    # catchable rectangle at the ball.
    turn_deg = 90.0 * (rel_ang / jnp.pi)
    catch_deg = rel_ang * (180.0 / jnp.pi)
    arg1 = jnp.where(
        can_catch, catch_deg, jnp.where(misaligned, turn_deg, 100.0)
    ).astype(jnp.float32)
    arg2 = jnp.zeros((), jnp.float32)
    return act, arg1, arg2


RAD2DEG = 180.0 / jnp.pi
ARRIVE_RADIUS = 0.5     # "at target" distance for locomotion
FACE_THRESHOLD = 0.1 * jnp.pi


def _ball_prediction(sp: ServerParams, state: EnvState):
    """Ball position ~3 cycles ahead: pos + vel*(1 + d + d^2)."""
    horizon = 1.0 + sp.ball_decay + sp.ball_decay**2
    return state.ball_pos + state.ball_vel * horizon


def _goto(pos, body, target, ball_rel_ang):
    """Locomotion primitive shared by the agent2d-flavored policies:
    omnidirectional DASH 100 toward `target` until within ARRIVE_RADIUS,
    then face the ball (TURN) or hold (NOOP)."""
    err = target - pos
    dist = jnp.sqrt(jnp.sum(err * err))
    des_ang = jnp.arctan2(err[1], err[0])
    rel = normalize_angle(des_ang - body)
    arrived = dist <= ARRIVE_RADIUS
    misfaced = jnp.abs(ball_rel_ang) > FACE_THRESHOLD
    act = jnp.where(
        arrived, jnp.where(misfaced, C.TURN, C.NOOP), C.DASH
    ).astype(jnp.int32)
    arg1 = jnp.where(
        arrived,
        jnp.where(misfaced, ball_rel_ang * RAD2DEG, 0.0),
        100.0,
    ).astype(jnp.float32)
    arg2 = jnp.where(arrived, 0.0, rel * RAD2DEG).astype(jnp.float32)
    return act, arg1, arg2


def scripted_striker_action(obs_row):
    """Fixed benchmark striker for NPC difficulty calibration: dash at the
    ball, and when kickable shoot at a point 80% toward the near post / 20%
    goal center (obs feature indices per hfo_game.cpp:131-152: [12] kickable,
    [13:15] goal-center sin/cos, [16:18] post sin/cos, [51:53] ball sin/cos).

    This is the yardstick that locates each defender's difficulty relative
    to the others (scripts/calibrate_npcs.py) — it is NOT a learner."""
    kickable = obs_row[12] > 0
    post = jnp.arctan2(obs_row[16], obs_row[17])
    center = jnp.arctan2(obs_row[13], obs_row[14])
    ball = jnp.arctan2(obs_row[51], obs_row[52])
    act = jnp.where(kickable, C.KICK, C.DASH).astype(jnp.int32)
    arg1 = jnp.asarray(100.0, jnp.float32)
    arg2 = (jnp.where(kickable, 0.8 * post + 0.2 * center, ball)
            * RAD2DEG).astype(jnp.float32)
    return act, arg1, arg2


def agent2d_defender_action(sp: ServerParams, state: EnvState, player_idx,
                            is_goalie):
    """Agent2d-flavored defender: goal-side mark + intercept geometry.

    The in-graph stand-in for HFO's `--defense-npcs` agent2d bots (launched
    by the reference server command, hfo_game.cpp:24-37).  Holds a position
    on the line between the predicted ball and the goal (goalies stay within
    ~5m of the goal line, field defenders mark 65% of the way out) and
    switches to a straight intercept when the ball comes inside its chase
    radius; goalies CATCH when the ball is catchable."""
    pos = state.p_pos[player_idx]
    body = state.p_body[player_idx]
    rel = state.ball_pos - pos
    dist = jnp.sqrt(jnp.sum(rel * rel))
    rel_ang = normalize_angle(jnp.arctan2(rel[1], rel[0]) - body)

    goal = jnp.asarray([sp.half_length, 0.0], jnp.float32)
    pred = _ball_prediction(sp, state)
    pg = pred - goal
    pg_dist = jnp.sqrt(jnp.sum(pg * pg))
    pg_unit = pg / jnp.maximum(pg_dist, 1e-6)
    if is_goalie:
        # Shot-stopping: when the ball is driven at the goal, stand on its
        # predicted crossing point at the goal mouth; otherwise hold the
        # ball-goal line a few metres off the line.
        bvx = state.ball_vel[0]
        shot = bvx > 0.3
        y_cross = state.ball_pos[1] + state.ball_vel[1] / jnp.maximum(
            bvx, 1e-6) * (sp.half_length - state.ball_pos[0])
        y_cross = jnp.clip(y_cross, -sp.goal_width * 0.5, sp.goal_width * 0.5)
        hold = goal + pg_unit * jnp.minimum(pg_dist * 0.3, 5.0)
        block = jnp.asarray([sp.half_length - 1.0, 0.0]) + jnp.asarray(
            [0.0, 1.0]) * y_cross
        home = jnp.where(shot, block, hold)
        chase_r = 2.5
    else:
        home = goal + pg * 0.65
        chase_r = 8.0
    target = jnp.where(dist < chase_r, pred, home)

    act, arg1, arg2 = _goto(pos, body, target, rel_ang)
    can_catch = jnp.asarray(is_goalie) & (dist <= sp.catchable_area_l)
    act = jnp.where(can_catch, C.CATCH, act).astype(jnp.int32)
    arg1 = jnp.where(can_catch, rel_ang * RAD2DEG, arg1).astype(jnp.float32)
    arg2 = jnp.where(can_catch, 0.0, arg2).astype(jnp.float32)
    return act, arg1, arg2


def agent2d_teammate_action(sp: ServerParams, cfg: EnvConfig,
                            state: EnvState, player_idx):
    """Agent2d-flavored offense teammate: support positioning, receive, and
    shoot/pass when on the ball.

    Stand-in for HFO's `--offense-npcs` agent2d attackers (distinct from the
    NOOP `--offense-dummies`, dqn_main.cpp:53-56): it moves to a support
    point goal-side of the ball, intercepts balls played near it (so a
    learner's pass completes and pass_reward can fire, hfo_game.cpp:190-213),
    and shoots when it receives in range — which is what makes the 2v1
    passing curricula (train.sh:116-150) meaningful."""
    pos = state.p_pos[player_idx]
    body = state.p_body[player_idx]
    rel = state.ball_pos - pos
    dist = jnp.sqrt(jnp.sum(rel * rel))
    rel_ang = normalize_angle(jnp.arctan2(rel[1], rel[0]) - body)
    kickable = dist <= sp.kickable_area

    goal = jnp.asarray([sp.half_length, 0.0], jnp.float32)
    to_goal = goal - pos
    goal_dist = jnp.sqrt(jnp.sum(to_goal * to_goal))
    goal_ang = normalize_angle(jnp.arctan2(to_goal[1], to_goal[0]) - body)

    # nearest offense mate (pass target when too far out to shoot)
    mate_idx = [i for i in range(cfg.n_offense) if i != player_idx]
    mates = state.p_pos[jnp.asarray(mate_idx)]
    md = jnp.sqrt(jnp.sum((mates - pos) ** 2, axis=-1))
    nearest = jnp.argmin(md)
    mate = mates[nearest]
    mate_dist = md[nearest]
    mate_ang = normalize_angle(
        jnp.arctan2(mate[1] - pos[1], mate[0] - pos[0]) - body)

    # on the ball: shoot inside 20m, otherwise lay it off to the mate
    shoot = goal_dist < 20.0
    kick_ang = jnp.where(shoot, goal_ang, mate_ang)
    kick_pow = jnp.where(shoot, 100.0,
                         jnp.minimum(100.0, 20.0 + 4.0 * mate_dist))

    # off the ball: receive anything played near us, else hold a support
    # point 6m goal-side of the ball, 8m to our lateral side
    pred = _ball_prediction(sp, state)
    bg = goal - state.ball_pos
    bg_unit = bg / jnp.maximum(jnp.sqrt(jnp.sum(bg * bg)), 1e-6)
    perp = jnp.stack([-bg_unit[1], bg_unit[0]])
    side = jnp.where(pos[1] >= state.ball_pos[1], 1.0, -1.0)
    support = state.ball_pos + bg_unit * 6.0 + perp * (8.0 * side)
    target = jnp.where(dist < 8.0, pred, support)
    act, arg1, arg2 = _goto(pos, body, target, rel_ang)

    act = jnp.where(kickable, C.KICK, act).astype(jnp.int32)
    arg1 = jnp.where(kickable, kick_pow, arg1).astype(jnp.float32)
    arg2 = jnp.where(kickable, kick_ang * RAD2DEG, arg2).astype(jnp.float32)
    return act, arg1, arg2
