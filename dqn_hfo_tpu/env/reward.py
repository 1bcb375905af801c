"""Per-step shaped reward, replicating the reference's HFOGameState machine.

Reference: /root/reference/src/hfo_game.cpp:122-236.  The shaping reads
specific normalized features (ball proximity [53], goal proximity [15],
kickable [12], angles [51-52]/[13-14], ball velocity [54-55]) and carries
per-episode latches (got_kickable_reward, pass_active, player-on-ball
history).  Total reward = move_to_ball + 3*kick_to_goal + EOT; pass_reward is
computed (and clears the pass_active latch!) but is NOT added to the total
(hfo_game.cpp:178-180) — replicated exactly, including the latch side effect.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dqn_hfo_tpu import constants as C

F32 = jnp.float32


class ShapingState(NamedTuple):
    old_ball_prox: jnp.ndarray
    old_kickable: jnp.ndarray
    old_ball_dist_goal: jnp.ndarray
    got_kickable: jnp.ndarray
    pass_active: jnp.ndarray
    old_toucher_unum: jnp.ndarray   # player_on_ball at the previous update
    old_toucher_side: jnp.ndarray
    first_step: jnp.ndarray


class RewardOutput(NamedTuple):
    total: jnp.ndarray
    move_to_ball: jnp.ndarray
    kick_to_goal: jnp.ndarray
    eot: jnp.ndarray
    pass_reward: jnp.ndarray
    extrinsic: jnp.ndarray  # EOT-only component (hfo_game.cpp:181)


def _signed_acos(sin_v, cos_v):
    """acos(cos) negated when sin < 0 (hfo_game.cpp:138-143)."""
    ang = jnp.arccos(jnp.clip(cos_v, -1.0, 1.0))
    return jnp.where(sin_v < 0.0, -ang, ang)


def shaping_step(shaping: ShapingState, obs, status, toucher_unum,
                 toucher_side, our_unum):
    """One update+reward cycle for one observer agent.

    Args:
      shaping: carried ShapingState (scalars).
      obs: (F,) feature vector AFTER this physics step.
      status: scalar i32 game status AFTER this step.
      toucher_unum/side: scalar i32 last toucher (player_on_ball).
      our_unum: scalar i32 observer's uniform number.

    Returns (new ShapingState, RewardOutput).
    """
    episode_over = status != C.IN_GAME

    ball_prox = obs[53]
    goal_prox = obs[15]
    kickable = obs[12]
    ball_dist = 1.0 - ball_prox
    goal_dist = 1.0 - goal_prox
    ball_ang = _signed_acos(obs[51], obs[52])
    goal_ang = _signed_acos(obs[13], obs[14])
    alpha = jnp.maximum(ball_ang, goal_ang) - jnp.minimum(ball_ang, goal_ang)
    ball_dist_goal = jnp.sqrt(
        jnp.maximum(
            ball_dist * ball_dist
            + goal_dist * goal_dist
            - 2.0 * ball_dist * goal_dist * jnp.cos(alpha),
            0.0,
        )
    )

    ball_vel_valid = obs[54] > 0.0
    ball_vel = obs[55]
    pass_active = shaping.pass_active | (
        ball_vel_valid & (ball_vel > C.PASS_VEL_THRESHOLD)
    )

    suppress = shaping.first_step | episode_over
    ball_prox_delta = jnp.where(suppress, 0.0, ball_prox - shaping.old_ball_prox)
    kickable_delta = jnp.where(suppress, 0.0, kickable - shaping.old_kickable)
    ball_dist_goal_delta = jnp.where(
        suppress, 0.0, ball_dist_goal - shaping.old_ball_dist_goal
    )

    old_pob_unum = shaping.old_toucher_unum  # old_player_on_ball
    pob_unum = toucher_unum                   # player_on_ball

    # --- move_to_ball_reward (hfo_game.cpp:190-200) ---
    mtb = jnp.where(
        (pob_unum < 0) | (pob_unum == our_unum), ball_prox_delta, 0.0
    )
    kick_bonus = (kickable_delta >= 1.0) & (~shaping.got_kickable)
    mtb = mtb + jnp.where(kick_bonus, 1.0, 0.0)
    got_kickable = shaping.got_kickable | (kickable_delta >= 1.0)

    # --- kick_to_goal_reward (hfo_game.cpp:203-210) ---
    ktg = jnp.where(
        pob_unum == our_unum,
        -ball_dist_goal_delta,
        jnp.where(got_kickable, 0.2 * -ball_dist_goal_delta, 0.0),
    )

    # --- pass_reward (hfo_game.cpp:229-236): latch cleared, value unused ---
    pass_fire = pass_active & (pob_unum > 0) & (pob_unum != old_pob_unum)
    pass_r = jnp.where(pass_fire, 1.0, 0.0)
    pass_active = pass_active & ~pass_fire

    # --- EOT_reward (hfo_game.cpp:212-227) ---
    eot = jnp.where(
        status == C.GOAL,
        jnp.where(pob_unum == our_unum, 5.0, 1.0),
        0.0,
    )

    total = mtb + 3.0 * ktg + eot

    new_shaping = ShapingState(
        old_ball_prox=ball_prox,
        old_kickable=kickable,
        old_ball_dist_goal=ball_dist_goal,
        got_kickable=got_kickable,
        pass_active=pass_active,
        old_toucher_unum=pob_unum,
        old_toucher_side=toucher_side,
        first_step=jnp.zeros_like(shaping.first_step),
    )
    out = RewardOutput(
        total=total.astype(F32),
        move_to_ball=mtb.astype(F32),
        kick_to_goal=(3.0 * ktg).astype(F32),
        eot=eot.astype(F32),
        pass_reward=pass_r.astype(F32),
        extrinsic=eot.astype(F32),
    )
    return new_shaping, out


def initial_shaping(obs, toucher_unum, toucher_side):
    """Baseline-setting first update (steps==0 in the reference: deltas stay
    zero, olds are recorded; hfo_game.cpp:156-163)."""
    ball_prox = obs[53]
    goal_prox = obs[15]
    kickable = obs[12]
    ball_dist = 1.0 - ball_prox
    goal_dist = 1.0 - goal_prox
    ball_ang = _signed_acos(obs[51], obs[52])
    goal_ang = _signed_acos(obs[13], obs[14])
    alpha = jnp.maximum(ball_ang, goal_ang) - jnp.minimum(ball_ang, goal_ang)
    ball_dist_goal = jnp.sqrt(
        jnp.maximum(
            ball_dist**2 + goal_dist**2
            - 2.0 * ball_dist * goal_dist * jnp.cos(alpha),
            0.0,
        )
    )
    ball_vel_valid = obs[54] > 0.0
    pass_active = ball_vel_valid & (obs[55] > C.PASS_VEL_THRESHOLD)
    return ShapingState(
        old_ball_prox=ball_prox.astype(F32),
        old_kickable=kickable.astype(F32),
        old_ball_dist_goal=ball_dist_goal.astype(F32),
        got_kickable=jnp.asarray(False),
        pass_active=pass_active,
        old_toucher_unum=toucher_unum,
        old_toucher_side=toucher_side,
        first_step=jnp.asarray(False),
    )
