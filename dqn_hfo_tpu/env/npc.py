"""Scripted NPC policies as pure JAX branches.

The reference runs NPCs as separate OS processes connected over UDP
(/root/reference/src/hfo_policies/{chaser,dummy_goalie,dummy_teammate}.cxx,
launched via system() in hfo_game.cpp:40-63).  Here they are pure functions
evaluated inside the vectorized env step — no processes, no sockets.
"""

from __future__ import annotations

import jax.numpy as jnp

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import ServerParams
from dqn_hfo_tpu.env.physics import normalize_angle
from dqn_hfo_tpu.env.state import EnvState


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
