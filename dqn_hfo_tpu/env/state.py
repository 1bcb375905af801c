"""Environment state pytrees.

The whole simulator state is a flat pytree of fixed-shape arrays so it can be
vmapped over thousands of env instances and carried through `lax.scan`
(replacing the reference's external-process rcssserver + per-episode
HFOGameState object, /root/reference/src/hfo_game.hpp:36-60).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from dqn_hfo_tpu import constants as C


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in fields), None

    def unflatten(_, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class EnvState:
    """Full simulator + reward-shaping state for one env instance.

    Player axis layout: [offense agents..., offense NPCs..., defense NPCs...]
    (goalie, if any, is the first defense NPC). All angles are radians.
    """

    # Ball
    ball_pos: Any   # (2,) f32
    ball_vel: Any   # (2,) f32

    # Players: (P, ...) f32 unless noted
    p_pos: Any      # (P, 2)
    p_vel: Any      # (P, 2)
    p_body: Any     # (P,) radians in [-pi, pi)
    p_stamina: Any  # (P,)
    p_effort: Any   # (P,) — dash efficiency, degrades below effort_dec_thr
    p_recovery: Any  # (P,) — stamina recovery rate, degrades monotonically
    p_frozen: Any   # (P,) i32 — cycles remaining frozen (post-tackle)

    # Referee / trial state
    t: Any                 # () i32 — cycle within trial
    untouched: Any         # () i32 — cycles since last kick
    status: Any            # () i32 — C.IN_GAME etc.
    last_toucher_side: Any  # () i32 — C.SIDE_NONE / LEFT / RIGHT
    last_toucher_unum: Any  # () i32 — uniform number of last kicker, -1 none

    # Reward-shaping carried state, one slot per learning agent
    # (reference: HFOGameState fields, hfo_game.hpp:47-59)
    sh_old_ball_prox: Any       # (A,) f32
    sh_old_kickable: Any        # (A,) f32
    sh_old_ball_dist_goal: Any  # (A,) f32
    sh_got_kickable: Any        # (A,) bool
    sh_pass_active: Any         # (A,) bool
    sh_old_toucher_unum: Any    # (A,) i32  (old_player_on_ball)
    sh_old_toucher_side: Any    # (A,) i32
    sh_first_step: Any          # (A,) bool — deltas suppressed on first update

    # PRNG
    rng: Any  # jax PRNG key


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static game configuration (the reference's game-topology flags:
    dqn_main.cpp:53-59 and ball-init flags hfo_game.cpp:17-19)."""

    offense_agents: int = 1
    offense_npcs: int = 0     # scripted offense (dummy teammates)
    defense_npcs: int = 0     # scripted defense (chaser/goalie/dummies)
    defense_goalie: bool = False  # first defense NPC plays goalie
    ball_x_min: float = 0.0   # fraction of the offensive half-length
    ball_x_max: float = 0.2
    offense_on_ball: int = 0

    # --- encoder variant switches (env/features.py) -----------------------
    # Three acknowledged-unverified reconstructions of the HFO client's
    # low-level encoder, surfaced as flags so a future cross-check against
    # the real server is a flag flip, not a code change.  None of them
    # touches the reward-critical indices 12-15 / 51-55 (pinned by
    # tests/test_features.py::TestEncoderVariants).
    # Landmark #6 "Center Field": the pitch center mark (0,0) [default] or
    # the center of the offensive half (half_length/2, 0).
    center_field_mark: str = "pitch_center"   # | "half_field_center"
    # OOB distance features 46-49: linear clip-normalization over the play
    # region [default] or HFO's landmark proximity formula on the edge
    # distance.
    oob_feature_norm: str = "linear_clip"     # | "hfo_prox"
    # Per-player 9-tuple (59+9k): body-relative angles + raw 1-11 unum
    # [default, FeatureExtractor::addPlayerFeatures reading] or global
    # angles + unum normalized to [-1,1].
    player_block_variant: str = "body_rel_raw_unum"  # | "global_norm_unum"

    @property
    def n_players(self) -> int:
        return self.offense_agents + self.offense_npcs + self.defense_npcs

    @property
    def n_offense(self) -> int:
        return self.offense_agents + self.offense_npcs

    @property
    def state_size(self) -> int:
        return C.num_state_features(self.n_players)

    def unum(self, player_idx: int) -> int:
        """Uniform number of a player. Offense get 7,8,...; the goalie gets 1;
        other defenders 2,3,... Only self-consistency matters for reward
        shaping (reference compares playerOnBall().unum to our unum,
        hfo_game.cpp:192)."""
        if player_idx < self.n_offense:
            return 7 + player_idx
        d = player_idx - self.n_offense
        if self.defense_goalie:
            return 1 if d == 0 else 2 + d - 1
        return 2 + d

    def side(self, player_idx: int) -> int:
        return C.SIDE_LEFT if player_idx < self.n_offense else C.SIDE_RIGHT


def unum_array(cfg: EnvConfig) -> jnp.ndarray:
    return jnp.asarray([cfg.unum(i) for i in range(cfg.n_players)], jnp.int32)


def side_array(cfg: EnvConfig) -> jnp.ndarray:
    return jnp.asarray([cfg.side(i) for i in range(cfg.n_players)], jnp.int32)
