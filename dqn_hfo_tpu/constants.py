"""Physics, field, and feature-set constants for the TPU-native HFO engine.

These mirror the rcssserver defaults the reference implicitly depends on
(the reference drives an external rcssserver through the HFO client library;
see /root/reference/src/hfo_game.cpp:8 for the server invocation).  Here the
simulator is in-repo, so every constant is explicit and test-pinned.

Action / status enums follow hfo::action_t / hfo::status_t ordering, which the
reference relies on numerically (e.g. /root/reference/src/dqn.cpp:196-208 maxes
over discrete activations whose indices ARE the action_t values).
"""

from __future__ import annotations

import dataclasses

# ---------------------------------------------------------------------------
# Action enum (matches hfo::action_t ordering: DASH..KICK are the 4 discrete
# actions of the parameterized action space; see /root/reference/src/dqn.hpp:20)
# ---------------------------------------------------------------------------
DASH = 0
TURN = 1
TACKLE = 2
KICK = 3
CATCH = 4
NOOP = 5
QUIT = 6
# Mid-level parameterized macros (BASELINE.json config 4)
KICK_TO = 7
MOVE_TO = 8
DRIBBLE_TO = 9
INTERCEPT = 10

# ---------------------------------------------------------------------------
# Status enum (matches hfo::status_t; reference: hfo_game.cpp:122-129 and
# dqn_main.cpp:185 rely on IN_GAME / GOAL distinctions)
# ---------------------------------------------------------------------------
IN_GAME = 0
GOAL = 1
CAPTURED_BY_DEFENSE = 2
OUT_OF_BOUNDS = 3
OUT_OF_TIME = 4
SERVER_DOWN = 5

# Team sides
SIDE_NONE = -1
SIDE_LEFT = 0
SIDE_RIGHT = 1

# ---------------------------------------------------------------------------
# Parameterized action space shape (reference: dqn.hpp:18-21)
# ---------------------------------------------------------------------------
K_ACTION_SIZE = 4         # DASH, TURN, TACKLE, KICK
K_ACTION_PARAM_SIZE = 6   # dash pow, dash ang, turn ang, tackle ang, kick pow, kick ang
K_STATE_INPUT_COUNT = 1   # frame-stack depth
K_MINIBATCH_SIZE = 32

# Param slot offsets per action (reference: GetParamOffset, dqn.cpp:162-178)
PARAM_OFFSETS = {
    DASH: (0, 1),
    TURN: (2, None),
    TACKLE: (3, None),
    KICK: (4, 5),
}

# Bounds used by gradient inversion and random exploration
# (reference: dqn.cpp:932, 944-949, 664-682)
ACTION_BOUND_MIN = -1.0
ACTION_BOUND_MAX = 1.0
# per-param (min, max): dash power, dash angle, turn angle, tackle angle,
# kick power, kick angle
PARAM_BOUNDS = (
    (0.0, 100.0),
    (-180.0, 180.0),
    (-180.0, 180.0),
    (-180.0, 180.0),
    (0.0, 100.0),
    (-180.0, 180.0),
)

# Exploration sampling ranges — NOTE: dash power explores [-100, 100] even
# though its inversion bound is [0, 100] (reference: dqn.cpp:669-670 vs :945).
EXPLORE_PARAM_RANGES = (
    (-100.0, 100.0),
    (-180.0, 180.0),
    (-180.0, 180.0),
    (-180.0, 180.0),
    (0.0, 100.0),
    (-180.0, 180.0),
)

# Reward shaping: pass detection threshold on the normalized ball-velocity
# feature (reference: hfo_game.hpp:18)
PASS_VEL_THRESHOLD = -0.5


def num_state_features(num_players: int) -> int:
    """Low-level feature vector length (reference: hfo_game.hpp:14-16)."""
    return 50 + 9 * num_players


# ---------------------------------------------------------------------------
# Server / physics parameters (rcssserver defaults; the HFO binary launches
# rcssserver with these unless overridden — reference launches it with only
# --fullstate --frames-per-trial 500, hfo_game.cpp:8)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ServerParams:
    # Field geometry (metres)
    pitch_length: float = 105.0
    pitch_width: float = 68.0
    goal_width: float = 14.02
    penalty_area_length: float = 16.5
    penalty_area_width: float = 40.32

    # Object geometry
    player_size: float = 0.3
    ball_size: float = 0.085
    kickable_margin: float = 0.7
    catchable_area_l: float = 1.2
    catchable_area_w: float = 1.0
    tackle_dist: float = 2.0
    tackle_width: float = 1.25

    # Kinematics
    player_decay: float = 0.4
    ball_decay: float = 0.94
    player_speed_max: float = 1.05
    ball_speed_max: float = 3.0
    player_accel_max: float = 1.0
    ball_accel_max: float = 2.7
    dash_power_rate: float = 0.006
    kick_power_rate: float = 0.027
    tackle_power_rate: float = 0.027
    inertia_moment: float = 5.0
    max_power: float = 100.0
    min_power: float = -100.0
    max_moment: float = 180.0
    side_dash_rate: float = 0.4
    back_dash_rate: float = 0.6

    # Movement noise (rcssserver: uniform in a disc of radius rand*|vel|)
    player_rand: float = 0.1
    ball_rand: float = 0.05
    # Kick noise: rcssserver adds a polar-uniform perturbation to the kick
    # acceleration with max radius kick_rand * power / max_power.
    kick_rand: float = 0.1

    # Stamina model (server.conf defaults). Each cycle after consumption:
    # stamina <= effort_dec_thr*max  -> effort -= effort_dec (floor effort_min)
    # stamina >= effort_inc_thr*max  -> effort += effort_inc (cap effort_max)
    # stamina <= recover_dec_thr*max -> recovery -= recover_dec (floor
    #   recover_min; recovery never increases again)
    # stamina += recovery * stamina_inc_max (clamped to stamina_max)
    stamina_max: float = 8000.0
    stamina_inc_max: float = 45.0
    effort_init: float = 1.0
    effort_dec_thr: float = 0.3
    effort_dec: float = 0.005
    effort_min: float = 0.6
    effort_inc_thr: float = 0.6
    effort_inc: float = 0.01
    effort_max: float = 1.0
    recover_init: float = 1.0
    recover_dec_thr: float = 0.3
    recover_dec: float = 0.002
    recover_min: float = 0.5

    # Tackle (rcssserver: always an attempt; fails with probability
    # (|bx|/tackle_dist)^exp + (|by|/tackle_width)^exp in the body frame,
    # tackler frozen for tackle_cycles either way)
    tackle_cycles: int = 10
    tackle_exponent: float = 6.0
    tackle_back_dist: float = 0.0
    max_tackle_power: float = 100.0
    max_back_tackle_power: float = 0.0

    # Goalie catch: rectangle catchable_area_l x catchable_area_w along the
    # commanded catch direction, success with catch_probability.
    catch_probability: float = 1.0

    # HFO trial rules (reference server cmd: hfo_game.cpp:8)
    frames_per_trial: int = 500
    untouched_time: int = 100

    # HFO offense-half play region: x in [0, pitch_length/2], |y| < width/2
    @property
    def half_length(self) -> float:
        return self.pitch_length / 2.0

    @property
    def half_width(self) -> float:
        return self.pitch_width / 2.0

    @property
    def kickable_area(self) -> float:
        return self.player_size + self.ball_size + self.kickable_margin

    @property
    def max_hfo_dist(self) -> float:
        """Normalization constant for proximity features: diagonal of the
        HFO half-field play region."""
        return (self.half_length**2 + self.pitch_width**2) ** 0.5


DEFAULT_PARAMS = ServerParams()
