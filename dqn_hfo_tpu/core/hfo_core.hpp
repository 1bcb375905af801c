// C++ reference core for the TPU-native HFO engine.
//
// Single-instance, scalar implementation of exactly the same dynamics,
// feature encoder, and reward shaping as the JAX engine
// (dqn_hfo_tpu/env/{physics,features,reward}.py). Serves as the
// golden-trajectory oracle: the vectorized XLA-compiled engine is validated
// against this core step-for-step under deterministic dynamics, and
// distribution-level (moment) tests cross-check the stochastic mechanics
// (SURVEY.md §7 layer 1; the role rcssserver itself plays for the reference,
// /root/reference/src/hfo_game.cpp:22-38).
//
// C ABI over flat arrays so Python binds via ctypes (no pybind11 in image).

#ifndef DQN_HFO_TPU_CORE_HPP_
#define DQN_HFO_TPU_CORE_HPP_

#include <cstdint>

extern "C" {

// Action ids (match hfo::action_t ordering; constants.py)
enum CoreAction : int32_t {
  kDash = 0, kTurn = 1, kTackle = 2, kKick = 3, kCatch = 4, kNoop = 5
};

// Status (match hfo::status_t)
enum CoreStatus : int32_t {
  kInGame = 0, kGoal = 1, kCapturedByDefense = 2, kOutOfBounds = 3,
  kOutOfTime = 4
};

// Field order mirrors constants.ServerParams exactly (core_bridge.py builds
// the ctypes Structure from the same ordered list).
struct CoreParams {
  float pitch_length, pitch_width, goal_width;
  float penalty_area_length, penalty_area_width;
  float player_size, ball_size, kickable_margin;
  float catchable_area_l, catchable_area_w, tackle_dist, tackle_width;
  float player_decay, ball_decay, player_speed_max, ball_speed_max;
  float player_accel_max, ball_accel_max;
  float dash_power_rate, kick_power_rate, tackle_power_rate;
  float inertia_moment, max_power, min_power, max_moment;
  float side_dash_rate, back_dash_rate;
  float player_rand, ball_rand, kick_rand;
  float stamina_max, stamina_inc_max;
  float effort_init, effort_dec_thr, effort_dec, effort_min;
  float effort_inc_thr, effort_inc, effort_max;
  float recover_init, recover_dec_thr, recover_dec, recover_min;
  int32_t tackle_cycles;
  float tackle_exponent, tackle_back_dist;
  float max_tackle_power, max_back_tackle_power;
  float catch_probability;
  int32_t frames_per_trial, untouched_time;
};

struct CoreGameConfig {
  int32_t n_players;          // total
  int32_t n_offense;          // offense agents + offense npcs
  int32_t offense_agents;     // learning agents (observers)
  int32_t defense_goalie;     // first defender is goalie (bool)
};

// Flat player state stride:
// pos(2) vel(2) body stamina frozen effort recovery = 9 floats
constexpr int kPlayerStride = 9;

struct CoreState {
  float ball_pos[2];
  float ball_vel[2];
  float players[9 * 11];      // up to 11 players, kPlayerStride each
  int32_t t, untouched, status, last_toucher_side, last_toucher_unum;
};

// Reward-shaping state per observer (reference: hfo_game.hpp:47-59)
struct CoreShaping {
  float old_ball_prox, old_kickable, old_ball_dist_goal;
  int32_t got_kickable, pass_active;
  int32_t old_toucher_unum, old_toucher_side;
  int32_t first_step;
};

void core_default_params(CoreParams* p);

// One simulator cycle. actions/arg1/arg2 are length n_players.
// noise_scale=0 gives deterministic dynamics (parity mode): every random
// draw is replaced by a fixed u=0.5, so stochastic mechanics (tackle/catch
// success) become sharp thresholds identical to the JAX engine's.
void core_step(const CoreParams* p, const CoreGameConfig* cfg,
               CoreState* state, const int32_t* actions, const float* arg1,
               const float* arg2, float noise_scale, uint64_t* rng_state);

// Encode the low-level feature vector (length 50 + 9*n_players) for observer
// agent_idx into out.
void core_observe(const CoreParams* p, const CoreGameConfig* cfg,
                  const CoreState* state, int32_t agent_idx, float* out);

// Shaping update + reward for one observer. Returns components via out5:
// [total, move_to_ball, 3*kick_to_goal, eot, pass_reward].
void core_reward(const CoreShaping* in, CoreShaping* out_sh, const float* obs,
                 int32_t status, int32_t toucher_unum, int32_t toucher_side,
                 int32_t our_unum, float* out5);

// Baseline-setting first update (steps==0 in the reference).
void core_initial_shaping(CoreShaping* sh, const float* obs,
                          int32_t toucher_unum, int32_t toucher_side);

// Scripted NPC policies (counterparts of env/npc.py; the reference fills
// these slots with NPC binaries /root/reference/src/hfo_policies/*.cxx and
// HFO's agent2d base-team bots).  policy: 0 = dummy (NOOP forever),
// 1 = chaser (CATCH / TURN / DASH-at-ball), 2 = agent2d-flavored defender
// (goal-side mark + intercept), 3 = agent2d-flavored offense teammate
// (support position, receive, shoot/pass).
enum CoreNpcPolicy : int32_t {
  kNpcDummy = 0, kNpcChaser = 1, kNpcAgent2dDefender = 2,
  kNpcAgent2dTeammate = 3
};

void core_npc_action(const CoreParams* p, const CoreGameConfig* cfg,
                     const CoreState* state, int32_t player_idx,
                     int32_t policy, int32_t is_goalie, int32_t* act,
                     float* arg1, float* arg2);

}  // extern "C"

#endif  // DQN_HFO_TPU_CORE_HPP_
