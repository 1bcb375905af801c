// C++ reference core — see hfo_core.hpp.
//
// Formula-for-formula mirror of dqn_hfo_tpu/env/physics.py, features.py and
// reward.py in float32, used as the golden oracle for trajectory-parity tests
// of the XLA-compiled vectorized engine.

#include "hfo_core.hpp"

#include <algorithm>
#include <cmath>
#include <cstring>

namespace {

constexpr float kPi = 3.14159265358979323846f;

inline float normalize_angle(float a) {
  float m = std::fmod(a + kPi, 2.0f * kPi);
  if (m < 0) m += 2.0f * kPi;
  return m - kPi;
}

inline float deg2rad(float d) { return d * (kPi / 180.0f); }

inline float clampf(float v, float lo, float hi) {
  return std::min(std::max(v, lo), hi);
}

inline void clamp_norm(float v[2], float max_norm) {
  float n = std::sqrt(v[0] * v[0] + v[1] * v[1]);
  float scale = std::min(1.0f, max_norm / std::max(n, 1e-8f));
  v[0] *= scale;
  v[1] *= scale;
}

inline float dir_rate(const CoreParams& p, float dash_dir_rad) {
  float adeg = std::fabs(dash_dir_rad) * (180.0f / kPi);
  float forward = p.side_dash_rate + (1.0f - p.side_dash_rate) * (1.0f - adeg / 90.0f);
  float backward = p.back_dash_rate -
                   (p.back_dash_rate - p.side_dash_rate) * (1.0f - (adeg - 90.0f) / 90.0f);
  return adeg > 90.0f ? backward : forward;
}

// xorshift64* PRNG; uniform in [-1, 1). Distinct stream from the JAX engine —
// parity tests run with noise_scale = 0.
inline float rand_pm1(uint64_t* s) {
  uint64_t x = *s;
  x ^= x >> 12;
  x ^= x << 25;
  x ^= x >> 27;
  *s = x;
  uint64_t r = x * 0x2545F4914F6CDD1DULL;
  return static_cast<float>((r >> 11) * (1.0 / 9007199254740992.0)) * 2.0f - 1.0f;
}

inline float rand01(uint64_t* s) { return rand_pm1(s) * 0.5f + 0.5f; }

// rcssserver tackle failure probability in the tackler's body frame
// (mirror of physics.tackle_fail_prob).
inline float tackle_fail_prob(const CoreParams& p, float rel_x, float rel_y) {
  float denom_x = rel_x >= 0.0f ? p.tackle_dist : p.tackle_back_dist;
  float px = denom_x > 1e-6f
                 ? std::pow(std::fabs(rel_x) / denom_x, p.tackle_exponent)
                 : 1e30f;
  float py = std::pow(std::fabs(rel_y) / p.tackle_width, p.tackle_exponent);
  return std::min(px + py, 1.0f);
}

inline int unum_of(const CoreGameConfig& cfg, int i) {
  if (i < cfg.n_offense) return 7 + i;
  int d = i - cfg.n_offense;
  if (cfg.defense_goalie) return d == 0 ? 1 : 2 + d - 1;
  return 2 + d;
}

inline int side_of(const CoreGameConfig& cfg, int i) {
  return i < cfg.n_offense ? 0 /*LEFT*/ : 1 /*RIGHT*/;
}

inline float kickable_area(const CoreParams& p) {
  return p.player_size + p.ball_size + p.kickable_margin;
}

inline float max_hfo_dist(const CoreParams& p) {
  float hl = p.pitch_length * 0.5f;
  return std::sqrt(hl * hl + p.pitch_width * p.pitch_width);
}

inline float prox(const CoreParams& p, float dist) {
  float m = max_hfo_dist(p);
  return 1.0f - 2.0f * std::min(dist, m) / m;
}

inline float flagf(bool b) { return b ? 1.0f : -1.0f; }

}  // namespace

extern "C" {

void core_default_params(CoreParams* p) {
  // Mirrors constants.ServerParams defaults.
  p->pitch_length = 105.0f;
  p->pitch_width = 68.0f;
  p->goal_width = 14.02f;
  p->penalty_area_length = 16.5f;
  p->penalty_area_width = 40.32f;
  p->player_size = 0.3f;
  p->ball_size = 0.085f;
  p->kickable_margin = 0.7f;
  p->catchable_area_l = 1.2f;
  p->catchable_area_w = 1.0f;
  p->tackle_dist = 2.0f;
  p->tackle_width = 1.25f;
  p->player_decay = 0.4f;
  p->ball_decay = 0.94f;
  p->player_speed_max = 1.05f;
  p->ball_speed_max = 3.0f;
  p->player_accel_max = 1.0f;
  p->ball_accel_max = 2.7f;
  p->dash_power_rate = 0.006f;
  p->kick_power_rate = 0.027f;
  p->tackle_power_rate = 0.027f;
  p->inertia_moment = 5.0f;
  p->max_power = 100.0f;
  p->min_power = -100.0f;
  p->max_moment = 180.0f;
  p->side_dash_rate = 0.4f;
  p->back_dash_rate = 0.6f;
  p->player_rand = 0.1f;
  p->ball_rand = 0.05f;
  p->kick_rand = 0.1f;
  p->stamina_max = 8000.0f;
  p->stamina_inc_max = 45.0f;
  p->effort_init = 1.0f;
  p->effort_dec_thr = 0.3f;
  p->effort_dec = 0.005f;
  p->effort_min = 0.6f;
  p->effort_inc_thr = 0.6f;
  p->effort_inc = 0.01f;
  p->effort_max = 1.0f;
  p->recover_init = 1.0f;
  p->recover_dec_thr = 0.3f;
  p->recover_dec = 0.002f;
  p->recover_min = 0.5f;
  p->tackle_cycles = 10;
  p->tackle_exponent = 6.0f;
  p->tackle_back_dist = 0.0f;
  p->max_tackle_power = 100.0f;
  p->max_back_tackle_power = 0.0f;
  p->catch_probability = 1.0f;
  p->frames_per_trial = 500;
  p->untouched_time = 100;
}

void core_step(const CoreParams* pp, const CoreGameConfig* cfgp,
               CoreState* st, const int32_t* actions, const float* arg1,
               const float* arg2, float noise_scale, uint64_t* rng_state) {
  const CoreParams& p = *pp;
  const CoreGameConfig& cfg = *cfgp;
  const int P = cfg.n_players;
  const float karea = kickable_area(p);

  float p_accel[11][2] = {};
  float new_body[11];
  float stamina_used[11] = {};
  bool touched[11] = {};
  int new_frozen[11];
  float ball_accel[2] = {0.0f, 0.0f};
  bool caught = false;

  for (int i = 0; i < P; ++i) {
    float* pl = st->players + i * kPlayerStride;
    float px = pl[0], py = pl[1], vx = pl[2], vy = pl[3];
    float body = pl[4], stamina = pl[5];
    int frozen = static_cast<int>(pl[6]);
    float effort = pl[7];
    int act = frozen > 0 ? kNoop : actions[i];
    new_body[i] = body;
    new_frozen[i] = std::max(frozen - 1, 0);

    float brx = st->ball_pos[0] - px, bry = st->ball_pos[1] - py;
    float ball_dist = std::sqrt(brx * brx + bry * bry);
    float ball_dir_global = std::atan2(bry, brx);
    bool kickable = ball_dist <= karea;
    // ball offset in the body frame (tackle / catch geometry)
    float cb = std::cos(body), sb = std::sin(body);
    float rel_fwd = brx * cb + bry * sb;
    float rel_lat = -brx * sb + bry * cb;

    if (act == kDash) {
      float power = clampf(arg1[i], p.min_power, p.max_power);
      float ddir = normalize_angle(deg2rad(clampf(arg2[i], -p.max_moment, p.max_moment)));
      bool back = power < 0.0f;
      float eff_dir = back ? normalize_angle(ddir + kPi) : ddir;
      float need = back ? 2.0f * std::fabs(power) : power;
      float avail = std::min(need, stamina);
      float power_mag = back ? avail * 0.5f : avail;
      float amag = power_mag * p.dash_power_rate * effort * dir_rate(p, eff_dir);
      float aang = body + eff_dir;
      p_accel[i][0] = amag * std::cos(aang);
      p_accel[i][1] = amag * std::sin(aang);
      clamp_norm(p_accel[i], p.player_accel_max);
      stamina_used[i] = avail;
    } else if (act == kTurn) {
      float moment = deg2rad(clampf(arg1[i], -p.max_moment, p.max_moment));
      float speed = std::sqrt(vx * vx + vy * vy);
      new_body[i] = normalize_angle(body + moment / (1.0f + p.inertia_moment * speed));
    } else if (act == kKick) {
      if (kickable) {
        float power = clampf(arg1[i], 0.0f, p.max_power);
        float kdir = deg2rad(clampf(arg2[i], -p.max_moment, p.max_moment));
        float rel = normalize_angle(ball_dir_global - body);
        float margin = clampf((ball_dist - p.player_size - p.ball_size) / p.kickable_margin,
                              0.0f, 1.0f);
        float rate = p.kick_power_rate *
                     (1.0f - 0.25f * std::fabs(rel) / kPi - 0.25f * margin);
        float eff = power * rate;
        float kang = new_body[i] + kdir;
        float kx = eff * std::cos(kang), ky = eff * std::sin(kang);
        if (noise_scale != 0.0f) {
          // rcssserver kick noise: polar-uniform, max radius
          // kick_rand * power / max_power (mirror of physics.py)
          float maxrnd = noise_scale * p.kick_rand * power / p.max_power;
          float nr = rand01(rng_state) * maxrnd;
          float nth = rand_pm1(rng_state) * kPi;
          kx += nr * std::cos(nth);
          ky += nr * std::sin(nth);
        }
        ball_accel[0] += kx;
        ball_accel[1] += ky;
        touched[i] = true;
      }
    } else if (act == kTackle) {
      // Probabilistic tackle: every command is an attempt (freeze either
      // way); the ball is accelerated only on success.
      float tdeg = clampf(arg1[i], -p.max_moment, p.max_moment);
      float fail_p = tackle_fail_prob(p, rel_fwd, rel_lat);
      float u = noise_scale != 0.0f ? rand01(rng_state) : 0.5f;
      new_frozen[i] = p.tackle_cycles;
      if (u < 1.0f - fail_p) {
        float eff = (p.max_back_tackle_power +
                     (p.max_tackle_power - p.max_back_tackle_power) *
                         (1.0f - std::fabs(tdeg) / 180.0f)) *
                    p.tackle_power_rate;
        float tang = body + deg2rad(tdeg);
        ball_accel[0] += eff * std::cos(tang);
        ball_accel[1] += eff * std::sin(tang);
        touched[i] = true;
      }
    } else if (act == kCatch) {
      // Catch rectangle along the commanded direction + catch_probability.
      bool is_goalie = cfg.defense_goalie && i == cfg.n_offense;
      if (is_goalie) {
        float cang = deg2rad(clampf(arg1[i], -p.max_moment, p.max_moment));
        float cc = std::cos(cang), sc = std::sin(cang);
        float cf = rel_fwd * cc + rel_lat * sc;
        float cl = -rel_fwd * sc + rel_lat * cc;
        bool in_rect = cf >= 0.0f && cf <= p.catchable_area_l &&
                       std::fabs(cl) <= p.catchable_area_w * 0.5f;
        float u = noise_scale != 0.0f ? rand01(rng_state) : 0.5f;
        if (in_rect && u < p.catch_probability) caught = true;
      }
    }
  }

  // Movement
  clamp_norm(ball_accel, p.ball_accel_max);
  float new_pos[11][2], new_vel[11][2];
  for (int i = 0; i < P; ++i) {
    float* pl = st->players + i * kPlayerStride;
    new_vel[i][0] = pl[2] + p_accel[i][0];
    new_vel[i][1] = pl[3] + p_accel[i][1];
    clamp_norm(new_vel[i], p.player_speed_max);
    if (noise_scale != 0.0f) {
      float nx = rand_pm1(rng_state), ny = rand_pm1(rng_state);
      float sp = std::sqrt(new_vel[i][0] * new_vel[i][0] + new_vel[i][1] * new_vel[i][1]);
      new_vel[i][0] += noise_scale * p.player_rand * sp * nx;
      new_vel[i][1] += noise_scale * p.player_rand * sp * ny;
    }
    new_pos[i][0] = pl[0] + new_vel[i][0];
    new_pos[i][1] = pl[1] + new_vel[i][1];
    new_vel[i][0] *= p.player_decay;
    new_vel[i][1] *= p.player_decay;
  }
  float nb_vel[2] = {st->ball_vel[0] + ball_accel[0], st->ball_vel[1] + ball_accel[1]};
  clamp_norm(nb_vel, p.ball_speed_max);
  if (noise_scale != 0.0f) {
    float nx = rand_pm1(rng_state), ny = rand_pm1(rng_state);
    float sp = std::sqrt(nb_vel[0] * nb_vel[0] + nb_vel[1] * nb_vel[1]);
    nb_vel[0] += noise_scale * p.ball_rand * sp * nx;
    nb_vel[1] += noise_scale * p.ball_rand * sp * ny;
  }
  float nb_pos[2] = {st->ball_pos[0] + nb_vel[0], st->ball_pos[1] + nb_vel[1]};
  nb_vel[0] *= p.ball_decay;
  nb_vel[1] *= p.ball_decay;

  // Player-player collisions: single pass, both back off by half the
  // overlap, collided velocities scaled by -0.1 (mirror of physics.py;
  // displacements accumulate against pre-resolution positions).
  if (P > 1) {
    float disp[11][2] = {};
    bool p_coll[11] = {};
    for (int i = 0; i < P; ++i) {
      for (int j = 0; j < P; ++j) {
        if (j == i) continue;
        float dx = new_pos[i][0] - new_pos[j][0];
        float dy = new_pos[i][1] - new_pos[j][1];
        float d = std::sqrt(dx * dx + dy * dy);
        if (d < 2.0f * p.player_size) {
          float dmax = std::max(d, 1e-6f);
          float push = 0.5f * (2.0f * p.player_size - d);
          disp[i][0] += push * dx / dmax;
          disp[i][1] += push * dy / dmax;
          p_coll[i] = true;
        }
      }
    }
    for (int i = 0; i < P; ++i) {
      new_pos[i][0] += disp[i][0];
      new_pos[i][1] += disp[i][1];
      if (p_coll[i]) {
        new_vel[i][0] *= -0.1f;
        new_vel[i][1] *= -0.1f;
      }
    }
  }

  // Ball-player collision: symmetric — ball and the nearest colliding player
  // each back off by half the overlap, both velocities scaled by -0.1.
  float min_sep = p.player_size + p.ball_size;
  int nearest = -1;
  float nearest_d = 1e30f;
  for (int i = 0; i < P; ++i) {
    float dx = nb_pos[0] - new_pos[i][0], dy = nb_pos[1] - new_pos[i][1];
    float d = std::sqrt(dx * dx + dy * dy);
    if (d < min_sep && d < nearest_d) {
      nearest_d = d;
      nearest = i;
    }
  }
  if (nearest >= 0) {
    float dx = nb_pos[0] - new_pos[nearest][0], dy = nb_pos[1] - new_pos[nearest][1];
    float d = std::max(nearest_d, 1e-6f);
    float half_overlap = 0.5f * (min_sep - nearest_d);
    nb_pos[0] += dx / d * half_overlap;
    nb_pos[1] += dy / d * half_overlap;
    nb_vel[0] *= -0.1f;
    nb_vel[1] *= -0.1f;
    new_pos[nearest][0] -= dx / d * half_overlap;
    new_pos[nearest][1] -= dy / d * half_overlap;
    new_vel[nearest][0] *= -0.1f;
    new_vel[nearest][1] *= -0.1f;
  }

  // Toucher tracking (lowest-index toucher wins)
  bool any_touch = false;
  int toucher = 0;
  for (int i = 0; i < P; ++i) {
    if (touched[i]) {
      any_touch = true;
      toucher = i;
      break;
    }
  }
  if (any_touch) {
    st->last_toucher_side = side_of(cfg, toucher);
    st->last_toucher_unum = unum_of(cfg, toucher);
    st->untouched = 0;
  } else {
    st->untouched += 1;
  }

  // Stamina / effort / recovery (rcssserver updateStamina order) + writeback
  for (int i = 0; i < P; ++i) {
    float* pl = st->players + i * kPlayerStride;
    float st0 = pl[5] - stamina_used[i];
    float effort = pl[7];
    if (st0 <= p.effort_dec_thr * p.stamina_max)
      effort = std::max(effort - p.effort_dec, p.effort_min);
    if (st0 >= p.effort_inc_thr * p.stamina_max)
      effort = std::min(effort + p.effort_inc, p.effort_max);
    float recovery = pl[8];
    if (st0 <= p.recover_dec_thr * p.stamina_max)
      recovery = std::max(recovery - p.recover_dec, p.recover_min);
    pl[0] = new_pos[i][0];
    pl[1] = new_pos[i][1];
    pl[2] = new_vel[i][0];
    pl[3] = new_vel[i][1];
    pl[4] = new_body[i];
    pl[5] = clampf(st0 + recovery * p.stamina_inc_max, 0.0f, p.stamina_max);
    pl[6] = static_cast<float>(new_frozen[i]);
    pl[7] = effort;
    pl[8] = recovery;
  }
  st->ball_pos[0] = nb_pos[0];
  st->ball_pos[1] = nb_pos[1];
  st->ball_vel[0] = nb_vel[0];
  st->ball_vel[1] = nb_vel[1];

  // Referee
  float hl = p.pitch_length * 0.5f, hw = p.pitch_width * 0.5f;
  bool goal = nb_pos[0] > hl && std::fabs(nb_pos[1]) < p.goal_width * 0.5f;
  bool oob = nb_pos[0] < 0.0f || std::fabs(nb_pos[1]) > hw || (nb_pos[0] > hl && !goal);
  bool def_kickable = false;
  for (int i = 0; i < P; ++i) {
    if (side_of(cfg, i) == 1) {
      float dx = nb_pos[0] - new_pos[i][0], dy = nb_pos[1] - new_pos[i][1];
      if (std::sqrt(dx * dx + dy * dy) <= karea) def_kickable = true;
    }
  }
  bool captured = caught || def_kickable;
  st->t += 1;
  bool out_of_time = st->t >= p.frames_per_trial || st->untouched >= p.untouched_time;
  st->status = goal ? kGoal
               : captured ? kCapturedByDefense
               : oob ? kOutOfBounds
               : out_of_time ? kOutOfTime
                             : kInGame;
}

void core_observe(const CoreParams* pp, const CoreGameConfig* cfgp,
                  const CoreState* st, int32_t a, float* out) {
  const CoreParams& p = *pp;
  const CoreGameConfig& cfg = *cfgp;
  const int P = cfg.n_players;
  const float* pl = st->players + a * kPlayerStride;
  float px = pl[0], py = pl[1], vx = pl[2], vy = pl[3];
  float body = pl[4];
  float speed = std::sqrt(vx * vx + vy * vy);
  float vel_ang = normalize_angle(std::atan2(vy, vx) - body);

  float brx = st->ball_pos[0] - px, bry = st->ball_pos[1] - py;
  float ball_dist = std::sqrt(brx * brx + bry * bry);
  bool kickable = ball_dist <= kickable_area(p);
  bool coll_ball = ball_dist < (p.player_size + p.ball_size) * 1.05f;
  bool coll_player = false;
  for (int i = 0; i < P; ++i) {
    if (i == a) continue;
    float dx = st->players[i * kPlayerStride] - px;
    float dy = st->players[i * kPlayerStride + 1] - py;
    if (std::sqrt(dx * dx + dy * dy) < 2.0f * p.player_size * 1.05f)
      coll_player = true;
  }

  int k = 0;
  out[k++] = 1.0f;
  out[k++] = 1.0f;
  out[k++] = std::sin(vel_ang);
  out[k++] = std::cos(vel_ang);
  out[k++] = -1.0f + 2.0f * std::min(speed, p.player_speed_max) / p.player_speed_max;
  out[k++] = std::sin(body);
  out[k++] = std::cos(body);
  out[k++] = -1.0f + 2.0f * pl[5] / p.stamina_max;
  out[k++] = flagf(pl[6] > 0.0f);
  out[k++] = flagf(coll_ball);
  out[k++] = flagf(coll_player);
  out[k++] = -1.0f;
  out[k++] = flagf(kickable);

  // 13-45: the 11 landmarks of HFO's published low-level set (manual
  // order; mirror of features.py landmarks())
  float hl = p.pitch_length * 0.5f, hw = p.pitch_width * 0.5f;
  float pbx = hl - p.penalty_area_length, pbw = p.penalty_area_width;
  const float lm[11][2] = {
      {hl, 0.0f},                    // goal center
      {hl, -p.goal_width * 0.5f},    // goal post top
      {hl, p.goal_width * 0.5f},     // goal post bottom
      {pbx, 0.0f},                   // penalty box center
      {pbx, -pbw * 0.5f},            // penalty box top
      {pbx, pbw * 0.5f},             // penalty box bottom
      {0.0f, 0.0f},                  // center field
      {0.0f, -hw},                   // corner top left
      {hl, -hw},                     // corner top right
      {hl, hw},                      // corner bottom right
      {0.0f, hw},                    // corner bottom left
  };
  for (int j = 0; j < 11; ++j) {
    float dx = lm[j][0] - px, dy = lm[j][1] - py;
    float d = std::sqrt(dx * dx + dy * dy);
    float ang = normalize_angle(std::atan2(dy, dx) - body);
    out[k++] = std::sin(ang);
    out[k++] = std::cos(ang);
    out[k++] = prox(p, d);
  }

  // 46-49: OOB distances (left, right, top, bottom)
  out[k++] = -1.0f + 2.0f * clampf(px / hl, 0.0f, 1.0f);
  out[k++] = -1.0f + 2.0f * clampf((hl - px) / hl, 0.0f, 1.0f);
  out[k++] = -1.0f + 2.0f * clampf((py + hw) / (2.0f * hw), 0.0f, 1.0f);
  out[k++] = -1.0f + 2.0f * clampf((hw - py) / (2.0f * hw), 0.0f, 1.0f);

  float ball_ang = normalize_angle(std::atan2(bry, brx) - body);
  float bsp = std::sqrt(st->ball_vel[0] * st->ball_vel[0] +
                        st->ball_vel[1] * st->ball_vel[1]);
  float bva = normalize_angle(std::atan2(st->ball_vel[1], st->ball_vel[0]) - body);
  out[k++] = 1.0f;
  out[k++] = std::sin(ball_ang);
  out[k++] = std::cos(ball_ang);
  out[k++] = prox(p, ball_dist);
  out[k++] = 1.0f;
  out[k++] = -1.0f + 2.0f * std::min(bsp, p.ball_speed_max) / p.ball_speed_max;
  out[k++] = std::sin(bva);
  out[k++] = std::cos(bva);
  out[k++] = 1.0f;

  if (P > 1) {
    int order[11];
    int n = 0;
    int my_side = side_of(cfg, a);
    for (int i = 0; i < P; ++i)
      if (i != a && side_of(cfg, i) == my_side) order[n++] = i;
    for (int i = 0; i < P; ++i)
      if (i != a && side_of(cfg, i) != my_side) order[n++] = i;
    for (int j = 0; j < n; ++j) {
      const float* o = st->players + order[j] * kPlayerStride;
      float dx = o[0] - px, dy = o[1] - py;
      float d = std::sqrt(dx * dx + dy * dy);
      float ang = normalize_angle(std::atan2(dy, dx) - body);
      float osp = std::sqrt(o[2] * o[2] + o[3] * o[3]);
      float ova = normalize_angle(std::atan2(o[3], o[2]) - body);
      float orel_body = normalize_angle(o[4] - body);
      out[k++] = std::sin(ang);
      out[k++] = std::cos(ang);
      out[k++] = prox(p, d);
      out[k++] = std::sin(orel_body);
      out[k++] = std::cos(orel_body);
      out[k++] = -1.0f + 2.0f * std::min(osp, p.player_speed_max) / p.player_speed_max;
      out[k++] = std::sin(ova);
      out[k++] = std::cos(ova);
      out[k++] = static_cast<float>(unum_of(cfg, order[j]));  // raw (HFO quirk)
    }
  }
}

namespace {
inline float signed_acos(float s, float c) {
  float ang = std::acos(clampf(c, -1.0f, 1.0f));
  return s < 0.0f ? -ang : ang;
}

inline float ball_dist_goal_of(const float* obs) {
  float ball_dist = 1.0f - obs[53];
  float goal_dist = 1.0f - obs[15];
  float ball_ang = signed_acos(obs[51], obs[52]);
  float goal_ang = signed_acos(obs[13], obs[14]);
  float alpha = std::max(ball_ang, goal_ang) - std::min(ball_ang, goal_ang);
  float v = ball_dist * ball_dist + goal_dist * goal_dist -
            2.0f * ball_dist * goal_dist * std::cos(alpha);
  return std::sqrt(std::max(v, 0.0f));
}
}  // namespace

void core_initial_shaping(CoreShaping* sh, const float* obs,
                          int32_t toucher_unum, int32_t toucher_side) {
  sh->old_ball_prox = obs[53];
  sh->old_kickable = obs[12];
  sh->old_ball_dist_goal = ball_dist_goal_of(obs);
  sh->got_kickable = 0;
  sh->pass_active = (obs[54] > 0.0f && obs[55] > -0.5f) ? 1 : 0;
  sh->old_toucher_unum = toucher_unum;
  sh->old_toucher_side = toucher_side;
  sh->first_step = 0;
}

void core_reward(const CoreShaping* in, CoreShaping* out_sh, const float* obs,
                 int32_t status, int32_t toucher_unum, int32_t toucher_side,
                 int32_t our_unum, float* out5) {
  bool episode_over = status != kInGame;
  float ball_prox = obs[53];
  float kickable = obs[12];
  float bdg = ball_dist_goal_of(obs);

  bool pass_active = in->pass_active || (obs[54] > 0.0f && obs[55] > -0.5f);

  bool suppress = in->first_step || episode_over;
  float bpd = suppress ? 0.0f : ball_prox - in->old_ball_prox;
  float kd = suppress ? 0.0f : kickable - in->old_kickable;
  float bdgd = suppress ? 0.0f : bdg - in->old_ball_dist_goal;

  int old_pob = in->old_toucher_unum;
  int pob = toucher_unum;

  float mtb = (pob < 0 || pob == our_unum) ? bpd : 0.0f;
  bool kick_bonus = kd >= 1.0f && !in->got_kickable;
  if (kick_bonus) mtb += 1.0f;
  bool got_kickable = in->got_kickable || kd >= 1.0f;

  float ktg = pob == our_unum ? -bdgd : (got_kickable ? 0.2f * -bdgd : 0.0f);

  bool pass_fire = pass_active && pob > 0 && pob != old_pob;
  float pass_r = pass_fire ? 1.0f : 0.0f;
  if (pass_fire) pass_active = false;

  float eot = status == kGoal ? (pob == our_unum ? 5.0f : 1.0f) : 0.0f;

  out5[0] = mtb + 3.0f * ktg + eot;
  out5[1] = mtb;
  out5[2] = 3.0f * ktg;
  out5[3] = eot;
  out5[4] = pass_r;

  out_sh->old_ball_prox = ball_prox;
  out_sh->old_kickable = kickable;
  out_sh->old_ball_dist_goal = bdg;
  out_sh->got_kickable = got_kickable ? 1 : 0;
  out_sh->pass_active = pass_active ? 1 : 0;
  out_sh->old_toucher_unum = pob;
  out_sh->old_toucher_side = toucher_side;
  out_sh->first_step = 0;
}

namespace {

constexpr float kRad2Deg = 180.0f / kPi;
constexpr float kArriveRadius = 0.5f;    // mirror of npc.ARRIVE_RADIUS
constexpr float kFaceThreshold = 0.1f * kPi;

// Locomotion primitive shared by the agent2d-flavored policies
// (mirror of env/npc.py _goto).
inline void npc_goto(float px, float py, float body, float tx, float ty,
                     float ball_rel_ang, int32_t* act, float* arg1,
                     float* arg2) {
  float ex = tx - px, ey = ty - py;
  float dist = std::sqrt(ex * ex + ey * ey);
  float rel = normalize_angle(std::atan2(ey, ex) - body);
  if (dist <= kArriveRadius) {
    if (std::fabs(ball_rel_ang) > kFaceThreshold) {
      *act = kTurn;
      *arg1 = ball_rel_ang * kRad2Deg;
    } else {
      *act = kNoop;
      *arg1 = 0.0f;
    }
    *arg2 = 0.0f;
  } else {
    *act = kDash;
    *arg1 = 100.0f;
    *arg2 = rel * kRad2Deg;
  }
}

}  // namespace

void core_npc_action(const CoreParams* pp, const CoreGameConfig* cfgp,
                     const CoreState* st, int32_t player_idx, int32_t policy,
                     int32_t is_goalie, int32_t* act, float* arg1,
                     float* arg2) {
  *act = kNoop;
  *arg1 = 0.0f;
  *arg2 = 0.0f;
  if (policy == kNpcDummy) return;  // dummies NOOP forever

  const CoreParams& p = *pp;
  const CoreGameConfig& cfg = *cfgp;
  const float* pl = st->players + player_idx * kPlayerStride;
  float px = pl[0], py = pl[1], body = pl[4];
  float relx = st->ball_pos[0] - px, rely = st->ball_pos[1] - py;
  float dist = std::sqrt(relx * relx + rely * rely);
  float rel_ang = normalize_angle(std::atan2(rely, relx) - body);
  float goal_x = p.pitch_length * 0.5f, goal_y = 0.0f;
  // ball position ~3 cycles ahead (mirror of npc._ball_prediction)
  float horizon = 1.0f + p.ball_decay + p.ball_decay * p.ball_decay;
  float pred_x = st->ball_pos[0] + st->ball_vel[0] * horizon;
  float pred_y = st->ball_pos[1] + st->ball_vel[1] * horizon;

  if (policy == kNpcChaser) {
    // Mirror of env/npc.py chaser_action (chaser.cxx:41-52 semantics): the
    // reference chaser's high-level angles are normalized by pi, so its
    // |ball_ang - orientation| > .1 threshold is 0.1*pi radians here.
    bool can_catch = is_goalie && dist <= p.catchable_area_l;
    bool misaligned = std::fabs(rel_ang) > 0.1f * kPi;
    if (can_catch) {
      // CATCH arg1 = catch direction (deg, body-relative): aim at the ball.
      *act = kCatch;
      *arg1 = rel_ang * kRad2Deg;
    } else if (misaligned) {
      *act = kTurn;
      *arg1 = 90.0f * (rel_ang / kPi);
    } else {
      *act = kDash;
      *arg1 = 100.0f;
    }
    return;
  }

  if (policy == kNpcAgent2dDefender) {
    // Mirror of env/npc.py agent2d_defender_action.
    float pgx = pred_x - goal_x, pgy = pred_y - goal_y;
    float pg_dist = std::sqrt(pgx * pgx + pgy * pgy);
    float inv = 1.0f / std::max(pg_dist, 1e-6f);
    float home_x, home_y, chase_r;
    if (is_goalie) {
      // Shot-stopping: stand on the ball's predicted crossing point at the
      // goal mouth when it is driven goalward (mirror of npc.py).
      float bvx = st->ball_vel[0];
      if (bvx > 0.3f) {
        float y_cross = st->ball_pos[1] +
                        st->ball_vel[1] / std::max(bvx, 1e-6f) *
                            (goal_x - st->ball_pos[0]);
        y_cross = clampf(y_cross, -p.goal_width * 0.5f, p.goal_width * 0.5f);
        home_x = goal_x - 1.0f;
        home_y = y_cross;
      } else {
        float r = std::min(pg_dist * 0.3f, 5.0f);
        home_x = goal_x + pgx * inv * r;
        home_y = goal_y + pgy * inv * r;
      }
      chase_r = 2.5f;
    } else {
      home_x = goal_x + pgx * 0.65f;
      home_y = goal_y + pgy * 0.65f;
      chase_r = 8.0f;
    }
    float tx = dist < chase_r ? pred_x : home_x;
    float ty = dist < chase_r ? pred_y : home_y;
    npc_goto(px, py, body, tx, ty, rel_ang, act, arg1, arg2);
    if (is_goalie && dist <= p.catchable_area_l) {
      *act = kCatch;
      *arg1 = rel_ang * kRad2Deg;
      *arg2 = 0.0f;
    }
    return;
  }

  if (policy == kNpcAgent2dTeammate) {
    // Mirror of env/npc.py agent2d_teammate_action.
    bool kickable = dist <= kickable_area(p);
    if (kickable) {
      float tgx = goal_x - px, tgy = goal_y - py;
      float goal_dist = std::sqrt(tgx * tgx + tgy * tgy);
      float goal_ang = normalize_angle(std::atan2(tgy, tgx) - body);
      // nearest offense mate
      float best_d = 1e30f, mate_ang = 0.0f;
      for (int i = 0; i < cfg.n_offense; ++i) {
        if (i == player_idx) continue;
        const float* o = st->players + i * kPlayerStride;
        float dx = o[0] - px, dy = o[1] - py;
        float d = std::sqrt(dx * dx + dy * dy);
        if (d < best_d) {
          best_d = d;
          mate_ang = normalize_angle(std::atan2(dy, dx) - body);
        }
      }
      bool shoot = goal_dist < 20.0f;
      *act = kKick;
      *arg1 = shoot ? 100.0f : std::min(100.0f, 20.0f + 4.0f * best_d);
      *arg2 = (shoot ? goal_ang : mate_ang) * kRad2Deg;
      return;
    }
    float bgx = goal_x - st->ball_pos[0], bgy = goal_y - st->ball_pos[1];
    float bg_dist = std::sqrt(bgx * bgx + bgy * bgy);
    float inv = 1.0f / std::max(bg_dist, 1e-6f);
    float ux = bgx * inv, uy = bgy * inv;
    float perp_x = -uy, perp_y = ux;
    float side = py >= st->ball_pos[1] ? 1.0f : -1.0f;
    float sup_x = st->ball_pos[0] + ux * 6.0f + perp_x * 8.0f * side;
    float sup_y = st->ball_pos[1] + uy * 6.0f + perp_y * 8.0f * side;
    float tx = dist < 8.0f ? pred_x : sup_x;
    float ty = dist < 8.0f ? pred_y : sup_y;
    npc_goto(px, py, body, tx, ty, rel_ang, act, arg1, arg2);
    return;
  }
}

}  // extern "C"
