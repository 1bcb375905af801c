// Reference-format replay-memory codec.
//
// Reads and writes the reference's gzip .replaymemory binary format exactly
// (SnapshotReplayMemory / LoadReplayMemory, /root/reference/src/dqn.cpp:
// 1146-1226): gzip stream of
//   int32 num_transitions
//   per transition:
//     float[state_size] current state   (histories only at episode starts;
//                                        with kStateInputCount==1 none)
//     float[10]         ActorOutput
//     float             reward
//     float             on_policy_target
//     bool(1 byte)      terminal
//
// Lets a user of the reference framework carry their .replaymemory
// snapshots across, and lets this framework emit snapshots the reference
// tooling can read.  C ABI over flat arrays for ctypes binding.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <zlib.h>

extern "C" {

// Returns the number of transitions, or -1 on error. Pass nullptr buffers to
// query the count first.
int32_t replay_load(const char* path, int32_t state_size, int32_t action_dim,
                    int32_t max_transitions, float* states, float* actions,
                    float* rewards, float* targets, uint8_t* terminals) {
  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  int32_t n = 0;
  if (gzread(f, &n, sizeof(int32_t)) != sizeof(int32_t)) {
    gzclose(f);
    return -1;
  }
  if (!states) {  // count query
    gzclose(f);
    return n;
  }
  int32_t count = n < max_transitions ? n : max_transitions;
  for (int32_t i = 0; i < count; ++i) {
    if (gzread(f, states + (int64_t)i * state_size,
               state_size * sizeof(float)) != (int)(state_size * sizeof(float)))
      { gzclose(f); return -1; }
    if (gzread(f, actions + (int64_t)i * action_dim,
               action_dim * sizeof(float)) != (int)(action_dim * sizeof(float)))
      { gzclose(f); return -1; }
    if (gzread(f, rewards + i, sizeof(float)) != sizeof(float))
      { gzclose(f); return -1; }
    if (gzread(f, targets + i, sizeof(float)) != sizeof(float))
      { gzclose(f); return -1; }
    uint8_t term = 0;
    if (gzread(f, &term, 1) != 1) { gzclose(f); return -1; }
    terminals[i] = term;
  }
  gzclose(f);
  return count;
}

// Writes n transitions in the reference format. Returns n or -1 on error.
int32_t replay_save(const char* path, int32_t state_size, int32_t action_dim,
                    int32_t n, const float* states, const float* actions,
                    const float* rewards, const float* targets,
                    const uint8_t* terminals) {
  gzFile f = gzopen(path, "wb");
  if (!f) return -1;
  if (gzwrite(f, &n, sizeof(int32_t)) != sizeof(int32_t)) {
    gzclose(f);
    return -1;
  }
  for (int32_t i = 0; i < n; ++i) {
    if (gzwrite(f, states + (int64_t)i * state_size,
                state_size * sizeof(float)) != (int)(state_size * sizeof(float)))
      { gzclose(f); return -1; }
    if (gzwrite(f, actions + (int64_t)i * action_dim,
                action_dim * sizeof(float)) != (int)(action_dim * sizeof(float)))
      { gzclose(f); return -1; }
    if (gzwrite(f, rewards + i, sizeof(float)) != sizeof(float))
      { gzclose(f); return -1; }
    if (gzwrite(f, targets + i, sizeof(float)) != sizeof(float))
      { gzclose(f); return -1; }
    uint8_t term = terminals[i] ? 1 : 0;
    if (gzwrite(f, &term, 1) != 1) { gzclose(f); return -1; }
  }
  gzclose(f);
  return n;
}

}  // extern "C"
