"""Run configuration: the reference's complete gflags surface plus
TPU-native batching/distribution knobs.

Flag names and defaults reproduce the reference inventory exactly
(SURVEY.md §2; /root/reference/src/hfo_game.cpp:8-20, dqn.cpp:21-31,
dqn_main.cpp:18-59).  Flags that configured the external server/process
machinery (server_cmd, config_dir, server_addr, gui, team_name,
play_goalie, ...) are retired — the simulator is in-graph; their semantic
payload (frames-per-trial, ball-x window, team topology) is carried by the
physics/env config.  defense_agents adds idle defense bodies that widen the
50+9*P state exactly as in the reference, which never attaches a learner
thread to them (dqn_main.cpp:421-426).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional


@dataclasses.dataclass
class RunConfig:
    # --- Modes (dqn_main.cpp:18-20,43) ---
    benchmark: bool = False
    learn_offline: bool = False
    evaluate: bool = False

    # --- Load/save (dqn_main.cpp:22-28) ---
    save: str = ""
    resume: str = ""
    actor_weights: str = ""
    critic_weights: str = ""
    actor_snapshot: str = ""
    critic_snapshot: str = ""
    memory_snapshot: str = ""

    # --- Solver (dqn_main.cpp:30-37) ---
    solver: str = "Adam"
    momentum: float = 0.95
    momentum2: float = 0.999
    actor_lr: float = 1e-5
    critic_lr: float = 1e-3
    clip_grad: float = 10.0
    lr_policy: str = "fixed"
    # lr_policy knobs — Caffe SolverParameter gamma/power/stepsize, which the
    # reference left at proto defaults (only "fixed" appears in its runs).
    lr_gamma: float = 0.1
    lr_power: float = 0.75
    lr_stepsize: int = 100_000
    max_iter: int = 10_000_000

    # --- Epsilon-greedy (dqn_main.cpp:39-41) ---
    explore: int = 10_000
    epsilon: float = 0.1
    evaluate_with_epsilon: float = 0.0

    # --- Evaluation (dqn_main.cpp:44-45) ---
    evaluate_freq: int = 10_000
    repeat_games: int = 100

    # --- Update coupling / sharing (dqn_main.cpp:47-51) ---
    update_ratio: float = 0.1
    share_actor_layers: int = 0
    share_critic_layers: int = 0
    share_replay_memory: bool = False

    # --- Game topology (dqn_main.cpp:53-59) ---
    offense_agents: int = 1
    offense_npcs: int = 0
    defense_agents: int = 0
    defense_npcs: int = 0
    offense_dummies: int = 0
    defense_dummies: int = 0
    defense_chasers: int = 0

    # --- DQN core (dqn.cpp:21-31) ---
    seed: int = 0
    tau: float = 0.001
    soft_update_freq: int = 1
    gamma: float = 0.99
    memory: int = 500_000
    memory_threshold: int = 1000
    loss_display_iter: int = 1000
    snapshot_freq: int = 10_000
    remove_old_snapshots: bool = True
    snapshot_memory: bool = True
    beta: float = 0.5

    # --- Env / trial (hfo_game.cpp:8,17-19) ---
    ball_x_min: float = 0.0
    ball_x_max: float = 0.2
    offense_on_ball: int = 0
    frames_per_trial: int = 500
    untouched_time: int = 100
    noise_scale: float = 1.0

    # --- Action space: low_level (reference parity) or mid_level macros ---
    action_space: str = "low_level"

    # --- Adaptive exploration (runtime/loop.py _maybe_restart_anneal):
    #     restart the epsilon anneal when evaluation stagnates below the
    #     threshold after the anneal finished (best eval < threshold, no
    #     +0.05 improvement for `stale` consecutive evals).  0 disables
    #     (reference semantics: fixed --explore, dqn_main.cpp:65-71). ---
    explore_adaptive_threshold: float = 0.0
    explore_adaptive_stale: int = 5
    explore_adaptive_max_restarts: int = 3

    # --- Multi-agent layer-sharing update mode (learner/multi.py P3):
    #     "serialized" (default) = the agent-by-agent unroll, exact
    #     reference-order semantics.  "batched" = one vmapped program,
    #     prefix deltas summed per iteration (A-independent cost;
    #     measured learning-weaker at A>=3 and no rate win — see
    #     MultiConfig.share_mode). ---
    share_mode: str = "serialized"

    # --- Encoder variant switches (env/features.py docstring; the three
    #     acknowledged-unverified reconstructions of the HFO client's
    #     low-level encoder, each flippable without a code change) ---
    center_field_mark: str = "pitch_center"   # | "half_field_center"
    oob_feature_norm: str = "linear_clip"     # | "hfo_prox"
    player_block_variant: str = "body_rel_raw_unum"  # | "global_norm_unum"

    # --- Net architecture override (the reference reloads an on-disk
    #     .prototxt if present, dqn_main.cpp:231-246; here: explicit flags) ---
    actor_tower: str = "1024,512,256,128"
    critic_tower: str = "1024,512,256,128"

    # --- TPU-native batching/distribution (new) ---
    # Update minibatch. 32 = reference parity (kMinibatchSize, dqn.hpp:19);
    # larger values are a clearly-non-parity throughput lever for the
    # update-bound coupled train path (see RESULTS.md).
    minibatch: int = 32
    envs: int = 8                 # lockstep env instances
    chunk_len: int = 0            # 0 -> frames_per_trial (window invariant)
    bf16: bool = False            # bfloat16 compute in the nets
    mesh_devices: int = 0         # 0 -> all local devices (data axis)
    profile_dir: str = ""         # capture a jax.profiler trace of one chunk
    record_dir: str = ""          # save + render an episode at each eval
    verbose: bool = False

    def __post_init__(self):
        if self.chunk_len <= 0:
            self.chunk_len = self.frames_per_trial
        if self.chunk_len < self.frames_per_trial:
            raise ValueError(
                "chunk_len must be >= frames_per_trial "
                "(episode-labeling window invariant)"
            )
        if self.seed == 0:
            import time
            self.seed = int(time.time()) & 0x7FFFFFFF
        for flag, allowed in (
                ("share_mode", ("batched", "serialized")),
                ("center_field_mark", ("pitch_center", "half_field_center")),
                ("oob_feature_norm", ("linear_clip", "hfo_prox")),
                ("player_block_variant",
                 ("body_rel_raw_unum", "global_norm_unum"))):
            if getattr(self, flag) not in allowed:
                raise ValueError(
                    f"--{flag} must be one of {allowed}, "
                    f"got {getattr(self, flag)!r}")

    def tower(self, which: str) -> tuple:
        """Parse an {actor,critic}_tower CSV into hidden-layer widths."""
        s = getattr(self, which + "_tower")
        return tuple(int(t) for t in s.split(",") if t.strip())

    @property
    def total_defense_npcs(self) -> int:
        return self.defense_npcs + self.defense_dummies + self.defense_chasers

    @property
    def total_offense_npcs(self) -> int:
        return self.offense_npcs + self.offense_dummies


_BOOL_FIELDS = {
    "benchmark", "learn_offline", "evaluate", "remove_old_snapshots",
    "snapshot_memory", "share_replay_memory", "bf16", "verbose",
}


def get_arg(csv: str, idx: int) -> str:
    """Per-agent comma-separated flag values — GetArg
    (/root/reference/src/dqn_main.cpp:73-83): token at idx, '' past the end.
    """
    toks = csv.split(",") if csv else []
    return toks[idx] if 0 <= idx < len(toks) else ""


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dqn_hfo_tpu",
        description="TPU-native Half Field Offense DDPG trainer",
    )
    for f in dataclasses.fields(RunConfig):
        name = "--" + f.name
        if f.name in _BOOL_FIELDS:
            p.add_argument(name, action=argparse.BooleanOptionalAction,
                           default=f.default)
        else:
            p.add_argument(name, type=type(f.default), default=f.default)
    return p


def parse_args(argv=None) -> RunConfig:
    ns = build_parser().parse_args(argv)
    return RunConfig(**vars(ns))
