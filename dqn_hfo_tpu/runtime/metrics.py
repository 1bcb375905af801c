"""Metrics / logging: the reference's glog lines as the stable text format,
plus structured jsonl records for tooling.

The reference's observability bus is its log-line format, consumed by regex
in scripts/save.sh:44-59 (episode reward, smoothed critic loss / avg-Q every
loss_display_iter, and the evaluation line with avg_reward/reward_std/
avg_steps/steps_std/success_steps/success_std/goal_perc).  Those exact field
names are reproduced so downstream tooling ports unchanged; every record is
also emitted as one JSON line to {save}_metrics.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, save_prefix: str = "", tid: int = 0, stream=None):
        self.tid = tid
        self.stream = stream or sys.stdout
        self.jsonl = None
        if save_prefix:
            parent = os.path.dirname(save_prefix)
            if parent:
                os.makedirs(parent, exist_ok=True)
            self.jsonl = open(f"{save_prefix}_metrics.jsonl", "a")
        self._t0 = time.time()

    def _emit(self, text: str, record: dict, tid=None):
        ts = time.strftime("%H:%M:%S")
        tid = self.tid if tid is None else tid
        print(f"I {ts} [Agent{tid}] {text}", file=self.stream, flush=True)
        if self.jsonl is not None:
            record = {"t": round(time.time() - self._t0, 3), **record}
            self.jsonl.write(json.dumps(record) + "\n")
            self.jsonl.flush()

    def episode(self, episode: int, reward: float, agent=None):
        # dqn_main.cpp:355-356 (one line per agent thread)
        rec = {"kind": "episode", "episode": episode, "reward": reward}
        if agent is not None:
            rec["agent"] = agent
        self._emit(f"Episode {episode} reward = {reward}", rec, tid=agent)

    def critic_loss(self, iteration: int, loss: float):
        # smoothed-every-loss_display_iter emission (dqn.cpp:806-810)
        self._emit(f"Critic Iteration {iteration}, loss = {loss}",
                   {"kind": "critic", "iter": iteration, "loss": loss})

    def actor_q(self, iteration: int, avg_q: float):
        # dqn.cpp:812-816
        self._emit(f"Actor Iteration {iteration}, avg_q_value = {avg_q}",
                   {"kind": "actor", "iter": iteration, "avg_q": avg_q})

    def evaluation(self, actor_iter: int, m: dict, agent=None):
        # dqn_main.cpp:194-202 (per agent thread; per_agent reward stats
        # land in the jsonl record, agent>0 also get their own line)
        self._emit(
            "Evaluation: "
            f"actor_iter = {actor_iter}, "
            f"avg_reward = {m['avg_reward']}, "
            f"reward_std = {m['reward_std']}, "
            f"avg_steps = {m['avg_steps']}, "
            f"steps_std = {m['steps_std']}, "
            f"success_steps = {m['success_steps']}, "
            f"success_std = {m['success_std']}, "
            f"goal_perc = {m['goal_perc']}",
            {"kind": "eval", "actor_iter": actor_iter,
             **({"agent": agent} if agent is not None else {}), **m},
            tid=agent,
        )

    def q_trace(self, step: int, action: str, q: float):
        # per-step action/Q trace (VLOG(1), dqn_main.cpp:124-128)
        self._emit(f"q_value: {q} Step: {step}, action: {action}",
                   {"kind": "q_trace", "step": step, "action": action,
                    "q": q})

    def info(self, text: str, **record):
        self._emit(text, {"kind": "info", "msg": text, **record})

    def throughput(self, env_steps: int, updates: int, seconds: float,
                   passes=None):
        sps = env_steps / max(seconds, 1e-9)
        rec = {"kind": "throughput", "env_steps": env_steps,
               "updates": updates, "seconds": seconds, "steps_per_s": sps}
        if passes is not None:
            rec["passes"] = passes
        self._emit(
            f"Throughput: {sps:,.0f} env-steps/s ({env_steps} steps, "
            f"{updates} updates in {seconds:.2f}s)", rec,
        )
