#!/usr/bin/env python
"""NPC difficulty ladder: scripted-striker goal%% against each defender type.

The reference's 1v1 difficulty is set by HFO's real agent2d keeper (HiScore
0.8 at 5.9M iters, /root/reference/scripts/train.sh:79-80); this harness
locates the in-graph stand-ins (env/npc.py) on a common scale by playing a
FIXED benchmark striker (scripted_striker_action: dash-to-ball, shoot inside
the near post) against every defender type and reporting outcome rates.

  python scripts/calibrate_npcs.py --episodes 512 [--cpu]

Prints one JSON line per rung and writes results/npc_ladder.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=512)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (leave the TPU free)")
    ap.add_argument("--out", default="results/npc_ladder.json")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dqn_hfo_tpu import constants as C
    from dqn_hfo_tpu.constants import DEFAULT_PARAMS
    from dqn_hfo_tpu.env.hfo_env import HFOEnv, VecHFOEnv
    from dqn_hfo_tpu.env.npc import scripted_striker_action
    from dqn_hfo_tpu.env.state import EnvConfig

    sp = DEFAULT_PARAMS

    def run(defender):
        if defender is None:
            cfg = EnvConfig()
            env = HFOEnv(cfg, sp, noise_scale=args.noise)
        else:
            cfg = EnvConfig(defense_npcs=1, defense_goalie=True)
            env = HFOEnv(cfg, sp, noise_scale=args.noise,
                         npc_policy=defender)
        venv = VecHFOEnv(env, args.episodes)

        def episode(key):
            states, obs = venv.reset(key)

            def step_fn(carry, _):
                states, obs = carry
                act, a1, a2 = jax.vmap(scripted_striker_action)(obs[:, 0, :])
                states, obs, _ = venv.step_absorb(
                    states, act[:, None], a1[:, None], a2[:, None])
                return (states, obs), None

            (states, obs), _ = jax.lax.scan(
                step_fn, (states, obs), None, length=sp.frames_per_trial)
            return states.status, states.t

        status, steps = jax.jit(episode)(jax.random.PRNGKey(17))
        status = np.asarray(status)
        steps = np.asarray(steps)
        goals = status == C.GOAL
        return {
            "defender": defender or "none (1v0)",
            "episodes": int(args.episodes),
            "goal_perc": round(float(np.mean(goals)), 4),
            "captured_perc": round(
                float(np.mean(status == C.CAPTURED_BY_DEFENSE)), 4),
            "oob_perc": round(float(np.mean(status == C.OUT_OF_BOUNDS)), 4),
            "oot_perc": round(float(np.mean(status == C.OUT_OF_TIME)), 4),
            "avg_steps_to_goal": (round(float(np.mean(steps[goals])), 1)
                                  if goals.any() else None),
        }

    rows = [run(d) for d in (None, "dummy", "chaser", "agent2d")]
    for r in rows:
        print(json.dumps(r), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"noise_scale": args.noise, "striker":
                   "scripted_striker_action", "ladder": rows}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
