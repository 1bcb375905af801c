#!/usr/bin/env python
"""DP scaling harness (BASELINE config 5): throughput of the sharded
rollout+update step as the data mesh grows.

On a TPU pod slice, run one process per host with jax.distributed
configured (parallel/distributed.py); each mesh size uses the first N
devices.  On a dev box, `--virtual 8` simulates the mesh on CPU threads
(validates sharding/collectives; the throughput numbers are not meaningful
for scaling claims there).

Prints one JSON line per mesh size:
  {"devices": n, "env_steps_per_s": ..., "scaling_vs_1": ...}
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="simulate N CPU devices (dev only)")
    ap.add_argument("--envs-per-device", type=int, default=512)
    ap.add_argument("--chunk-len", type=int, default=100)
    ap.add_argument("--updates", type=int, default=64)
    ap.add_argument("--frames-per-trial", type=int, default=100)
    args = ap.parse_args()

    if args.virtual:
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
        from dqn_hfo_tpu.parallel.distributed import maybe_initialize
        maybe_initialize()

    import dataclasses

    import jax.numpy as jnp

    from dqn_hfo_tpu.constants import DEFAULT_PARAMS
    from dqn_hfo_tpu.env.hfo_env import HFOEnv
    from dqn_hfo_tpu.env.state import EnvConfig
    from dqn_hfo_tpu.learner.ddpg import DDPGConfig, init_learner
    from dqn_hfo_tpu.parallel.mesh import DataParallel, make_mesh

    sp = dataclasses.replace(DEFAULT_PARAMS,
                             frames_per_trial=args.frames_per_trial,
                             untouched_time=args.frames_per_trial)
    env = HFOEnv(EnvConfig(), sp, noise_scale=1.0)
    n_dev_total = len(jax.devices())
    base = None
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev_total]
    for n in sizes:
        mesh = make_mesh(n)
        dcfg = DDPGConfig(state_size=59, memory_threshold=1,
                          minibatch=max(32, n))
        dp = DataParallel(
            mesh=mesh, env=env, n_envs=args.envs_per_device * n,
            chunk_len=args.chunk_len, dcfg=dcfg,
            memory=65536 * n, max_updates=args.updates, gamma=0.99,
        )
        ls = dp.replicate_learner(init_learner(jax.random.PRNGKey(0), dcfg))
        cs, rs = dp.init_state(jax.random.PRNGKey(1))
        # warmup/compile
        ls, cs, rs, m, um = dp.train_step(ls, cs, rs, 1.0, args.updates)
        jax.block_until_ready(m["env_steps"])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            ls, cs, rs, m, um = dp.train_step(ls, cs, rs, 1.0, args.updates)
        jax.block_until_ready(m["env_steps"])
        dt = (time.perf_counter() - t0) / reps
        sps = args.envs_per_device * n * args.chunk_len / dt
        if base is None:
            base = sps
        print(json.dumps({
            "devices": n,
            "env_steps_per_s": round(sps),
            "scaling_vs_1": round(sps / base, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
