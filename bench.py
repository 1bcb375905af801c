"""Benchmark: vectorized env throughput (BASELINE.json config 2).

Steps B lockstep 1v0 env instances under one jitted scan — random
parameterized actions through the full pipeline (action decode, physics,
feature encoder, reward shaping, auto-reset) — and reports aggregate
env-steps/s.  Baseline target: 1,000,000 env-steps/s on one host
(BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Secondary metrics (learner update latency) go to stderr.

Usage: python bench.py [--quick] [--envs N] [--steps N]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

try:  # persistent compile cache: repeat runs skip the ~3min XLA compile
    import os as _os
    _cache = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

BASELINE_STEPS_PER_S = 1_000_000.0


def bench_env(n_envs: int, n_steps: int, repeats: int = 3) -> float:
    from dqn_hfo_tpu.constants import DEFAULT_PARAMS
    from dqn_hfo_tpu.env.hfo_env import HFOEnv, VecHFOEnv
    from dqn_hfo_tpu.env.state import EnvConfig
    from dqn_hfo_tpu.learner.agent import decode_action, random_actor_output

    env = HFOEnv(EnvConfig(), DEFAULT_PARAMS, noise_scale=1.0)
    venv = VecHFOEnv(env, n_envs)

    def chunk(states, key):
        # Reset bank generated inside the timed region — auto-reset is part
        # of the pipeline being measured (see VecHFOEnv.step_banked).
        key, k_bank = jax.random.split(key)
        bank = venv.make_reset_bank(k_bank, rounds=8)
        counters = jnp.zeros((n_envs,), jnp.int32)

        def step(carry, _):
            states, counters, key = carry
            key, k = jax.random.split(key)
            out = random_actor_output(k, (n_envs,))
            a, p1, p2, p3 = decode_action(out)
            states, counters, obs, info = venv.step_banked(
                states, counters, bank, a[:, None], p1[:, None],
                p2[:, None], p3[:, None])
            return (states, counters, key), info.reward[:, 0].sum()

        (states, counters, key), rs = jax.lax.scan(
            step, (states, counters, key), None, length=n_steps)
        return states, key, rs.sum()

    chunk = jax.jit(chunk, donate_argnums=(0,))
    key = jax.random.PRNGKey(0)
    states, _ = jax.jit(venv.reset)(key)
    # compile + warmup
    states, key, _ = chunk(states, key)
    jax.block_until_ready(states.ball_pos)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        states, key, s = chunk(states, key)
        jax.block_until_ready(s)
        dt = time.perf_counter() - t0
        best = max(best, n_envs * n_steps / dt)
    return best


def bench_update(iterations: int = 200) -> float:
    """Avg ms per actor-critic update (the reference --benchmark metric,
    dqn.cpp:487-498)."""
    import functools

    from dqn_hfo_tpu.learner import replay as rp
    from dqn_hfo_tpu.learner.agent import random_actor_output
    from dqn_hfo_tpu.learner.ddpg import DDPGConfig, init_learner, update_n

    cfg = DDPGConfig(state_size=59, memory_threshold=1)
    ls = init_learner(jax.random.PRNGKey(0), cfg)
    rs = rp.init_replay(4096, 32, 59)
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, k = jax.random.split(key)
        obs = jax.random.normal(k, (32, 59))
        act = random_actor_output(k, (32,))
        rs, sid = rp.write_step(rs, obs, act, jnp.zeros(32), obs,
                                jnp.ones(32, bool))
        rs = rp.label_rows(rs, jnp.asarray([sid], jnp.int32),
                           jnp.zeros((1, 32)), jnp.ones((1, 32), bool))
    upd = jax.jit(functools.partial(update_n, cfg=cfg,
                                    max_updates=iterations))
    ls, _ = upd(ls, rs, n_updates=jnp.asarray(1, jnp.int32))
    jax.block_until_ready(ls.actor)
    t0 = time.perf_counter()
    ls, _ = upd(ls, rs, n_updates=jnp.asarray(iterations, jnp.int32))
    jax.block_until_ready(ls.actor)
    return (time.perf_counter() - t0) * 1000.0 / iterations


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes (CPU-friendly)")
    ap.add_argument("--envs", type=int, default=0)
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--with-update-bench", action="store_true",
                    help="also time the actor-critic update (extra compile)")
    args = ap.parse_args()

    n_envs = args.envs or (256 if args.quick else 4096)
    n_steps = args.steps or (100 if args.quick else 250)

    sps = bench_env(n_envs, n_steps)
    print(f"# env throughput: {sps:,.0f} env-steps/s "
          f"({n_envs} envs x {n_steps} steps)", file=sys.stderr)
    if args.with_update_bench:
        ms = bench_update(50 if args.quick else 200)
        print(f"# avg actor-critic update: {ms:.3f} ms", file=sys.stderr)

    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(sps),
        "unit": "steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
