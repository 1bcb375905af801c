"""Command-line entry point: `python -m dqn_hfo_tpu.cli [--flags]`.

The driver-binary role of the reference's ./dqn (dqn_main.cpp:388-442), with
the same flag names (runtime/config.py).  Modes: train (default),
--evaluate, --benchmark, --learn_offline.
"""

from __future__ import annotations

import os
import sys


def _enable_compile_cache():
    """Persistent XLA compile cache: over the TPU tunnel the fused-superstep
    compile costs minutes; repeat runs of the same config (multi-seed sweeps,
    resume-after-restart) should pay it once."""
    try:
        import jax
        cache = os.environ.get(
            "DQN_HFO_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    _enable_compile_cache()
    from dqn_hfo_tpu.parallel.distributed import maybe_initialize
    maybe_initialize()  # no-op unless multi-host env vars are present
    from dqn_hfo_tpu.runtime.config import parse_args
    from dqn_hfo_tpu.runtime.loop import run
    cfg = parse_args(argv)
    return run(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
