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


def _apply_platform_override(argv):
    """`--platform cpu|tpu|auto` — the reference's device-selection flag
    (DEFINE_bool(gpu, ...) + Caffe::set_mode, dqn_main.cpp:18,208-210)
    as a JAX backend override.  Handled here, before any backend
    initialization, because TPU plugins may pin `jax_platforms` and a
    post-init config update is too late.  `auto` (default) keeps JAX's
    own platform discovery.  Useful for CPU-mesh runs on hosts that also
    carry a TPU (pair with
    XLA_FLAGS=--xla_force_host_platform_device_count=N for a virtual
    N-device mesh)."""
    plat = None
    for i, a in enumerate(list(argv)):
        if a == "--platform" and i + 1 < len(argv):
            plat = argv[i + 1]
            del argv[i:i + 2]
            break
        if a.startswith("--platform="):
            plat = a.split("=", 1)[1]
            del argv[i]
            break
    if plat and plat != "auto":
        import jax
        jax.config.update("jax_platforms", plat)
    return argv


def main(argv=None):
    argv = _apply_platform_override(
        list(sys.argv[1:] if argv is None else argv))
    _enable_compile_cache()
    from dqn_hfo_tpu.parallel.distributed import maybe_initialize
    maybe_initialize()  # no-op unless multi-host env vars are present
    from dqn_hfo_tpu.runtime.config import parse_args
    from dqn_hfo_tpu.runtime.loop import run
    cfg = parse_args(argv)
    return run(cfg)


if __name__ == "__main__":
    main()
