"""Command-line entry point: `python -m dqn_hfo_tpu.cli [--flags]`.

The driver-binary role of the reference's ./dqn (dqn_main.cpp:388-442), with
the same flag names (runtime/config.py).  Modes: train (default),
--evaluate, --benchmark, --learn_offline.
"""

from __future__ import annotations

import sys

from dqn_hfo_tpu.runtime.config import parse_args
from dqn_hfo_tpu.runtime.loop import run


def main(argv=None):
    cfg = parse_args(argv)
    return run(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
