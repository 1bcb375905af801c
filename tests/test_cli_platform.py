"""--platform backend-override flag (cli.py _apply_platform_override) —
the reference's device-selection flag role (DEFINE_bool(gpu, ...),
/root/reference/src/dqn_main.cpp:18,208-210)."""

import jax

from dqn_hfo_tpu.cli import _apply_platform_override


def test_platform_flag_is_stripped_space_form():
    argv = ["--save", "x", "--platform", "cpu", "--envs", "4"]
    out = _apply_platform_override(argv)
    assert out == ["--save", "x", "--envs", "4"]
    # conftest already pins the cpu backend; the override must agree
    assert jax.default_backend() == "cpu"


def test_platform_flag_is_stripped_eq_form():
    out = _apply_platform_override(["--platform=cpu", "--seed", "3"])
    assert out == ["--seed", "3"]


def test_platform_auto_is_noop():
    out = _apply_platform_override(["--platform", "auto", "--seed", "3"])
    assert out == ["--seed", "3"]


def test_no_platform_flag_passthrough():
    argv = ["--seed", "3"]
    assert _apply_platform_override(argv) == ["--seed", "3"]
