"""End-to-end CLI data-parallel test: `cli.py --mesh_devices 8` on the
8-virtual-device CPU mesh, including the auto-resume contract — the
production path the reference binary IS (dqn_main.cpp:388-442)."""

import json
import os
import subprocess
import sys

import pytest


def run_cli(args, tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    # the axon TPU plugin pins jax_platforms; a sitecustomize-free force:
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from dqn_hfo_tpu.cli import main; main()"
    )
    r = subprocess.run(
        [sys.executable, "-c", code] + args,
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


BASE = [
    "--mesh_devices", "8", "--envs", "16", "--frames_per_trial", "16",
    "--untouched_time", "8", "--evaluate_freq", "50", "--snapshot_freq",
    "50", "--repeat_games", "8", "--memory", "2048", "--memory_threshold",
    "32", "--explore", "20", "--seed", "3", "--loss_display_iter", "25",
]


class TestMeshCLI:
    def test_train_then_resume_through_cli(self, tmp_path):
        prefix = str(tmp_path / "dp")

        out = run_cli(["--save", prefix, "--max_iter", "75"] + BASE,
                      tmp_path)
        assert "Data-parallel mesh over 8 devices" in out
        files = os.listdir(tmp_path)
        assert any("_actor_iter_" in f for f in files)
        assert any("_HiScore" in f for f in files)
        recs = [json.loads(l) for l in open(prefix + "_metrics.jsonl")]
        kinds = {r["kind"] for r in recs}
        assert {"eval", "episode", "critic", "throughput"} <= kinds
        it0 = max(r["iter"] for r in recs if r["kind"] == "critic")
        assert it0 >= 75

        # resume: same command, larger max_iter — must pick up the snapshot
        # triple (learner + sharded replay) and continue
        out2 = run_cli(["--save", prefix, "--max_iter", "150"] + BASE,
                       tmp_path)
        assert "Found Resumable(s)" in out2
        assert "replay_mem_size" in out2
        recs2 = [json.loads(l) for l in open(prefix + "_metrics.jsonl")]
        it1 = max(r["iter"] for r in recs2 if r["kind"] == "critic")
        assert it1 >= 150

    def test_multiagent_sharing_through_cli(self, tmp_path):
        prefix = str(tmp_path / "ma")
        out = run_cli(
            ["--save", prefix, "--max_iter", "60", "--offense_agents", "2",
             "--defense_chasers", "1", "--share_actor_layers", "2",
             "--share_critic_layers", "2", "--share_replay_memory"] + BASE,
            tmp_path)
        assert "Data-parallel mesh over 8 devices" in out
        recs = [json.loads(l) for l in open(prefix + "_metrics.jsonl")]
        evals = [r for r in recs if r["kind"] == "eval"]
        assert evals and any(r.get("agent") == 1 for r in evals)


class TestSingleDeviceModes:
    def test_benchmark_and_learn_offline_skip_auto_dp(self, tmp_path):
        """--benchmark / --learn_offline are sequential single-device
        measurements (dqn.cpp:487-498, dqn_main.cpp:340-349): with 8
        devices visible and a mesh-divisible config, auto-DP must NOT
        engage (it used to raise 'pass --mesh_devices 1')."""
        save = os.path.join(str(tmp_path), "bench")
        out = run_cli(["--save", save, "--envs", "16",
                       "--frames_per_trial", "16", "--untouched_time", "8",
                       "--memory", "2048", "--memory_threshold", "32",
                       "--minibatch", "16", "--seed", "3", "--benchmark"],
                      tmp_path)
        assert "Average Update" in out
        assert "Data-parallel mesh" not in out

        # learn_offline needs a replay snapshot: produce one via a tiny
        # train run (benchmark mode doesn't snapshot)
        import glob as g
        save2 = os.path.join(str(tmp_path), "pretrain")
        run_cli(["--save", save2, "--envs", "16", "--frames_per_trial",
                 "16", "--untouched_time", "8", "--memory", "2048",
                 "--memory_threshold", "32", "--max_iter", "30",
                 "--explore", "20", "--evaluate_freq", "1000",
                 "--seed", "3"], tmp_path)
        mem = sorted(g.glob(save2 + "_iter_*.replaymemory.npz"))[-1]
        out = run_cli(["--save", os.path.join(str(tmp_path), "off"),
                       "--envs", "16", "--frames_per_trial", "16",
                       "--untouched_time", "8", "--memory", "2048",
                       "--memory_threshold", "32", "--minibatch", "16",
                       "--max_iter", "40", "--seed", "3",
                       "--learn_offline", "--memory_snapshot", mem],
                      tmp_path)
        assert "Data-parallel mesh" not in out
