"""Real 2-process jax.distributed smoke test (CPU backend, Gloo
collectives): the whole-topology one-command contract of the reference
binary (/root/reference/src/dqn_main.cpp:388-442) under multi-controller
JAX.

Two `python -m dqn_hfo_tpu.cli` processes (4 virtual CPU devices each, one
global 8-device 'data' mesh) train end-to-end, write a sharded replay
snapshot set + coordinator learner snapshot, and a second 2-process
invocation auto-resumes from it — exercising parallel/distributed.py, the
process_count>1 branches of runtime/loop.py, and
checkpoint.snapshot_replay_shards/load_sharded_replay for real.

Marked slow: spawns 4 subprocesses and compiles the superstep twice.
"""

import glob
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_2proc(save, port, extra):
    args = [sys.executable, "-m", "dqn_hfo_tpu.cli", "--save", save,
            "--envs", "16", "--chunk_len", "24", "--frames_per_trial", "24",
            "--untouched_time", "16", "--evaluate_freq", "200",
            "--repeat_games", "8", "--memory", "2048",
            "--memory_threshold", "64", "--mesh_devices", "8",
            "--seed", "5"] + extra
    procs = []
    logs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["DQN_HFO_JAX_CACHE"] = os.path.join(
            os.path.dirname(save), "jax_cache")
        log = open(f"{save}_proc{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(args, stdout=log, stderr=log,
                                      cwd=REPO, env=env))
    rcs = [p.wait(timeout=900) for p in procs]
    for log in logs:
        log.close()
    return rcs


@pytest.mark.slow
def test_2process_train_snapshot_resume(tmp_path):
    save = os.path.join(str(tmp_path), "dist")
    port = free_port()

    rcs = run_2proc(save, port, ["--max_iter", "400"])
    log0 = open(f"{save}_proc0.log").read()
    assert rcs == [0, 0], f"first run failed: {log0[-2000:]}"

    # the sharded replay snapshot set: one shard per process
    shards = glob.glob(save + "_iter_*.replaymemory.shard*-of-002.npz")
    assert len(shards) == 2, f"expected 2 shard files, got {shards}"
    # learner snapshot from the coordinator only
    assert glob.glob(save + "_actor_iter_*.npz")
    # no monolithic replay file (nothing gathered to one host)
    assert not glob.glob(save + "_iter_*.replaymemory.npz")
    # metrics jsonl written once (coordinator), with eval records
    recs = [json.loads(l) for l in open(save + "_metrics.jsonl")]
    iters = [r["actor_iter"] for r in recs if r.get("kind") == "eval"]
    assert iters and max(iters) >= 200

    # second invocation auto-resumes: same command, higher max_iter
    rcs = run_2proc(save, port + 1, ["--max_iter", "800"])
    log0 = open(f"{save}_proc0.log").read()
    assert rcs == [0, 0], f"resume run failed: {log0[-2000:]}"
    assert "Found Resumable" in log0
    assert "process_count = 2" in log0
    # resumed with a non-empty replay (the shard set was restored)
    mem_lines = [l for l in log0.splitlines() if "replay_mem_size" in l]
    assert mem_lines and int(mem_lines[0].split("=")[-1]) > 0
    recs = [json.loads(l) for l in open(save + "_metrics.jsonl")]
    iters = [r["actor_iter"] for r in recs if r.get("kind") == "eval"]
    assert max(iters) >= 600
