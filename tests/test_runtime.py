"""Tests for config, checkpoint/resume, evaluator, and the CLI loop."""

import json
import os

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqn_hfo_tpu.constants import DEFAULT_PARAMS
from dqn_hfo_tpu.env.hfo_env import HFOEnv, VecHFOEnv
from dqn_hfo_tpu.env.state import EnvConfig
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.ddpg import DDPGConfig, init_learner
from dqn_hfo_tpu.runtime import checkpoint as ckpt
from dqn_hfo_tpu.runtime.config import RunConfig, parse_args
from dqn_hfo_tpu.runtime.evaluate import Evaluator
from dqn_hfo_tpu.runtime.loop import Trainer, make_env_config


class TestConfig:
    def test_defaults_match_reference(self):
        c = RunConfig(save="x")
        assert c.tau == 0.001 and c.gamma == 0.99 and c.beta == 0.5
        assert c.memory == 500000 and c.memory_threshold == 1000
        assert c.actor_lr == 1e-5 and c.critic_lr == 1e-3
        assert c.momentum == 0.95 and c.momentum2 == 0.999
        assert c.clip_grad == 10 and c.max_iter == 10_000_000
        assert c.explore == 10000 and c.epsilon == 0.1
        assert c.evaluate_freq == 10000 and c.repeat_games == 100
        assert c.update_ratio == 0.1 and c.snapshot_freq == 10000
        assert c.offense_agents == 1 and c.defense_agents == 0
        assert c.ball_x_min == 0.0 and c.ball_x_max == 0.2

    def test_parse_args(self):
        c = parse_args(["--save", "/tmp/x", "--critic_lr", "0.01",
                        "--no-snapshot_memory", "--envs", "16"])
        assert c.save == "/tmp/x" and c.critic_lr == 0.01
        assert c.snapshot_memory is False and c.envs == 16

    def test_chunk_len_invariant(self):
        with pytest.raises(ValueError):
            RunConfig(save="x", chunk_len=100, frames_per_trial=500)

    def test_minibatch_flag_reaches_learner_config(self, tmp_path):
        """--minibatch (32 = kMinibatchSize parity; >32 = non-parity
        throughput lever) must thread through to the DDPG config."""
        from dqn_hfo_tpu.runtime.loop import Trainer
        c = parse_args(["--save", str(tmp_path / "m"), "--minibatch", "64",
                        "--envs", "4", "--frames_per_trial", "30",
                        "--untouched_time", "20", "--memory", "2000",
                        "--seed", "3"])
        assert c.minibatch == 64
        t = Trainer(c)
        assert t.dcfg.minibatch == 64
        assert RunConfig(save="x").minibatch == 32  # parity default

    def test_env_config_mapping(self):
        c = RunConfig(save="x", offense_agents=2, offense_dummies=1,
                      defense_chasers=1)
        ec = make_env_config(c)
        assert ec.offense_agents == 2 and ec.offense_npcs == 1
        assert ec.defense_npcs == 1 and ec.defense_goalie

    def test_defense_agents_widen_state_and_stand_idle(self):
        """defense_agents adds bodies + 9 state features each (the reference
        counts them in num_players, dqn_main.cpp:223-227, but starts no
        learner thread for them, :421-426)."""
        from dqn_hfo_tpu.runtime.loop import defense_policies
        c = RunConfig(save="x", defense_chasers=1, defense_agents=1)
        ec = make_env_config(c)
        assert ec.defense_npcs == 2 and ec.n_players == 3
        assert ec.state_size == 50 + 9 * 3
        assert defense_policies(c) == ("chaser", "dummy")


class TestMetrics:
    def test_logger_creates_parent_dirs(self, tmp_path):
        # A save prefix under a not-yet-existing directory must work — the
        # reference's glog setup likewise writes under the save path
        # (dqn_main.cpp:406-409) after the caller mkdirs it; here the logger
        # owns that responsibility.
        from dqn_hfo_tpu.runtime.metrics import MetricsLogger
        prefix = str(tmp_path / "sub" / "dir" / "run1")
        log = MetricsLogger(prefix, stream=open(os.devnull, "w"))
        log.episode(0, 1.5)
        with open(prefix + "_metrics.jsonl") as f:
            rec = json.loads(f.readline())
        assert rec["kind"] == "episode" and rec["reward"] == 1.5


class TestAdaptiveExplore:
    """--explore_adaptive_threshold restarts the epsilon anneal when
    evaluation STAGNATES below the threshold after the anneal finished
    (loop._maybe_restart_anneal — the round-4 plateau probe's more-
    exploration mechanism, applied only to seeds that show the plateau)."""

    def _trainer(self, **kw):
        cfg = RunConfig(save="", envs=8, frames_per_trial=16,
                        untouched_time=12, max_iter=2_000_000,
                        explore=20_000, explore_adaptive_stale=3, **kw)
        return Trainer(cfg)

    def test_disabled_by_default(self):
        t = self._trainer()
        for i in range(10):
            assert not t._maybe_restart_anneal(0.0, 50_000 * (i + 1))
        assert t._anneal_start == 0

    def test_restarts_on_stagnation_only(self):
        t = self._trainer(explore_adaptive_threshold=0.70)
        # improving evals never trigger, even below threshold
        assert not t._maybe_restart_anneal(0.10, 51_200)
        assert not t._maybe_restart_anneal(0.20, 102_400)
        assert not t._maybe_restart_anneal(0.30, 153_600)
        # stagnation: 3 non-improving evals with best < 0.70
        assert not t._maybe_restart_anneal(0.30, 204_800)
        assert not t._maybe_restart_anneal(0.28, 256_000)
        assert t._maybe_restart_anneal(0.31, 307_200)
        assert t._anneal_start == 307_200
        # epsilon re-anneals: effective iteration restarts from zero
        from dqn_hfo_tpu.learner.agent import calculate_epsilon
        eff = max(320_000 - t._anneal_start, 0)
        assert float(calculate_epsilon(jnp.asarray(eff), 20_000, 0.1)) > 0.4

    def test_good_seed_never_restarts(self):
        t = self._trainer(explore_adaptive_threshold=0.70)
        # a seed that climbs past the threshold: stale evals after that
        # never trigger (best >= threshold)
        assert not t._maybe_restart_anneal(0.75, 51_200)
        for i in range(8):
            assert not t._maybe_restart_anneal(0.6, 102_400 + 51_200 * i)
        assert t._anneal_start == 0

    def test_restart_cap(self):
        t = self._trainer(explore_adaptive_threshold=0.70,
                          explore_adaptive_max_restarts=1)
        it = 0
        fired = 0
        for i in range(20):
            it += 51_200
            fired += bool(t._maybe_restart_anneal(0.1, it))
        assert fired == 1 and t._adaptive_restarts == 1


class TestCheckpoint:
    def test_snapshot_find_restore_roundtrip(self, tmp_path):
        cfg = DDPGConfig(state_size=8)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        ls = ls._replace(iteration=jnp.asarray(42, jnp.int32))
        rs = rp.init_replay(64, 8, 8)
        prefix = str(tmp_path / "run")
        ckpt.snapshot(prefix, ls, rs)
        a, c, m = ckpt.find_latest_snapshot(prefix)
        assert a.endswith("_actor_iter_42.npz")
        assert c.endswith("_critic_iter_42.npz")
        assert m.endswith("_iter_42.replaymemory.npz")
        ls2 = init_learner(jax.random.PRNGKey(5), cfg)
        ls2 = ckpt.restore_learner(ls2, a, c)
        assert int(ls2.iteration) == 42
        np.testing.assert_array_equal(
            np.asarray(ls.actor["tower"][0]["w"]),
            np.asarray(ls2.actor["tower"][0]["w"]))
        # target nets re-cloned from live (dqn.cpp:541-557)
        np.testing.assert_array_equal(
            np.asarray(ls2.actor_target["tower"][0]["w"]),
            np.asarray(ls2.actor["tower"][0]["w"]))
        rs2 = ckpt.load_replay(m)
        assert rs2.obs.shape == rs.obs.shape

    def test_snapshots_are_inert_npz(self, tmp_path):
        # Round-5 contract: learner snapshots are plain np.savez archives —
        # loadable with allow_pickle=False (no code objects, unlike the
        # rounds-≤4 pickle format), matching the reference's inert
        # .caffemodel/.solverstate artifacts (dqn.cpp:582-620).
        import zipfile
        cfg = DDPGConfig(state_size=8)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        prefix = str(tmp_path / "run")
        paths = ckpt.snapshot(prefix, ls, None, snapshot_memory=False)
        for p in paths:
            assert zipfile.is_zipfile(p)
            d = np.load(p, allow_pickle=False)
            assert any(k.startswith("params:") for k in d.files)
            assert any(k.startswith("opt:") for k in d.files)
            assert "iter" in d.files
        # opt state (Adam moments) survives the flat round trip
        ls2 = ckpt.restore_learner(init_learner(jax.random.PRNGKey(9), cfg),
                                   paths[0], paths[1])
        chex.assert_trees_all_equal(
            jax.tree_util.tree_map(np.asarray, ls.actor_opt),
            jax.tree_util.tree_map(np.asarray, ls2.actor_opt))

    def test_legacy_pickle_snapshot_still_loads(self, tmp_path):
        # Rounds ≤4 wrote pickled dicts under the same .npz names; the
        # read-only legacy loader must keep those runs resumable.
        import pickle
        cfg = DDPGConfig(state_size=8)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
        a_path = str(tmp_path / "old_actor_iter_7.npz")
        c_path = str(tmp_path / "old_critic_iter_7.npz")
        with open(a_path, "wb") as f:
            pickle.dump({"params": to_np(ls.actor), "opt": to_np(ls.actor_opt),
                         "iter": 7, "rng": np.asarray(ls.rng)}, f, protocol=4)
        with open(c_path, "wb") as f:
            pickle.dump({"params": to_np(ls.critic),
                         "opt": to_np(ls.critic_opt), "iter": 7}, f,
                        protocol=4)
        ls2 = ckpt.restore_learner(init_learner(jax.random.PRNGKey(3), cfg),
                                   a_path, c_path)
        assert int(ls2.iteration) == 7
        np.testing.assert_array_equal(
            np.asarray(ls.actor["tower"][0]["w"]),
            np.asarray(ls2.actor["tower"][0]["w"]))

    def test_snapshot_structure_mismatch_is_actionable(self, tmp_path):
        # Restoring into a different architecture must fail with the
        # offending leaf path, not garbage weights.
        cfg = DDPGConfig(state_size=8)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        prefix = str(tmp_path / "run")
        a, c = ckpt.snapshot(prefix, ls, None, snapshot_memory=False)[:2]
        other = init_learner(jax.random.PRNGKey(0),
                             DDPGConfig(state_size=8, actor_tower=(16, 8, 4)))
        with pytest.raises((KeyError, ValueError), match="tower"):
            ckpt.restore_learner(other, a, c)

    def test_remove_old_snapshots(self, tmp_path):
        cfg = DDPGConfig(state_size=8)
        prefix = str(tmp_path / "run")
        for it in (10, 20):
            ls = init_learner(jax.random.PRNGKey(0), cfg)
            ls = ls._replace(iteration=jnp.asarray(it, jnp.int32))
            ckpt.snapshot(prefix, ls, None, snapshot_memory=False,
                          remove_old=True)
        files = os.listdir(tmp_path)
        assert not any("iter_10" in f for f in files)
        assert any("iter_20" in f for f in files)

    def test_hiscore_exempt_from_gc(self, tmp_path):
        cfg = DDPGConfig(state_size=8)
        prefix = str(tmp_path / "run")
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        ls = ls._replace(iteration=jnp.asarray(5, jnp.int32))
        ckpt.snapshot(f"{prefix}_HiScore0.5", ls, None,
                      snapshot_memory=False, remove_old=False)
        ls = ls._replace(iteration=jnp.asarray(30, jnp.int32))
        ckpt.snapshot(prefix, ls, None, snapshot_memory=False,
                      remove_old=True)
        files = os.listdir(tmp_path)
        assert any("HiScore0.5" in f for f in files)
        assert ckpt.find_hi_score(prefix) == pytest.approx(0.5)
        # find_latest must not pick up HiScore files
        a, _, _ = ckpt.find_latest_snapshot(prefix)
        assert "HiScore" not in a


class TestEvaluator:
    def test_eval_runs_exactly_repeat_games(self):
        import dataclasses
        sp = dataclasses.replace(DEFAULT_PARAMS, frames_per_trial=30,
                                 untouched_time=20)
        env = HFOEnv(EnvConfig(), sp, noise_scale=1.0)
        venv = VecHFOEnv(env, 10)
        ev = Evaluator(venv, 30, 0.0)
        cfg = DDPGConfig(state_size=59)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        m = ev(ls.actor, jax.random.PRNGKey(1))
        assert set(m) == {"avg_reward", "reward_std", "avg_steps",
                          "steps_std", "success_steps", "success_std",
                          "goal_perc"}
        assert 0 <= m["goal_perc"] <= 1
        assert m["avg_steps"] <= 30


class TestTrainerLoop:
    def test_short_train_run_and_resume(self, tmp_path):
        prefix = str(tmp_path / "t")
        base = dict(
            save=prefix, envs=4, frames_per_trial=40, untouched_time=25,
            chunk_len=40, evaluate_freq=32, repeat_games=4, memory=2000,
            memory_threshold=50, explore=64, seed=3, snapshot_freq=32,
            loss_display_iter=16,
        )
        cfg = RunConfig(max_iter=40, **base)
        Trainer(cfg).train()
        files = os.listdir(tmp_path)
        assert any("_actor_iter_" in f for f in files)
        assert os.path.exists(prefix + "_metrics.jsonl")
        recs = [json.loads(l) for l in open(prefix + "_metrics.jsonl")]
        kinds = {r["kind"] for r in recs}
        assert {"critic", "actor", "eval", "throughput"} <= kinds

        # resume continues from the snapshot
        cfg2 = RunConfig(max_iter=60, **base)
        t2 = Trainer(cfg2)
        assert int(t2.learner.iteration) > 0
        t2.train()
        assert int(t2.learner.iteration) >= 60

    def test_nan_injection_aborts_run(self, tmp_path):
        """The finite guard must crash the run fast (the reference CHECKs
        every target and loss finite, dqn.cpp:893-906) instead of burning
        max_iter on a diverged learner."""
        cfg = RunConfig(
            save=str(tmp_path / "n"), max_iter=200, envs=4,
            frames_per_trial=40, untouched_time=25, chunk_len=40,
            evaluate_freq=10**9, memory=2000, memory_threshold=50,
            explore=64, seed=3, snapshot_freq=10**9,
        )
        t = Trainer(cfg)
        poisoned = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, jnp.nan), t.learner.critic)
        t.learner = t.learner._replace(critic=poisoned)
        with pytest.raises(FloatingPointError):
            t.train()

    def test_benchmark_mode(self, tmp_path):
        cfg = RunConfig(
            save=str(tmp_path / "b"), benchmark=True, envs=4,
            frames_per_trial=30, untouched_time=20, chunk_len=30,
            memory=2000, memory_threshold=10, seed=3,
        )
        ms = Trainer(cfg).benchmark(iterations=10)
        assert ms > 0


class TestRecord:
    def test_record_and_render(self, tmp_path):
        import dataclasses
        from dqn_hfo_tpu.runtime.record import record_episode, render_gif
        sp = dataclasses.replace(DEFAULT_PARAMS, frames_per_trial=25,
                                 untouched_time=15)
        env = HFOEnv(EnvConfig(), sp, noise_scale=1.0)
        cfg = DDPGConfig(state_size=59)
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        npz = str(tmp_path / "ep.npz")
        traj = record_episode(env, ls.actor, jax.random.PRNGKey(1),
                              epsilon=1.0, save_path=npz)
        assert traj["ball"].ndim == 2 and traj["players"].shape[1] == 1
        assert os.path.exists(npz)
        gif = render_gif(traj, sp, str(tmp_path / "ep.gif"))
        assert os.path.getsize(gif) > 1000


class TestGetArgAndTower:
    def test_get_arg_reference_semantics(self):
        # GetArg (dqn_main.cpp:73-83): token at idx, '' past the end
        from dqn_hfo_tpu.runtime.config import get_arg
        assert get_arg("a.npz,b.npz", 0) == "a.npz"
        assert get_arg("a.npz,b.npz", 1) == "b.npz"
        assert get_arg("a.npz,b.npz", 2) == ""
        assert get_arg("solo.npz", 0) == "solo.npz"
        assert get_arg("solo.npz", 1) == ""
        assert get_arg("", 0) == ""

    def test_tower_flag_parses(self):
        c = parse_args(["--save", "x", "--actor_tower", "64,32",
                        "--critic_tower", "48,24,12"])
        assert c.tower("actor") == (64, 32)
        assert c.tower("critic") == (48, 24, 12)

    def test_tower_override_changes_net_shapes(self):
        cfg = DDPGConfig(state_size=8, actor_tower=(16, 8),
                         critic_tower=(12,))
        ls = init_learner(jax.random.PRNGKey(0), cfg)
        assert ls.actor["tower"][0]["w"].shape == (8, 16)
        assert ls.actor["tower"][1]["w"].shape == (16, 8)
        assert len(ls.critic["tower"]) == 1

    def test_per_agent_snapshot_restore(self, tmp_path):
        # Snapshot two independent single-agent learners, then load them
        # into agent slices of a stacked multi-agent learner.
        from dqn_hfo_tpu.learner.multi import MultiConfig, init_multi_learner
        dcfg = DDPGConfig(state_size=8)
        paths = []
        singles = []
        for i in range(2):
            ls = init_learner(jax.random.PRNGKey(100 + i), dcfg)
            ls = ls._replace(iteration=jnp.asarray(10 + i, jnp.int32))
            prefix = str(tmp_path / f"solo{i}")
            ckpt.snapshot(prefix, ls, None, snapshot_memory=False)
            a, c, _ = ckpt.find_latest_snapshot(prefix)
            paths.append((a, c))
            singles.append(ls)
        mcfg = MultiConfig(n_agents=2)
        mls = init_multi_learner(jax.random.PRNGKey(0), dcfg, mcfg)
        for i in range(2):
            mls = ckpt.restore_learner_agent(mls, i, paths[i][0], paths[i][1])
        for i in range(2):
            got = jax.tree_util.tree_map(lambda x: x[i], mls)
            np.testing.assert_allclose(
                np.asarray(got.actor["tower"][0]["w"]),
                np.asarray(singles[i].actor["tower"][0]["w"]))
            np.testing.assert_allclose(
                np.asarray(got.critic["tower"][0]["w"]),
                np.asarray(singles[i].critic["tower"][0]["w"]))


class TestExpsLauncher:
    def test_grid_parse_and_names(self):
        import sys
        sys.path.insert(0, "scripts")
        import exps
        pts = exps.parse_grid("a=1,2;b=x")
        assert pts == [{"a": "1", "b": "x"}, {"a": "2", "b": "x"}]
        assert exps.run_name({"critic_lr": "1e-3", "beta": "0.5"}) == \
            "beta0.5_critic_lr1e-3"
        assert exps.parse_grid("") == [{}]

    def test_sweep_runs_and_resumes(self, tmp_path):
        import subprocess, sys, json, os
        root = str(tmp_path / "sweep")
        cmd = [sys.executable, "scripts/exps.py", "--save_root", root,
               "--grid", "explore=50",
               "--base", "--envs 4 --max_iter 60 --frames_per_trial 20 "
                         "--untouched_time 16 --chunk_len 20 "
                         "--memory_threshold 50 --evaluate_freq 40 "
                         "--repeat_games 4 --snapshot_freq 1000000 "
                         "--no-snapshot_memory --seed 1"]
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=600)
        assert out.returncode == 0, out.stdout + out.stderr
        recs = [json.loads(l) for l in open(root + "/manifest.jsonl")]
        assert recs and recs[0]["status"] == "done"
        assert recs[0]["n_evals"] >= 1
        # resumable: second invocation skips the completed point
        out2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                              timeout=600)
        assert "[skip]" in out2.stdout
