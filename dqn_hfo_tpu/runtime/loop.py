"""Host-side training orchestration — the reference's KeepPlayingGames loop
(/root/reference/src/dqn_main.cpp:206-382), re-architected for a batched
on-device actor-learner.

The reference interleaves, per agent thread: play one episode -> run
int(steps * update_ratio) updates -> evaluate every evaluate_freq actor
iters -> HiScore snapshot on a new best -> periodic snapshot.  Here the unit
of work is a rollout *chunk* (E envs x K steps in one jitted scan); the
updates-per-env-step ratio, epsilon-by-iteration schedule, evaluation
cadence, HiScore selection, and auto-resume contract are preserved.
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu import spaces as sp_mod
from dqn_hfo_tpu.constants import DEFAULT_PARAMS, ServerParams
from dqn_hfo_tpu.env.hfo_env import HFOEnv, VecHFOEnv
from dqn_hfo_tpu.env.state import EnvConfig
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.collector import init_collector, rollout_chunk
from dqn_hfo_tpu.learner.ddpg import DDPGConfig, init_learner, update_n
from dqn_hfo_tpu.runtime import checkpoint as ckpt
from dqn_hfo_tpu.runtime.config import RunConfig
from dqn_hfo_tpu.runtime.evaluate import Evaluator
from dqn_hfo_tpu.runtime.metrics import MetricsLogger

import dataclasses


def defense_policies(cfg: RunConfig) -> tuple:
    """Per-defender policy list, goalie-capable slots first.

    Order mirrors the reference's client launch (dqn_main.cpp:427-436):
    chasers (first one is the goalie), agent2d NPCs (`--defense-npcs` are
    HFO's agent2d base-team bots — env/npc.py agent2d_defender_action),
    dummy goalies, then defense_agents slots — which the reference never
    attaches a learner thread to (main(), dqn_main.cpp:421-426), so they
    stand idle (dummies) while still widening the 50+9*P state."""
    return (("chaser",) * cfg.defense_chasers
            + ("agent2d",) * cfg.defense_npcs
            + ("dummy",) * cfg.defense_dummies
            + ("dummy",) * cfg.defense_agents)


def offense_policies(cfg: RunConfig) -> tuple:
    """Offense NPC slots: `--offense-npcs` are agent2d attackers (move,
    receive, shoot/pass — env/npc.py agent2d_teammate_action);
    `--offense-dummies` NOOP forever (dummy_teammate.cxx)."""
    return (("agent2d",) * cfg.offense_npcs
            + ("dummy",) * cfg.offense_dummies)


def make_env_config(cfg: RunConfig) -> EnvConfig:
    n_defense = cfg.total_defense_npcs + cfg.defense_agents
    return EnvConfig(
        offense_agents=cfg.offense_agents,
        offense_npcs=cfg.total_offense_npcs,
        defense_npcs=n_defense,
        defense_goalie=n_defense > 0,
        ball_x_min=cfg.ball_x_min,
        ball_x_max=cfg.ball_x_max,
        offense_on_ball=cfg.offense_on_ball,
        center_field_mark=cfg.center_field_mark,
        oob_feature_norm=cfg.oob_feature_norm,
        player_block_variant=cfg.player_block_variant,
    )


def make_server_params(cfg: RunConfig) -> ServerParams:
    return dataclasses.replace(
        DEFAULT_PARAMS,
        frames_per_trial=cfg.frames_per_trial,
        untouched_time=cfg.untouched_time,
    )


class Trainer:
    def __init__(self, cfg: RunConfig):
        self.cfg = cfg
        # Multi-host: only the coordinator writes the metrics jsonl (all
        # processes share cfg.save on a common filesystem; N writers would
        # interleave/clobber).  Console lines still print everywhere.
        self.log = MetricsLogger(
            cfg.save if jax.process_index() == 0 else "")
        env_cfg = make_env_config(cfg)
        sp = make_server_params(cfg)
        self.env = HFOEnv(env_cfg, sp, noise_scale=cfg.noise_scale,
                          npc_policy=defense_policies(cfg),
                          offense_policy=offense_policies(cfg))
        self.venv = VecHFOEnv(self.env, cfg.envs)
        self.state_size = env_cfg.state_size
        self.compute_dtype = jnp.bfloat16 if cfg.bf16 else None

        self.space = sp_mod.SPACES[cfg.action_space]
        self.dcfg = DDPGConfig(
            state_size=self.state_size,
            minibatch=cfg.minibatch,
            action_space=cfg.action_space,
            gamma=cfg.gamma,
            tau=cfg.tau,
            soft_update_freq=cfg.soft_update_freq,
            beta=cfg.beta,
            actor_lr=cfg.actor_lr,
            critic_lr=cfg.critic_lr,
            momentum=cfg.momentum,
            momentum2=cfg.momentum2,
            clip_grad=cfg.clip_grad,
            solver=cfg.solver,
            lr_policy=cfg.lr_policy,
            lr_gamma=cfg.lr_gamma,
            lr_power=cfg.lr_power,
            lr_stepsize=cfg.lr_stepsize,
            max_iter=cfg.max_iter,
            memory_threshold=cfg.memory_threshold,
            compute_dtype=self.compute_dtype,
            actor_tower=cfg.tower("actor"),
            critic_tower=cfg.tower("critic"),
        )

        key = jax.random.PRNGKey(cfg.seed)
        k_learn, k_coll, self._eval_key = jax.random.split(key, 3)
        self.n_agents = cfg.offense_agents
        self.updates_per_chunk = int(cfg.envs * cfg.chunk_len *
                                     cfg.update_ratio)
        # Data-parallel mesh routing (--mesh_devices; 0 = auto over all
        # local devices).  The reference binary runs its whole topology in
        # one process (dqn_main.cpp:388-442); here the same CLI invocation
        # becomes an SPMD program over the 'data' axis when >1 device.
        # Auto engages only when envs and the minibatch divide the device
        # count (a config shaped for the mesh); an explicit --mesh_devices N
        # asserts instead.
        n_dev = jax.device_count()  # global: spans hosts under jax.distributed
        if cfg.mesh_devices > 0:
            n_mesh = cfg.mesh_devices
        elif cfg.benchmark or cfg.learn_offline:
            # single-device modes (DQN::Benchmark / learn_offline are
            # sequential-update measurements, dqn.cpp:487-498,
            # dqn_main.cpp:340-349): never auto-engage the DP mesh — an
            # explicit --mesh_devices > 1 still aborts in those modes.
            n_mesh = 1
        elif (n_dev > 1 and cfg.envs % n_dev == 0
              and self.dcfg.minibatch % n_dev == 0):
            n_mesh = n_dev
        else:
            n_mesh = 1
        self.use_dp = n_mesh > 1
        if jax.process_count() > 1:
            self.log.info(
                f"jax.distributed: process_count = {jax.process_count()}, "
                f"process_index = {jax.process_index()}, "
                f"global devices = {n_dev}")
        if self.use_dp:
            self.log.info(f"Data-parallel mesh over {n_mesh} devices")
        self.dp = None
        if self.use_dp:
            self._init_dp(n_mesh, k_learn, k_coll)
        elif self.n_agents == 1:
            self.learner = init_learner(k_learn, self.dcfg)
            self.replay = rp.init_replay(
                cfg.memory, cfg.envs, self.state_size,
                action_size=self.space.output_size)
            self.collector = init_collector(self.venv, k_coll, cfg.chunk_len)
            _roll_raw = functools.partial(
                rollout_chunk, venv=self.venv, chunk_len=cfg.chunk_len,
                gamma=cfg.gamma, compute_dtype=self.compute_dtype,
                space=self.space,
            )
            _upd_raw = functools.partial(
                update_n, cfg=self.dcfg,
                max_updates=max(self.updates_per_chunk, 1),
            )
            self._roll = jax.jit(_roll_raw, donate_argnums=(0, 1))
            self._update = jax.jit(_upd_raw, donate_argnums=(0,))
            _upd_fn = lambda ls, rs, n: _upd_raw(ls, rs, n_updates=n)
        else:
            # Multi-agent: stacked learners, agent-major replay columns,
            # optional layer sharing / shared replay (reference P1-P3).
            from dqn_hfo_tpu.learner.multi import (
                MultiConfig, init_multi_collector, init_multi_learner,
                multi_rollout_chunk, multi_update_n)
            self.mcfg = MultiConfig(
                n_agents=self.n_agents,
                share_actor_layers=cfg.share_actor_layers,
                share_critic_layers=cfg.share_critic_layers,
                share_replay=cfg.share_replay_memory,
                share_mode=cfg.share_mode,
            )
            self.learner = init_multi_learner(k_learn, self.dcfg, self.mcfg)
            self.replay = rp.init_replay(
                cfg.memory, self.n_agents * cfg.envs, self.state_size,
                action_size=self.space.output_size)
            self.collector = init_multi_collector(
                self.venv, k_coll, cfg.chunk_len, self.n_agents)
            _roll_raw = functools.partial(
                multi_rollout_chunk, venv=self.venv, chunk_len=cfg.chunk_len,
                gamma=cfg.gamma, n_agents=self.n_agents,
                compute_dtype=self.compute_dtype, space=self.space)
            _mupd_raw = functools.partial(
                multi_update_n, dcfg=self.dcfg, mcfg=self.mcfg,
                max_updates=max(self.updates_per_chunk, 1),
            )
            self._roll = jax.jit(
                lambda cs, rs, actors, eps: _roll_raw(cs, rs, actors, eps),
                donate_argnums=(0, 1))
            self._update = jax.jit(_mupd_raw, donate_argnums=(0,))
            _upd_fn = lambda ls, rs, n: _mupd_raw(ls, rs, n_updates=n)

        # Fused multi-chunk train step (see runtime/superstep.py): one jitted
        # program per eval/snapshot interval instead of one host round trip
        # per chunk — the dominant cost over the TPU tunnel.
        self.max_chunks = max(1, min(64, math.ceil(
            min(cfg.evaluate_freq, cfg.snapshot_freq, cfg.max_iter)
            / max(self.updates_per_chunk, 1))))
        # Exploration anneal — host-tracked so the adaptive restart rule
        # (_maybe_restart_anneal) can change it between supersteps; both
        # values enter the jitted superstep as runtime scalars (no
        # recompile on change).
        self._explore = cfg.explore
        self._anneal_start = 0
        self._adaptive_best = 0.0
        self._adaptive_stale = 0
        self._adaptive_restarts = 0
        if self.use_dp:
            self._superstep = self.dp.build_superstep(
                self.updates_per_chunk, cfg.epsilon, self.max_chunks)
        else:
            from dqn_hfo_tpu.runtime.superstep import build_superstep
            self._superstep = jax.jit(
                build_superstep(_roll_raw, _upd_fn, self.updates_per_chunk,
                                cfg.epsilon, self.max_chunks),
                donate_argnums=(0, 1, 2))

        eval_env = VecHFOEnv(self.env, cfg.repeat_games)
        self.evaluator = Evaluator(eval_env, cfg.frames_per_trial,
                                   cfg.evaluate_with_epsilon,
                                   self.compute_dtype, self.space,
                                   n_agents=self.n_agents)

        self.episode_count = 0
        self.best_score = -float("inf")
        self._replay_from_host = False
        self._maybe_resume()
        if self.use_dp:
            # restored learner/replay live on the default device; put them
            # into the mesh layout (params replicated, replay sharded)
            self.learner = self.dp.replicate_learner(self.learner)
            if self._replay_from_host:
                self.replay = self.dp.shard_replay(self.replay)

    def _init_dp(self, n_mesh: int, k_learn, k_coll):
        """Build the DataParallel mesh path: sharded collector+replay,
        replicated learner, fused DP superstep (built later in __init__)."""
        cfg = self.cfg
        from dqn_hfo_tpu.parallel.mesh import DataParallel, make_mesh
        if jax.device_count() < n_mesh:
            raise SystemExit(
                f"--mesh_devices {n_mesh} but only "
                f"{jax.device_count()} devices visible")
        mesh = make_mesh(n_mesh)
        mcfg = None
        if self.n_agents == 1:
            self.learner = init_learner(k_learn, self.dcfg)
        else:
            from dqn_hfo_tpu.learner.multi import (MultiConfig,
                                                   init_multi_learner)
            self.mcfg = MultiConfig(
                n_agents=self.n_agents,
                share_actor_layers=cfg.share_actor_layers,
                share_critic_layers=cfg.share_critic_layers,
                share_replay=cfg.share_replay_memory,
                share_mode=cfg.share_mode,
            )
            self.learner = init_multi_learner(k_learn, self.dcfg, self.mcfg)
            mcfg = self.mcfg
        self.dp = DataParallel(
            mesh=mesh, env=self.env, n_envs=cfg.envs,
            chunk_len=cfg.chunk_len, dcfg=self.dcfg, memory=cfg.memory,
            max_updates=max(self.updates_per_chunk, 1), gamma=cfg.gamma,
            compute_dtype=self.compute_dtype, mcfg=mcfg)
        self.collector, self.replay = self.dp.init_state(k_coll)

    def _iter(self) -> int:
        import numpy as _np
        return int(_np.max(_np.asarray(self.learner.iteration)))

    # ------------------------------------------------------------------ util
    def _load_replay_any(self, path: str):
        """Dispatch a replay snapshot path to its loader: our npz, the
        reference's gzip .replaymemory byte format, or a multi-host shard
        set (the stem find_latest_snapshot returns when shard files
        exist)."""
        import os
        if path.endswith(".replaymemory"):
            if os.path.exists(path):
                # reference-format gzip snapshot (dqn.cpp:1180-1226)
                from dqn_hfo_tpu.runtime.replay_io import \
                    load_reference_replay
                return load_reference_replay(
                    path, self.state_size,
                    n_envs=self.n_agents * self.cfg.envs,
                    capacity=self.cfg.memory,
                    action_dim=self.space.output_size)
            return ckpt.load_sharded_replay(path)
        return ckpt.load_replay(path)

    def _maybe_resume(self):
        cfg = self.cfg
        if not (cfg.save or cfg.resume or cfg.actor_snapshot or
                cfg.critic_snapshot or cfg.actor_weights or
                cfg.critic_weights or cfg.memory_snapshot):
            return
        resume_path = cfg.resume or cfg.save
        actor_p, critic_p, mem_p = ("", "", "")
        if resume_path:
            actor_p, critic_p, mem_p = ckpt.find_latest_snapshot(resume_path)
            if actor_p or critic_p or mem_p:
                self.log.info(f"Found Resumable(s): [{resume_path}] "
                              f"{actor_p}, {critic_p}, {mem_p}")
        assert not (cfg.critic_snapshot and cfg.critic_weights), \
            "Give a snapshot or weights but not both."
        assert not (cfg.actor_snapshot and cfg.actor_weights), \
            "Give a snapshot or weights but not both."
        if self.n_agents > 1 and not (actor_p or critic_p):
            # Per-agent comma-separated values (GetArg, dqn_main.cpp:270-286);
            # resumable stacked snapshots (handled below) take priority.
            from dqn_hfo_tpu.runtime.config import get_arg
            restored = False
            for i in range(self.n_agents):
                a_s = get_arg(cfg.actor_snapshot, i)
                c_s = get_arg(cfg.critic_snapshot, i)
                a_w = get_arg(cfg.actor_weights, i)
                c_w = get_arg(cfg.critic_weights, i)
                if a_s or c_s or a_w or c_w:
                    self.learner = ckpt.restore_learner_agent(
                        self.learner, i, a_s, c_s, a_w, c_w)
                    restored = True
            if restored:
                from dqn_hfo_tpu.learner.multi import _broadcast_shared
                self.learner = _broadcast_shared(self.learner, self.mcfg)
                self.log.info(
                    f"Restored per-agent learners at iter {self._iter()}")
            if mem_p or cfg.memory_snapshot:
                self.replay = self._load_replay_any(
                    mem_p or cfg.memory_snapshot)
                self._replay_from_host = True
                self.log.info(
                    f"replay_mem_size = {int(rp.valid_count(self.replay))}")
            if resume_path:
                self.best_score = max(self.best_score,
                                      ckpt.find_hi_score(resume_path))
            return
        actor_p = actor_p or cfg.actor_snapshot
        critic_p = critic_p or cfg.critic_snapshot
        mem_p = mem_p or cfg.memory_snapshot
        if actor_p or critic_p or cfg.actor_weights or cfg.critic_weights:
            self.learner = ckpt.restore_learner(
                self.learner, actor_p, critic_p,
                cfg.actor_weights, cfg.critic_weights,
            )
            self.log.info(f"Restored learner at iter {self._iter()}")
        if mem_p:
            self.replay = self._load_replay_any(mem_p)
            self._replay_from_host = True
            self.log.info(
                f"replay_mem_size = {int(rp.valid_count(self.replay))}")
        if resume_path:
            self.best_score = max(self.best_score,
                                  ckpt.find_hi_score(resume_path))

    def _snapshot(self, prefix=None, remove_old=None, snapshot_memory=None):
        cfg = self.cfg
        if not cfg.save:
            return
        snap_mem = (cfg.snapshot_memory if snapshot_memory is None
                    else snapshot_memory)
        rm_old = (cfg.remove_old_snapshots if remove_old is None
                  else remove_old)
        if self.use_dp and jax.process_count() > 1:
            # Multi-host: each process writes its addressable replay
            # columns as one shard file (no cross-host gather); the
            # coordinator alone writes the learner files and GCs old
            # snapshots.  The reference always snapshots the replay
            # (dqn.cpp:1146-1226); the shard set is its multi-host form.
            it = self._iter()
            if snap_mem:
                payload = self.dp.local_replay_shards(self.replay)
                ckpt.snapshot_replay_shards(
                    prefix or cfg.save, it, payload,
                    jax.process_index(), jax.process_count())
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("snapshot_shards_written")
            if jax.process_index() == 0:
                paths = ckpt.snapshot(
                    prefix or cfg.save, self.learner, None,
                    snapshot_memory=False, remove_old=rm_old)
                if snap_mem:
                    # Marker written LAST: certifies shards (barrier above)
                    # + learner files; resume skips unmarked partial sets
                    # (ckpt.mark_snapshot_complete docstring).
                    ckpt.mark_snapshot_complete(prefix or cfg.save, it)
                self.log.info(f"Snapshotting Finished! ({paths[0]})")
            return
        replay = self.replay
        if self.use_dp:
            replay = self.dp.canonical_replay(self.replay)
        paths = ckpt.snapshot(
            prefix or cfg.save, self.learner,
            replay,
            snapshot_memory=snap_mem,
            remove_old=rm_old,
        )
        self.log.info(f"Snapshotting Finished! ({paths[0]})")

    def _maybe_restart_anneal(self, score: float, it: int) -> bool:
        """Adaptive exploration (--explore_adaptive_threshold): the round-4
        plateau probe showed the sub-0.5 agent2d seeds are exploration-
        commitment artifacts — more exploration fixes them — while more
        exploration from the START delays seeds that did not need it
        (round-5 explore-40k table: seed 4 fell 0.94 -> 0.58).  The
        adaptive rule restarts the epsilon anneal (epsilon back to 1.0,
        annealing over --explore iters from the current iteration) only on
        a detected STAGNATION: the anneal has finished, the best
        evaluation so far sits below the threshold, and no evaluation has
        improved it by >= 0.05 for --explore_adaptive_stale consecutive
        evals.  Restart count capped by --explore_adaptive_max_restarts.
        Host values only — the superstep takes (explore, anneal_start) as
        traced scalars, so a restart costs no recompile."""
        cfg = self.cfg
        thr = cfg.explore_adaptive_threshold
        if thr <= 0:
            return False
        if score > self._adaptive_best + 0.05:
            self._adaptive_best = score
            self._adaptive_stale = 0
            return False
        self._adaptive_stale += 1
        if (self._adaptive_best < thr
                and self._adaptive_stale >= cfg.explore_adaptive_stale
                and it >= self._anneal_start + self._explore
                and self._adaptive_restarts
                < cfg.explore_adaptive_max_restarts):
            self._anneal_start = it
            self._adaptive_stale = 0
            self._adaptive_restarts += 1
            self.log.info(
                f"Adaptive exploration: best goal_perc {self._adaptive_best}"
                f" < {thr} with no improvement for "
                f"{cfg.explore_adaptive_stale} evals; restarting the "
                f"epsilon anneal at iter {it} "
                f"(restart {self._adaptive_restarts}/"
                f"{cfg.explore_adaptive_max_restarts})")
            return True
        return False

    # ----------------------------------------------------------------- modes
    def _check_finite(self, um):
        """Run-aborting finite guard — the reference CHECKs every target and
        loss finite (dqn.cpp:893-906); a diverged run crashes fast instead of
        burning the remaining max_iter."""
        if not bool(um["finite"]):
            self.log.info("FATAL: non-finite target or critic loss "
                          "detected; aborting (dqn.cpp:893-906 CHECK).")
            raise FloatingPointError(
                "Non-finite target/loss in learner update")

    def _consume_rows(self, rows: dict, dt: float):
        """Replay one superstep's per-chunk metric rows: finite guard, then
        episode / smoothed-loss lines at the same cadence the per-chunk loop
        emitted them, and one throughput line for the whole superstep."""
        cfg = self.cfg
        active = np.asarray(rows["active"])
        idxs = np.nonzero(active)[0]
        if not bool(np.all(np.asarray(rows["u_finite"])[idxs])):
            self._check_finite({"finite": False})
        for r in idxs:
            n_eps = int(rows["episodes"][r])
            if n_eps > 0:
                # per-agent episode reward lines (the reference logs one per
                # agent thread, dqn_main.cpp:355-356)
                rets = np.atleast_1d(np.asarray(rows["sum_episode_return"][r]))
                self.episode_count += n_eps
                for a in range(rets.shape[0]):
                    self.log.episode(
                        self.episode_count, float(rets[a]) / n_eps,
                        agent=a if rets.shape[0] > 1 else None)
            # Smoothed critic-loss / avg-Q every loss_display_iter learner
            # iterations (dqn.cpp:806-817): accumulate update-weighted sums
            # and emit when the counter crosses the display boundary.
            n_up = int(rows["u_updates"][r])
            if n_up > 0:
                self._loss_sum += float(rows["u_critic_loss"][r]) * n_up
                self._q_sum += float(rows["u_avg_q"][r]) * n_up
                self._loss_n += n_up
            it = int(rows["iter"][r])
            if (it >= self._last_loss_iter + cfg.loss_display_iter
                    and self._loss_n > 0):
                self.log.critic_loss(it, self._loss_sum / self._loss_n)
                self.log.actor_q(it, self._q_sum / self._loss_n)
                self._loss_sum, self._q_sum, self._loss_n = 0.0, 0.0, 0
                self._last_loss_iter = it
        self.log.throughput(
            int(np.sum(np.asarray(rows["env_steps"])[idxs])),
            int(np.sum(np.asarray(rows["u_updates"])[idxs])), dt,
            passes=int(np.sum(np.asarray(rows["passes"])[idxs])))

    def train(self):
        cfg = self.cfg
        last_eval_iter = self._iter()
        last_snapshot_iter = self._iter()
        self._last_loss_iter = self._iter()
        self._loss_sum, self._q_sum, self._loss_n = 0.0, 0.0, 0
        u = max(self.updates_per_chunk, 1)
        step_idx = 0
        while self._iter() < cfg.max_iter:
            step_idx += 1
            # One-shot profiler capture of a steady-state superstep (SURVEY
            # §5: jax.profiler replaces the reference's caffe::Timer tracing).
            profiling = bool(cfg.profile_dir) and step_idx == 2
            if profiling:
                jax.profiler.start_trace(cfg.profile_dir)
            it = self._iter()
            next_boundary = min(last_eval_iter + cfg.evaluate_freq,
                                last_snapshot_iter + cfg.snapshot_freq,
                                cfg.max_iter)
            n_active = max(1, min(self.max_chunks,
                                  math.ceil((next_boundary - it) / u)))
            t0 = time.time()
            self.learner, self.collector, self.replay, rows = \
                self._superstep(self.learner, self.collector, self.replay,
                                jnp.asarray(n_active, jnp.int32),
                                jnp.asarray(self._explore, jnp.int32),
                                jnp.asarray(self._anneal_start, jnp.int32))
            # ONE blocking fetch for the whole superstep's metric rows.
            rows = jax.tree_util.tree_map(np.asarray, rows)
            if profiling:
                jax.profiler.stop_trace()
                self.log.info(f"Profiler trace written to {cfg.profile_dir}")
            self._consume_rows(rows, time.time() - t0)
            it = self._iter()

            if it >= last_eval_iter + cfg.evaluate_freq:
                self._eval_key, k = jax.random.split(self._eval_key)
                em = self.evaluator(
                    self.learner.actor, k,
                    critic_params=self.learner.critic if cfg.verbose
                    else None)
                self._log_q_trace(em.pop("q_trace", None))
                self.log.evaluation(it, em)
                # additional Evaluation line per extra agent (reference logs
                # one per thread; reward stats are the per-agent ones)
                for a, pa in enumerate(em.get("per_agent", [])[1:], start=1):
                    em_a = {k: v for k, v in em.items() if k != "per_agent"}
                    em_a.update(pa)
                    self.log.evaluation(it, em_a, agent=a)
                if cfg.record_dir:
                    self._record(it)
                score = em["goal_perc"]
                self._maybe_restart_anneal(score, it)
                if score > self.best_score and cfg.save:
                    self.log.info(
                        f"New High Score: {score}, actor_iter = {it}, "
                        f"critic_iter = {it}")
                    self.best_score = score
                    if jax.process_index() == 0:
                        ckpt.remove_files_matching(cfg.save + r"_HiScore.*")
                    self._snapshot(prefix=f"{cfg.save}_HiScore{score}",
                                   remove_old=False, snapshot_memory=False)
                last_eval_iter = it
            if it >= last_snapshot_iter + cfg.snapshot_freq:
                self._snapshot()
                last_snapshot_iter = it
        self._snapshot()

    def _log_q_trace(self, qt):
        """--verbose eval: per-step action/Q lines of eval env 0 — the
        VLOG(1) trace of the reference's live loop (dqn_main.cpp:124-128)."""
        if qt is None:
            return
        from dqn_hfo_tpu.runtime.record import ACTION_NAMES
        acts, qs = qt
        for t in range(acts.shape[0]):
            for a in range(acts.shape[1]):
                self.log.q_trace(
                    t, ACTION_NAMES.get(int(acts[t, a]), str(int(acts[t, a]))),
                    float(qs[t, a]))

    def _record(self, it: int):
        """Record + render one greedy episode (record.sh analogue)."""
        if jax.process_index() != 0:
            return  # multi-host: identical episode; one writer
        import os
        from dqn_hfo_tpu.runtime.record import record_episode, render_gif
        os.makedirs(self.cfg.record_dir, exist_ok=True)
        actor = self.learner.actor
        critic = self.learner.critic
        if self.n_agents > 1:
            actor = jax.tree_util.tree_map(lambda x: x[0], actor)
            critic = jax.tree_util.tree_map(lambda x: x[0], critic)
        self._eval_key, k = jax.random.split(self._eval_key)
        base = os.path.join(self.cfg.record_dir, f"episode_iter{it}")
        traj = record_episode(self.env, actor, k,
                              epsilon=self.cfg.evaluate_with_epsilon,
                              space=self.space, save_path=base + ".npz",
                              critic_params=critic,
                              logger=self.log if self.cfg.verbose else None)
        render_gif(traj, self.env.sp, base + ".gif",
                   n_offense=self.env.cfg.n_offense)
        self.log.info(f"Recorded episode to {base}.gif")

    def evaluate_mode(self):
        self._eval_key, k = jax.random.split(self._eval_key)
        em = self.evaluator(
            self.learner.actor, k,
            critic_params=self.learner.critic if self.cfg.verbose else None)
        self._log_q_trace(em.pop("q_trace", None))
        self.log.evaluation(self._iter(), em)
        return em

    def benchmark(self, iterations: int = 1000):
        """--benchmark: one rollout chunk, then time `iterations` updates
        (DQN::Benchmark, dqn.cpp:487-498)."""
        if self.use_dp:
            raise SystemExit("--benchmark runs single-device; "
                             "pass --mesh_devices 1")
        eps = jnp.asarray(1.0)
        self.collector, self.replay, _ = self._roll(
            self.collector, self.replay, self.learner.actor, eps)
        self.collector, self.replay, _ = self._roll(
            self.collector, self.replay, self.learner.actor, eps)
        upd = jax.jit(functools.partial(update_n, cfg=self.dcfg,
                                        max_updates=iterations))
        # warmup/compile
        self.learner, _ = upd(self.learner, self.replay,
                              n_updates=jnp.asarray(1, jnp.int32))
        jax.block_until_ready(self.learner.actor)
        t0 = time.time()
        self.learner, um = upd(self.learner, self.replay,
                               n_updates=jnp.asarray(iterations, jnp.int32))
        jax.block_until_ready(self.learner.actor)
        ms = (time.time() - t0) * 1000.0 / iterations
        self.log.info(f"Average Update: {ms} ms.", avg_update_ms=ms)
        return ms

    def learn_offline(self):
        """--learn_offline: updates on a fixed replay (dqn_main.cpp:340-349)."""
        if self.use_dp:
            raise SystemExit("--learn_offline runs single-device; "
                             "pass --mesh_devices 1")
        cfg = self.cfg
        while self._iter() < cfg.max_iter:
            self.learner, um = self._update(
                self.learner, self.replay,
                n_updates=jnp.asarray(self.updates_per_chunk, jnp.int32))
            self._check_finite(um)
            if int(um["updates"]) == 0:
                self.log.info("Replay below memory_threshold; stopping.")
                break
            it = self._iter()
            self.log.critic_loss(it, float(um["critic_loss"]))
            self.log.actor_q(it, float(um["avg_q"]))
        self._snapshot()


def run(cfg: RunConfig):
    if not cfg.save and not cfg.evaluate and not cfg.benchmark:
        raise SystemExit("Save path (or evaluate/benchmark) required but not set.")
    trainer = Trainer(cfg)
    if cfg.evaluate:
        return trainer.evaluate_mode()
    if cfg.benchmark:
        return trainer.benchmark()
    if cfg.learn_offline:
        return trainer.learn_offline()
    return trainer.train()
