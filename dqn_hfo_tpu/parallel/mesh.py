"""Data-parallel training over a device mesh via shard_map + psum.

The TPU-native mapping of the reference's parallelism surface (SURVEY.md §2
P1-P6): agent threads/processes become the sharded env batch axis; the
shared-memory mutex around replay becomes nothing (pure functional state);
gradient aggregation is an XLA pmean over the `data` mesh axis riding ICI.

Layout:
  - Mesh ('data',) over all (or the first N) devices.
  - CollectorState / ReplayState shard their env axis; learner params,
    optimizer state, and scalars are replicated.
  - One dp_train_step = rollout chunk (fully shard-local) + U learner
    iterations whose gradients are pmean'd — a single jitted SPMD program.

Multi-agent composition (reference: thread-per-agent + ShareData/shared
replay, dqn_main.cpp:305-323): pass a MultiConfig and an env whose
offense_agents > 1 — the program becomes stacked per-agent learners
(vmapped when independent, serialized shared-prefix propagation when layer
sharing is on) over the same sharded env axis, so 2v2-with-sharing runs
data-parallel exactly like 1v0.

Multi-host extension: the same code runs under jax.distributed with a global
mesh; all collectives stay in one jit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dqn_hfo_tpu.env.hfo_env import HFOEnv, VecHFOEnv
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.collector import (CollectorState, WindowState,
                                           init_collector, rollout_chunk)
from dqn_hfo_tpu.learner.ddpg import DDPGConfig, LearnerState, update_n
from dqn_hfo_tpu.learner.multi import (MultiConfig, init_multi_collector,
                                       multi_rollout_chunk, multi_update_n)


def make_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    if n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(devs, ("data",))


def collector_specs(cs: CollectorState) -> CollectorState:
    """PartitionSpecs for a CollectorState: env axis -> 'data'.

    Works for both the single-agent collector (obs (E,F), windows (K,E)) and
    the multi-agent one (obs (E,A,F), windows (K,A*E) agent-major within the
    shard) — in each case the leading env axis shards and the per-step window
    column axis is shard-local."""
    env_specs = jax.tree_util.tree_map(lambda _: P("data"), cs.env_states)
    return CollectorState(
        env_states=env_specs,
        obs=P("data"),
        window=WindowState(rewards=P(None, "data"), dones=P(None, "data"),
                           abs_ids=P()),
        ep_return=P("data"),
        rng=P("data"),
    )


def replay_specs() -> rp.ReplayState:
    return rp.ReplayState(
        obs=P(None, "data"),
        action=P(None, "data"),
        reward=P(None, "data"),
        target=P(None, "data"),
        next_obs=P(None, "data"),
        terminal=P(None, "data"),
        valid=P(None, "data"),
        cursor=P(),
    )


@dataclasses.dataclass
class DataParallel:
    """Builds and owns the sharded init + train-step programs.

    With `mcfg` set (n_agents > 1), the learner state is the stacked
    multi-agent LearnerState and the replay's column axis is the shard-local
    agent-major (A, E_shard) grid."""

    mesh: Mesh
    env: HFOEnv
    n_envs: int              # global env count (divisible by mesh size)
    chunk_len: int
    dcfg: DDPGConfig
    memory: int              # global replay capacity
    max_updates: int
    gamma: float = 0.99
    compute_dtype: Any = None
    mcfg: Optional[MultiConfig] = None

    def __post_init__(self):
        n = self.mesh.devices.size
        assert self.n_envs % n == 0, "envs must divide the mesh"
        assert self.dcfg.minibatch % n == 0, "minibatch must divide the mesh"
        if self.mcfg is not None:
            assert self.mcfg.n_agents == self.env.cfg.offense_agents
        self.n_shards = n
        self.env_per_shard = self.n_envs // n
        self.venv_shard = VecHFOEnv(self.env, self.env_per_shard)
        self.n_agents = self.mcfg.n_agents if self.mcfg else 1
        # per-shard learner sees the local minibatch; grads are pmean'd
        self.dcfg_local = dataclasses.replace(
            self.dcfg, minibatch=self.dcfg.minibatch // n)

        # template (abstract) collector state for spec construction
        cs_shape = jax.eval_shape(
            lambda k: self._make_collector(k), jax.random.PRNGKey(0))
        self._cspecs = collector_specs(cs_shape)
        self._rspecs = replay_specs()

        @functools.partial(
            shard_map, mesh=self.mesh, in_specs=(P(),),
            out_specs=(self._cspecs, self._rspecs),
        )
        def _init(key):
            i = jax.lax.axis_index("data")
            k = jax.random.fold_in(key[0], i)
            cs = self._make_collector(k)
            rs = rp.init_replay(self.memory // self.n_shards,
                                self.n_agents * self.env_per_shard,
                                self.dcfg.state_size,
                                action_size=self.dcfg.space.output_size)
            return cs, rs

        self._init_fn = jax.jit(_init)

        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(), self._cspecs, self._rspecs, P(), P()),
            out_specs=(P(), self._cspecs, self._rspecs, P(), P()),
            check_vma=False,
        )
        def _step(ls, cs, rs, eps, n_updates):
            if self.mcfg is None:
                cs, rs, m = rollout_chunk(
                    cs, rs, ls.actor, eps, self.venv_shard, self.chunk_len,
                    self.gamma, self.compute_dtype, self.dcfg.space,
                )
            else:
                cs, rs, m = multi_rollout_chunk(
                    cs, rs, ls.actor, eps, self.venv_shard, self.chunk_len,
                    self.gamma, self.n_agents, self.compute_dtype,
                    self.dcfg.space,
                )
            m = jax.tree_util.tree_map(
                lambda x: jax.lax.psum(x, "data"), m)
            if self.mcfg is None:
                ls, um = update_n(ls, rs, self.dcfg_local, n_updates,
                                  self.max_updates, axis_name="data")
            else:
                ls, um = multi_update_n(ls, rs, self.dcfg_local, self.mcfg,
                                        n_updates, self.max_updates,
                                        axis_name="data")
            return ls, cs, rs, m, um

        self._step_fn = jax.jit(_step, donate_argnums=(0, 1, 2))

    def _make_collector(self, key):
        if self.mcfg is None:
            return init_collector(self.venv_shard, key, self.chunk_len)
        return init_multi_collector(self.venv_shard, key, self.chunk_len,
                                    self.n_agents)

    # ------------------------------------------------------------------ API
    def init_state(self, key):
        """Returns (collector, replay) sharded over the mesh."""
        return self._init_fn(key[None])

    def train_step(self, learner: LearnerState, collector, replay, epsilon,
                   n_updates):
        """One DP chunk: rollout + n_updates pmean'd learner iterations."""
        return self._step_fn(learner, collector, replay,
                             jnp.asarray(epsilon, jnp.float32),
                             jnp.asarray(n_updates, jnp.int32))

    def replicate_learner(self, ls: LearnerState) -> LearnerState:
        sharding = NamedSharding(self.mesh, P())
        return jax.device_put(ls, sharding)

    # ------------------------------------------------------------ superstep
    def build_superstep(self, updates_per_chunk: int,
                        final_epsilon: float, max_chunks: int):
        """Fused multi-chunk DP train step — the runtime/superstep.py program
        inside one shard_map: scan up to max_chunks (rollout + pmean'd
        updates) chunks with the epsilon schedule in-graph, returning the
        same (max_chunks, ...) metric rows schema the host loop consumes.
        `explore` / `anneal_start` are runtime scalars (replicated), as in
        runtime/superstep.py — the adaptive anneal restart needs no
        recompile.
        """
        from dqn_hfo_tpu.learner.agent import calculate_epsilon

        n_up = jnp.asarray(updates_per_chunk, jnp.int32)
        n_shards = self.n_shards

        def one_chunk(carry, explore, anneal_start):
            ls, cs, rs = carry
            eff_iter = jnp.maximum(jnp.max(ls.iteration) - anneal_start, 0)
            eps = calculate_epsilon(eff_iter, explore, final_epsilon)
            if self.mcfg is None:
                cs, rs, m = rollout_chunk(
                    cs, rs, ls.actor, eps, self.venv_shard, self.chunk_len,
                    self.gamma, self.compute_dtype, self.dcfg.space)
                ls, um = update_n(ls, rs, self.dcfg_local, n_up,
                                  self.max_updates, axis_name="data")
            else:
                cs, rs, m = multi_rollout_chunk(
                    cs, rs, ls.actor, eps, self.venv_shard, self.chunk_len,
                    self.gamma, self.n_agents, self.compute_dtype,
                    self.dcfg.space)
                ls, um = multi_update_n(ls, rs, self.dcfg_local, self.mcfg,
                                        n_up, self.max_updates,
                                        axis_name="data")
            m = jax.tree_util.tree_map(
                lambda x: jax.lax.psum(x, "data"), m)
            um = dict(um)
            # per-shard targets can diverge in finiteness; a replicated row
            # needs the all-shards verdict
            um["finite"] = jax.lax.psum(
                um["finite"].astype(jnp.int32), "data") == n_shards
            out = dict(m)
            out.update({f"u_{k}": v for k, v in um.items()})
            out["iter"] = jnp.max(ls.iteration)
            out["active"] = jnp.asarray(True)
            return (ls, cs, rs), out

        def superstep_local(ls, cs, rs, n_active, explore, anneal_start):
            carry = (ls, cs, rs)
            chunk = lambda c: one_chunk(c, explore[0], anneal_start[0])
            out_sds = jax.eval_shape(lambda c: chunk(c)[1], carry)
            zeros = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), out_sds)
            zeros["u_finite"] = jnp.asarray(True)

            def body(carry, i):
                return jax.lax.cond(i < n_active[0], chunk,
                                    lambda c: (c, zeros), carry)

            carry, rows = jax.lax.scan(
                body, carry, jnp.arange(max_chunks, dtype=jnp.int32))
            ls, cs, rs = carry
            return ls, cs, rs, rows

        fn = shard_map(
            superstep_local, mesh=self.mesh,
            in_specs=(P(), self._cspecs, self._rspecs, P(), P(), P()),
            out_specs=(P(), self._cspecs, self._rspecs, P()),
            check_vma=False,
        )
        jfn = jax.jit(fn, donate_argnums=(0, 1, 2))

        def superstep(ls, cs, rs, n_active, explore, anneal_start):
            return jfn(ls, cs, rs,
                       jnp.asarray(n_active, jnp.int32)[None],
                       jnp.asarray(explore, jnp.int32)[None],
                       jnp.asarray(anneal_start, jnp.int32)[None])

        return superstep

    # ----------------------------------------------- replay (de)canonicalize
    def canonical_replay(self, rs: rp.ReplayState) -> rp.ReplayState:
        """Gather a sharded replay to host arrays in canonical agent-major
        global column order (col = a*E_global + shard*E_shard + e) so
        snapshots are topology-portable (reference .replaymemory role,
        dqn.cpp:1146-1178)."""
        import numpy as np
        A, n, Es = self.n_agents, self.n_shards, self.env_per_shard

        def perm(x):
            x = np.asarray(x)
            if x.ndim < 2 or A == 1:
                return x
            cols = x.reshape((x.shape[0], n, A, Es) + x.shape[2:])
            return np.swapaxes(cols, 1, 2).reshape(x.shape)

        d = rs._asdict()
        return rp.ReplayState(
            **{k: (np.asarray(v) if k == "cursor" else perm(v))
               for k, v in d.items()})

    def shard_replay(self, rs_host: rp.ReplayState) -> rp.ReplayState:
        """Place a canonical (host/unsharded) replay onto the mesh in the
        shard-major column layout the DP programs expect.

        Uses make_array_from_callback so it also works under
        jax.distributed: every process holds the full canonical host copy
        (loaded from the snapshot set) and contributes only its
        addressable shards' columns."""
        import numpy as np
        A, n, Es = self.n_agents, self.n_shards, self.env_per_shard

        def unperm(x):
            x = np.asarray(x)
            if x.ndim < 2 or A == 1:
                return x
            cols = x.reshape((x.shape[0], A, n, Es) + x.shape[2:])
            return np.swapaxes(cols, 1, 2).reshape(x.shape)

        d = rs_host._asdict()
        cols = np.asarray(d["obs"]).shape[1]
        assert cols == A * n * Es, (
            f"replay snapshot has {cols} columns; this topology needs "
            f"{A * n * Es} (agents x shards x envs/shard)")
        specs = replay_specs()._asdict()
        out = {}
        for k, v in d.items():
            v = unperm(v) if k != "cursor" else np.asarray(v)
            sharding = NamedSharding(self.mesh, specs[k])
            out[k] = jax.make_array_from_callback(
                v.shape, sharding, lambda idx, v=v: v[idx])
        return rp.ReplayState(**out)

    def canonical_col_ids(self, global_cols) -> "np.ndarray":
        """Map shard-major global column indices -> canonical agent-major
        column ids (col = a*E_global + shard*E_shard + e) — the snapshot
        column order canonical_replay produces."""
        import numpy as np
        A, n, Es = self.n_agents, self.n_shards, self.env_per_shard
        g = np.asarray(global_cols)
        s, within = g // (A * Es), g % (A * Es)
        a, e = within // Es, within % Es
        return a * (n * Es) + s * Es + e

    def local_replay_shards(self, rs: rp.ReplayState) -> dict:
        """This process's addressable replay columns + their canonical
        column ids — the per-process payload of a multi-host replay
        snapshot (written without ever gathering the buffer to one host;
        reference role: replay always checkpointed, dqn.cpp:1146-1226).
        """
        import numpy as np
        leaves = {}
        col_ids = None
        for k, v in rs._asdict().items():
            if k == "cursor":
                leaves[k] = np.asarray(v)
                continue
            shards = sorted(v.addressable_shards,
                            key=lambda s: s.index[1].start or 0)
            cols = []
            ids = []
            for s in shards:
                sl = s.index[1]
                start = 0 if sl.start is None else sl.start
                stop = v.shape[1] if sl.stop is None else sl.stop
                ids.append(np.arange(start, stop))
                cols.append(np.asarray(s.data))
            leaves[k] = np.concatenate(cols, axis=1)
            ids = self.canonical_col_ids(np.concatenate(ids))
            if col_ids is None:
                col_ids = ids
            else:
                assert np.array_equal(col_ids, ids)
        leaves["col_ids"] = col_ids
        leaves["n_cols_global"] = np.asarray(
            self.n_agents * self.n_shards * self.env_per_shard)
        return leaves
