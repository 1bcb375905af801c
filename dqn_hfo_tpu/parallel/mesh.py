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

Multi-host extension: the same code runs under jax.distributed with a global
mesh; all collectives stay in one jit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dqn_hfo_tpu.env.hfo_env import HFOEnv, VecHFOEnv
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.collector import (CollectorState, WindowState,
                                           init_collector, rollout_chunk)
from dqn_hfo_tpu.learner.ddpg import DDPGConfig, LearnerState, update_n


def make_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    if n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(devs, ("data",))


def collector_specs(cs: CollectorState) -> CollectorState:
    """PartitionSpecs for a CollectorState: env axis -> 'data'."""
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
    """Builds and owns the sharded init + train-step programs."""

    mesh: Mesh
    env: HFOEnv
    n_envs: int              # global env count (divisible by mesh size)
    chunk_len: int
    dcfg: DDPGConfig
    memory: int              # global replay capacity
    max_updates: int
    gamma: float = 0.99
    compute_dtype: Any = None

    def __post_init__(self):
        n = self.mesh.devices.size
        assert self.n_envs % n == 0, "envs must divide the mesh"
        assert self.dcfg.minibatch % n == 0, "minibatch must divide the mesh"
        self.n_shards = n
        self.env_per_shard = self.n_envs // n
        self.venv_shard = VecHFOEnv(self.env, self.env_per_shard)
        # per-shard learner sees the local minibatch; grads are pmean'd
        self.dcfg_local = dataclasses.replace(
            self.dcfg, minibatch=self.dcfg.minibatch // n)

        # template (abstract) collector state for spec construction
        cs_shape = jax.eval_shape(
            lambda k: init_collector(self.venv_shard, k, self.chunk_len),
            jax.random.PRNGKey(0),
        )
        self._cspecs = collector_specs(cs_shape)
        self._rspecs = replay_specs()

        @functools.partial(
            shard_map, mesh=self.mesh, in_specs=(P(),),
            out_specs=(self._cspecs, self._rspecs),
        )
        def _init(key):
            i = jax.lax.axis_index("data")
            k = jax.random.fold_in(key[0], i)
            cs = init_collector(self.venv_shard, k, self.chunk_len)
            rs = rp.init_replay(self.memory // self.n_shards,
                                self.env_per_shard,
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
            cs, rs, m = rollout_chunk(
                cs, rs, ls.actor, eps, self.venv_shard, self.chunk_len,
                self.gamma, self.compute_dtype, self.dcfg.space,
            )
            m = jax.tree_util.tree_map(
                lambda x: jax.lax.psum(x, "data"), m)
            ls, um = update_n(ls, rs, self.dcfg_local, n_updates,
                              self.max_updates, axis_name="data")
            return ls, cs, rs, m, um

        self._step_fn = jax.jit(_step, donate_argnums=(0, 1, 2))

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
