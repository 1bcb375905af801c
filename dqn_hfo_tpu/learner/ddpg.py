"""Parameterized-action DDPG learner as a pure functional update.

Algorithmic parity with DQN::UpdateActorCritic
(/root/reference/src/dqn.cpp:828-972):

1. Sample 32 transitions uniformly with replacement.
2. Targets: per-sample mix  beta * on_policy_MC + (1-beta) * off_policy,
   off_policy = r if terminal else r + gamma * Q_target(s', actor_target(s'))
   (dqn.cpp:889-899; beta flag dqn.cpp:31).
3. Critic: Adam step on EuclideanLoss = ||q - target||^2 / (2N)
   (Caffe EuclideanLoss; lr 1e-3, grad-clip 10 — dqn_main.cpp:34-35,261).
4. Actor: dL/dQ = -1 per sample, backprop through the critic to its action
   inputs, gradient inversion on those diffs, then through the actor
   (dqn.cpp:908-965) — expressed here as jax.grad of
   -sum(critic(s, invert(actor(s)))) wrt actor params, with the inversion a
   custom_vjp (ops/grad_inversion.py). Adam lr 1e-5, clip 10.
5. Soft-update both target nets every soft_update_freq iters with tau=.001
   (dqn.cpp:967-970, 1085-1096).

State is a single pytree; the whole update jit-compiles onto the TPU and
composes with shard_map for data parallelism (parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu import spaces
from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.models.nets import (actor_apply, actor_init, critic_apply,
                                     critic_init)
from dqn_hfo_tpu.ops.grad_inversion import invert_gradients_bounded

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class DDPGConfig:
    """Learner hyperparameters — names/defaults match the reference flags
    (dqn.cpp:21-31, dqn_main.cpp:29-41)."""

    state_size: int = 59
    minibatch: int = C.K_MINIBATCH_SIZE
    gamma: float = 0.99
    tau: float = 0.001
    soft_update_freq: int = 1
    beta: float = 0.5
    actor_lr: float = 1e-5
    critic_lr: float = 1e-3
    momentum: float = 0.95
    momentum2: float = 0.999
    clip_grad: float = 10.0
    adam_eps: float = 1e-8
    # Solver selection — the reference's --solver flag goes through Caffe's
    # SolverRegistry (dqn_main.cpp:30, solver proto type at :232-236);
    # the registry's types are reproduced here over optax transforms.
    solver: str = "Adam"
    # Learning-rate policy — Caffe SolverParameter lr_policy semantics
    # (--lr_policy, dqn_main.cpp:36; set on the proto at :237-238).
    # Supported: fixed | step | exp | inv | poly | sigmoid, using the proto's
    # gamma/power/stepsize/max_iter knobs.
    lr_policy: str = "fixed"
    lr_gamma: float = 0.1
    lr_power: float = 0.75
    lr_stepsize: int = 100_000
    max_iter: int = 10_000_000
    memory_threshold: int = 1000
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for MXU throughput
    action_space: str = "low_level"  # spaces.SPACES key
    # Hidden-layer widths — the reference's net architecture is overridable
    # via an on-disk .prototxt reloaded by the driver (dqn_main.cpp:231-246);
    # here the same surface is these tuples (CLI: --actor_tower/--critic_tower).
    actor_tower: tuple = (1024, 512, 256, 128)
    critic_tower: tuple = (1024, 512, 256, 128)

    @property
    def space(self) -> spaces.ActionSpace:
        return spaces.SPACES[self.action_space]


class LearnerState(NamedTuple):
    actor: Any
    critic: Any
    actor_target: Any
    critic_target: Any
    actor_opt: Any
    critic_opt: Any
    iteration: jnp.ndarray  # () i32 — actor_iter == critic_iter here
    rng: Any


def make_lr_schedule(base_lr, cfg: DDPGConfig):
    """Caffe SolverParameter lr_policy as an optax schedule
    (caffe solver.cpp GetLearningRate semantics)."""
    pol, g, pw, step = cfg.lr_policy, cfg.lr_gamma, cfg.lr_power, cfg.lr_stepsize
    if pol == "fixed":
        return lambda t: base_lr
    if pol == "step":
        return lambda t: base_lr * g ** jnp.floor(t / step)
    if pol == "exp":
        return lambda t: base_lr * g ** t
    if pol == "inv":
        return lambda t: base_lr * (1.0 + g * t) ** (-pw)
    if pol == "poly":
        return lambda t: base_lr * (1.0 - jnp.minimum(t / cfg.max_iter, 1.0)) ** pw
    if pol == "sigmoid":
        return lambda t: base_lr / (1.0 + jnp.exp(-g * (t - step)))
    raise ValueError(f"unknown lr_policy: {pol!r}")


def _scale_by_solver(cfg: DDPGConfig):
    """The reference's --solver goes through Caffe's SolverRegistry
    (dqn_main.cpp:232-236); each registered type mapped to its optax
    equivalent.  Momentum/momentum2 flags feed the same slots they fed in
    Caffe's protos (dqn_main.cpp:31-33)."""
    s = cfg.solver.lower()
    if s == "adam":
        return optax.scale_by_adam(b1=cfg.momentum, b2=cfg.momentum2,
                                   eps=cfg.adam_eps)
    if s == "sgd":
        return optax.trace(decay=cfg.momentum)
    if s == "nesterov":
        return optax.trace(decay=cfg.momentum, nesterov=True)
    if s == "adagrad":
        return optax.scale_by_rss(initial_accumulator_value=0.0,
                                  eps=cfg.adam_eps)
    if s == "rmsprop":
        # Caffe RMSProp rms_decay (default .99 in its proto); momentum2 slot
        # carries it here so the flag surface stays the reference's.
        return optax.scale_by_rms(decay=cfg.momentum2, eps=cfg.adam_eps)
    if s == "adadelta":
        return optax.scale_by_adadelta(rho=cfg.momentum, eps=cfg.adam_eps)
    raise ValueError(f"unknown solver: {cfg.solver!r}")


def make_optimizer(lr, cfg: DDPGConfig):
    sched = make_lr_schedule(lr, cfg)
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_grad),
        _scale_by_solver(cfg),
        optax.scale_by_schedule(lambda t: -sched(t)),
    )


def init_learner(key, cfg: DDPGConfig) -> LearnerState:
    ka, kc, kr = jax.random.split(key, 3)
    sp = cfg.space
    actor = actor_init(ka, cfg.state_size, tower=cfg.actor_tower,
                       n_actions=sp.n_actions, n_params=sp.n_params)
    critic = critic_init(kc, cfg.state_size, tower=cfg.critic_tower,
                         action_dim=sp.output_size)
    # Target nets start as clones (CloneNet, dqn.cpp:660-661).
    actor_target = jax.tree_util.tree_map(jnp.copy, actor)
    critic_target = jax.tree_util.tree_map(jnp.copy, critic)
    return LearnerState(
        actor=actor,
        critic=critic,
        actor_target=actor_target,
        critic_target=critic_target,
        actor_opt=make_optimizer(cfg.actor_lr, cfg).init(actor),
        critic_opt=make_optimizer(cfg.critic_lr, cfg).init(critic),
        iteration=jnp.asarray(0, jnp.int32),
        rng=kr,
    )


def compute_targets(ls: LearnerState, cfg: DDPGConfig, reward, on_policy,
                    next_obs, terminal):
    """Mixed on/off-policy targets (dqn.cpp:889-899).

    XLA fuses the whole two-tower target forward on its own; a hand-written
    Pallas fused kernel was benchmarked at ~1.03x (noise) on the batch-32
    update path and removed — see RESULTS.md."""
    a_next = actor_apply(ls.actor_target, next_obs, cfg.compute_dtype)
    q_next = critic_apply(ls.critic_target, next_obs, a_next,
                          cfg.compute_dtype)
    off_policy = jnp.where(terminal, reward, reward + cfg.gamma * q_next)
    return cfg.beta * on_policy + (1.0 - cfg.beta) * off_policy


def critic_loss_fn(critic, cfg: DDPGConfig, obs, action, target):
    q = critic_apply(critic, obs, action, cfg.compute_dtype)
    # Caffe EuclideanLoss: 1/(2N) * sum (q - t)^2
    return jnp.sum((q - target) ** 2) / (2.0 * q.shape[0])


def actor_loss_fn(actor, critic, cfg: DDPGConfig, obs):
    """-sum Q(s, invert(actor(s))): grad reproduces the reference's
    per-sample dL/dQ = -1 + gradient inversion + actor backward."""
    mins, maxs = cfg.space.bounds_arrays()
    out = actor_apply(actor, obs, cfg.compute_dtype)
    out = invert_gradients_bounded(out, mins, maxs)
    q = critic_apply(critic, obs, out, cfg.compute_dtype)
    return -jnp.sum(q), q


def update_once(ls: LearnerState, replay: rp.ReplayState, cfg: DDPGConfig,
                axis_name=None, idx=None, has_data=None):
    """One actor+critic iteration from the replay. Returns
    (new LearnerState, (critic_loss, avg_q)).

    With `axis_name` set (data-parallel mesh), each shard samples
    cfg.minibatch transitions from its local replay shard and gradients are
    averaged over the shards that hold data before Adam — the
    psum-of-gradients DP mapping of the reference's single-GPU update
    (SURVEY.md §2 P5/P6).

    `idx` (optional, (minibatch,)) supplies presampled transition indices —
    update_n hoists the replay sampling out of its scan since the buffer is
    frozen across the whole update burst.

    `has_data` (optional, () bool) marks whether this shard's (or agent
    view's) replay holds >= 1 labeled row.  The memory-threshold gate psums
    the count so shards agree, which means a shard whose LOCAL labeled count
    is zero can still enter the update: its sample() over an all-False mask
    would gather unlabeled garbage.  Such a shard's gradients, loss, and
    avg_q are zero-masked here, and the cross-shard mean divides by the
    number of data-holding shards instead of the axis size.  The guard is
    compiled in only on real multi-shard meshes (axis size > 1) — the
    imbalance cannot exist on a single shard, and keeping the 1-shard
    program untouched preserves the 1-device-mesh bitwise-equals-unsharded
    property (any structural perturbation of the update graph shifts XLA's
    fusion choices and with them float reduction order)."""
    n_shards = 1 if axis_name is None else jax.lax.psum(1, axis_name)
    if has_data is None and n_shards > 1:
        has_data = rp.valid_count(replay) > 0
    guarded = has_data is not None and n_shards > 1

    key, k_sample = jax.random.split(ls.rng)
    if idx is None:
        # distinct sample streams per shard; ls.rng stays replicated.  The
        # unsharded path folds in shard id 0 so a 1-device mesh reproduces
        # it bitwise (tests/test_dp_equivalence.py).
        k_sample = jax.random.fold_in(
            k_sample,
            jax.lax.axis_index(axis_name) if axis_name is not None else 0)
        idx = rp.sample(replay, k_sample, cfg.minibatch)

    def _mask(t):
        if not guarded:
            return t
        return jax.tree_util.tree_map(
            lambda g: jnp.where(has_data, g, jnp.zeros_like(g)), t)

    obs, action, reward, on_policy, next_obs, terminal = rp.gather(replay, idx)

    target = compute_targets(ls, cfg, reward, on_policy, next_obs, terminal)

    # Critic step
    closs, cgrads = jax.value_and_grad(critic_loss_fn)(
        ls.critic, cfg, obs, action, target
    )
    cgrads = _mask(cgrads)
    closs = _mask(closs)
    if axis_name is not None:
        if guarded:
            # mean over the shards that hold data, not the axis size
            n_data = jnp.maximum(
                jax.lax.psum(has_data.astype(F32), axis_name), 1.0)
            cgrads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, axis_name) / n_data, cgrads)
            closs = jax.lax.psum(closs, axis_name) / n_data
        else:
            cgrads = jax.lax.pmean(cgrads, axis_name)
            closs = jax.lax.pmean(closs, axis_name)
    c_opt = make_optimizer(cfg.critic_lr, cfg)
    c_updates, c_opt_state = c_opt.update(cgrads, ls.critic_opt, ls.critic)
    critic = optax.apply_updates(ls.critic, c_updates)

    # Actor step — uses the UPDATED critic, matching the reference ordering
    # (critic Step(1) precedes the actor backward, dqn.cpp:901-965).
    (_, q), agrads = jax.value_and_grad(actor_loss_fn, has_aux=True)(
        ls.actor, critic, cfg, obs
    )
    agrads = _mask(agrads)
    if axis_name is not None:
        # the actor loss is a SUM over the batch (per-sample dL/dQ = -1,
        # dqn.cpp:918-921), so splitting the batch over shards needs psum —
        # pmean would silently divide the actor gradient by the shard count
        # (caught by tests/test_dp_equivalence.py's controlled-stream test)
        agrads = jax.lax.psum(agrads, axis_name)
    a_opt = make_optimizer(cfg.actor_lr, cfg)
    a_updates, a_opt_state = a_opt.update(agrads, ls.actor_opt, ls.actor)
    actor = optax.apply_updates(ls.actor, a_updates)

    iteration = ls.iteration + 1

    # Soft target updates (dqn.cpp:967-970)
    do_soft = jnp.mod(iteration, cfg.soft_update_freq) == 0

    def soft(t, l):
        return jnp.where(do_soft, cfg.tau * l + (1.0 - cfg.tau) * t, t)

    actor_target = jax.tree_util.tree_map(soft, ls.actor_target, actor)
    critic_target = jax.tree_util.tree_map(soft, ls.critic_target, critic)

    new_ls = LearnerState(
        actor=actor,
        critic=critic,
        actor_target=actor_target,
        critic_target=critic_target,
        actor_opt=a_opt_state,
        critic_opt=c_opt_state,
        iteration=iteration,
        rng=key,
    )
    avg_q = _mask(jnp.mean(q))
    if axis_name is not None:
        if guarded:
            avg_q = jax.lax.psum(avg_q, axis_name) / n_data
        else:
            avg_q = jax.lax.pmean(avg_q, axis_name)
    # Finite guard: the reference CHECKs every target and the loss finite
    # (dqn.cpp:893-906); inside jit this surfaces as a flag the host loop
    # turns into a run-aborting error.  A data-less shard's (zero-masked)
    # garbage rows are exempt.
    finite = jnp.all(jnp.isfinite(target)) & jnp.isfinite(closs)
    if guarded:
        finite = (jnp.all(jnp.isfinite(target)) | ~has_data) \
            & jnp.isfinite(closs)
    return new_ls, (closs, avg_q, finite)


def update_n(ls: LearnerState, replay: rp.ReplayState, cfg: DDPGConfig,
             n_updates, max_updates: int, axis_name=None):
    """Run up to max_updates iterations, the first n_updates active (the
    episode-coupled update count: int(steps * update_ratio),
    dqn_main.cpp:358-362).  Skips entirely below memory_threshold
    (dqn.cpp:800-802)."""
    local_count = rp.valid_count(replay)
    count = local_count
    n_shards = 1 if axis_name is None else jax.lax.psum(1, axis_name)
    if axis_name is not None:
        # all shards must agree on the gate or collectives would diverge
        count = jax.lax.psum(count, axis_name)
    enough = count >= cfg.memory_threshold
    # zero-valid-shard guard (see update_once) — only a real multi-shard
    # mesh can pass the psum'd gate with an empty local shard
    has_data = (local_count > 0) if n_shards > 1 else None

    # Presample every minibatch for the burst in one pass — the replay is
    # frozen during update_n, so this is equivalent to per-iteration
    # sampling and removes a full-buffer scan from every scan step.
    key, k_all = jax.random.split(ls.rng)
    # fold in the shard id (0 unsharded) — see update_once
    k_all = jax.random.fold_in(
        k_all, jax.lax.axis_index(axis_name) if axis_name is not None else 0)
    all_idx = rp.sample(replay, k_all, max_updates * cfg.minibatch).reshape(
        max_updates, cfg.minibatch)
    ls = ls._replace(rng=key)

    def body(carry, xs):
        state = carry
        i, idx = xs
        do = (i < n_updates) & enough

        def run(s):
            return update_once(s, replay, cfg, axis_name, idx=idx,
                               has_data=has_data)

        def skip(s):
            return s, (jnp.asarray(0.0, F32), jnp.asarray(0.0, F32),
                       jnp.asarray(True))

        state, metrics = jax.lax.cond(do, run, skip, state)
        return state, metrics + (do,)

    ls, (losses, qs, finites, dids) = jax.lax.scan(
        body, ls, (jnp.arange(max_updates, dtype=jnp.int32), all_idx)
    )
    n_done = jnp.sum(dids.astype(jnp.int32))
    denom = jnp.maximum(n_done, 1)
    return ls, {
        "critic_loss": jnp.sum(losses) / denom,
        "avg_q": jnp.sum(qs) / denom,
        "updates": n_done,
        "finite": jnp.all(finites),
    }
