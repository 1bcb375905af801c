"""Checkpoint / resume: the reference's snapshot triple, functional-state
edition.

Reference artifacts (/root/reference/src/dqn.cpp:582-620, 1146-1226):
  {prefix}_actor_iter_N.caffemodel/.solverstate
  {prefix}_critic_iter_N.caffemodel/.solverstate
  {prefix}_iter_N.replaymemory
Here the same roles map to three npz files:
  {prefix}_actor_iter_N.npz    — actor params + Adam state
  {prefix}_critic_iter_N.npz   — critic params + Adam state
  {prefix}_iter_N.replaymemory.npz — replay arrays + cursor
Semantics preserved:
  - FindLatestSnapshot regex-scans for the newest complete set
    (dqn.cpp:122-144); resume is automatic re-execution of the same command
    (dqn_main.cpp:214-220).
  - Target nets are NOT checkpointed; they are re-cloned from the restored
    live nets (dqn.cpp:541-557).
  - Old snapshots are GC'd after a successful save (dqn.cpp:612-618);
    HiScore snapshots are exempt and skip the memory (dqn_main.cpp:366-374).
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu.learner import replay as rp
from dqn_hfo_tpu.learner.ddpg import LearnerState


def _tree_to_np(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _save_pickle_npz(path: str, payload: dict):
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=4)


def _load_pickle_npz(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def snapshot(prefix: str, ls: LearnerState, replay: Optional[rp.ReplayState],
             snapshot_memory: bool = True, remove_old: bool = False):
    """Write the snapshot triple at the learner's current iteration.
    Works for single (scalar iteration) and stacked multi-agent learners."""
    it = int(np.max(np.asarray(ls.iteration)))
    actor_path = f"{prefix}_actor_iter_{it}.npz"
    critic_path = f"{prefix}_critic_iter_{it}.npz"
    _save_pickle_npz(actor_path, {
        "params": _tree_to_np(ls.actor),
        "opt": _tree_to_np(ls.actor_opt),
        "iter": it,
        "iter_array": np.asarray(ls.iteration),
        "rng": np.asarray(ls.rng),
    })
    _save_pickle_npz(critic_path, {
        "params": _tree_to_np(ls.critic),
        "opt": _tree_to_np(ls.critic_opt),
        "iter": it,
    })
    paths = [actor_path, critic_path]
    if snapshot_memory and replay is not None:
        mem_path = f"{prefix}_iter_{it}.replaymemory.npz"
        np.savez(mem_path, **{k: np.asarray(v)
                              for k, v in replay._asdict().items()})
        paths.append(mem_path)
    if remove_old:
        remove_snapshots(prefix, it - 1)
    return paths


def snapshot_replay_shards(prefix: str, it: int, payload: dict,
                           process_index: int, process_count: int) -> str:
    """Write ONE process's replay columns as a shard file of a multi-host
    snapshot set: {prefix}_iter_N.replaymemory.shardP-of-C.npz.

    `payload` comes from DataParallel.local_replay_shards — the process's
    addressable columns keyed by replay field, plus their canonical column
    ids — so the set as a whole is the canonical agent-major snapshot
    (reference role: the replay is always part of the snapshot triple,
    dqn.cpp:1146-1226) without any cross-host gather."""
    path = (f"{prefix}_iter_{it}.replaymemory"
            f".shard{process_index:03d}-of-{process_count:03d}.npz")
    np.savez(path, **payload)
    return path


def load_sharded_replay(base: str) -> rp.ReplayState:
    """Assemble the canonical host replay from a complete shard set.

    `base` is the set's common stem: {prefix}_iter_N.replaymemory (the
    virtual path find_latest_snapshot returns when it finds shard files).
    Every shard file scatters its columns at its canonical column ids, so
    the result is identical to the single-file canonical snapshot and can
    be re-sharded onto any topology via DataParallel.shard_replay."""
    files = sorted(glob.glob(base + ".shard*-of-*.npz"))
    if not files:
        raise FileNotFoundError(f"no replay shard files at {base}.shard*")
    m = re.search(r"\.shard\d+-of-(\d+)\.npz$", files[0])
    want = int(m.group(1))
    if len(files) != want:
        raise FileNotFoundError(
            f"incomplete replay shard set at {base}: "
            f"{len(files)}/{want} files")
    out = None
    covered = None
    for f in files:
        d = np.load(f)
        ids = d["col_ids"]
        n_cols = int(d["n_cols_global"])
        if out is None:
            out = {}
            covered = np.zeros(n_cols, bool)
            for k in d.files:
                if k in ("col_ids", "n_cols_global", "cursor"):
                    continue
                a = d[k]
                out[k] = np.zeros((a.shape[0], n_cols) + a.shape[2:],
                                  a.dtype)
        covered[ids] = True
        for k in out:
            out[k][:, ids] = d[k]
        cursor = d["cursor"]
    assert covered is not None and covered.all(), \
        f"replay shard set {base} does not cover all columns"
    out["cursor"] = cursor
    return rp.ReplayState(**{k: jnp.asarray(v) for k, v in out.items()})


_PATTERNS = {
    "actor": r"_actor_iter_(\d+)\.npz$",
    "critic": r"_critic_iter_(\d+)\.npz$",
    "memory": r"_iter_(\d+)\.replaymemory(\.shard\d+-of-\d+)?\.npz$",
}


def _find_greatest_iter(prefix: str, pattern: str) -> int:
    best = -1
    for f in glob.glob(prefix + "*"):
        m = re.search(pattern, f)
        if m and f.startswith(prefix):
            # exclude HiScore files when scanning a plain prefix
            rest = f[len(prefix):]
            if rest.startswith("_HiScore"):
                continue
            best = max(best, int(m.group(1)))
    return best


def find_latest_snapshot(prefix: str) -> Tuple[str, str, str]:
    """Newest (actor, critic, memory) snapshot paths ('' if absent),
    mirroring FindLatestSnapshot (dqn.cpp:122-144).

    The memory entry is either a single-file snapshot path
    (...replaymemory.npz) or — for a multi-host shard set — the set's stem
    (...replaymemory, no extension), which load_sharded_replay consumes."""
    out = []
    for kind, pat in _PATTERNS.items():
        it = _find_greatest_iter(prefix, pat)
        if it > 0:
            if kind == "memory":
                single = f"{prefix}_iter_{it}.replaymemory.npz"
                stem = f"{prefix}_iter_{it}.replaymemory"
                out.append(single if os.path.exists(single) else stem)
            else:
                mid = "_actor" if kind == "actor" else "_critic"
                out.append(f"{prefix}{mid}_iter_{it}.npz")
        else:
            out.append("")
    return tuple(out)


def remove_snapshots(prefix: str, min_iter: int):
    for pat in _PATTERNS.values():
        for f in glob.glob(prefix + "*"):
            rest = f[len(prefix):]
            if rest.startswith("_HiScore"):
                continue
            m = re.search(pat, f)
            if m and int(m.group(1)) < min_iter:
                os.remove(f)


def remove_files_matching(prefix_regexp: str):
    """RemoveFilesMatchingRegexp analogue (dqn.cpp:92-98)."""
    d = os.path.dirname(prefix_regexp) or "."
    pat = re.compile(os.path.basename(prefix_regexp))
    for f in os.listdir(d):
        if pat.match(f):
            os.remove(os.path.join(d, f))


def find_hi_score(prefix: str) -> float:
    """Best saved HiScore (FindHiScore, dqn.cpp:146-158)."""
    best = -float("inf")
    for f in glob.glob(prefix + "_HiScore*"):
        m = re.search(r"_HiScore([-0-9.]+)_", f)
        if m:
            try:
                best = max(best, float(m.group(1).rstrip(".")))
            except ValueError:
                pass
    return best


def _load_weights(path: str, kind: str):
    """Bare-weights loader: this framework's npz or a reference-format
    .caffemodel actor/critic (dqn_main.cpp:23-24; runtime/caffemodel.py)."""
    if path.endswith(".caffemodel"):
        from dqn_hfo_tpu.runtime import caffemodel as cm
        fn = (cm.actor_params_from_caffemodel if kind == "actor"
              else cm.critic_params_from_caffemodel)
        return fn(path)
    return _load_pickle_npz(path)["params"]


def restore_learner(ls: LearnerState, actor_path: str = "",
                    critic_path: str = "",
                    actor_weights: str = "", critic_weights: str = "",
                    ) -> LearnerState:
    """Restore solvers (params+opt+iter) or bare weights; target nets are
    re-cloned from the restored live nets (dqn.cpp:541-557)."""
    actor, actor_opt = ls.actor, ls.actor_opt
    critic, critic_opt = ls.critic, ls.critic_opt
    it = int(np.max(np.asarray(ls.iteration)))
    rng = ls.rng
    iter_array = None
    if actor_path:
        d = _load_pickle_npz(actor_path)
        actor, actor_opt, it = d["params"], d["opt"], int(d["iter"])
        iter_array = d.get("iter_array")
        rng = jnp.asarray(d["rng"]) if "rng" in d else rng
    elif actor_weights:
        actor = _load_weights(actor_weights, "actor")
    if critic_path:
        d = _load_pickle_npz(critic_path)
        critic, critic_opt = d["params"], d["opt"]
        it = max(it, int(d["iter"]))
    elif critic_weights:
        critic = _load_weights(critic_weights, "critic")

    to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    actor, critic = to_dev(actor), to_dev(critic)
    iteration = (jnp.asarray(iter_array, jnp.int32) if iter_array is not None
                 else jnp.asarray(it, jnp.int32))
    return LearnerState(
        actor=actor,
        critic=critic,
        actor_target=jax.tree_util.tree_map(jnp.copy, actor),
        critic_target=jax.tree_util.tree_map(jnp.copy, critic),
        actor_opt=to_dev(actor_opt),
        critic_opt=to_dev(critic_opt),
        iteration=iteration,
        rng=rng,
    )


def restore_learner_agent(mls: LearnerState, agent: int,
                          actor_path: str = "", critic_path: str = "",
                          actor_weights: str = "", critic_weights: str = "",
                          ) -> LearnerState:
    """Restore ONE agent's slice of a stacked multi-agent learner from
    single-agent snapshot/weights files — the per-agent comma-separated
    flag values of the reference (GetArg, dqn_main.cpp:73-83,270-286)."""
    ls_i = jax.tree_util.tree_map(lambda x: x[agent], mls)
    ls_i = restore_learner(ls_i, actor_path, critic_path,
                           actor_weights, critic_weights)
    return jax.tree_util.tree_map(
        lambda stacked, new: stacked.at[agent].set(
            jnp.asarray(new, stacked.dtype)), mls, ls_i)


def load_replay(path: str) -> rp.ReplayState:
    d = np.load(path)
    return rp.ReplayState(**{k: jnp.asarray(d[k]) for k in d.files})
