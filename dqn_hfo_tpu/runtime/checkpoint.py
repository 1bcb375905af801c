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
All three are plain ``np.savez`` archives of arrays — inert data like the
reference's artifacts (dqn.cpp:582-620, 1146-1178), never pickled code
objects.  Learner pytrees are stored flat, one array per leaf, keyed by
section + the leaf's canonical tree path (``jax.tree_util.keystr``), and
are reassembled against the live learner's tree structure on load (so a
structural mismatch fails with the offending path, not a deserialization
crash).  Snapshots written by rounds ≤4 used pickle; a read-only legacy
loader keeps them restorable.
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


def _flatten_section(section: str, tree) -> dict:
    """Pytree -> {'<section>:<keystr>': np.ndarray} (one entry per leaf)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {f"{section}:{jax.tree_util.keystr(path)}": np.asarray(leaf)
            for path, leaf in flat}


def _unflatten_section(section: str, template, data) -> object:
    """Rebuild `template`'s tree structure from a flat npz mapping.

    `data` is an NpzFile (or dict).  Every leaf path of the template must
    be present; a miss raises with the offending path and the archive's
    keys for that section, so architecture/refactor mismatches are
    actionable instead of silently wrong."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, tmpl_leaf in flat:
        key = f"{section}:{jax.tree_util.keystr(path)}"
        if key not in data:
            have = sorted(k for k in getattr(data, "files", data)
                          if k.startswith(section + ":"))
            raise KeyError(
                f"snapshot is missing leaf {key!r}; the live learner's "
                f"tree does not match the snapshot (archive has "
                f"{len(have)} '{section}' leaves: {have[:6]}...)")
        leaf = np.asarray(data[key])
        if leaf.shape != np.shape(tmpl_leaf):
            raise ValueError(
                f"snapshot leaf {key!r} has shape {leaf.shape}, live "
                f"learner expects {np.shape(tmpl_leaf)} — architecture "
                f"mismatch (wrong --*_tower / state size / agent count?)")
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _save_learner_npz(path: str, sections: dict, scalars: dict):
    """Write one learner snapshot file: flat tree sections + scalar arrays,
    all via np.savez — no pickled objects (allow_pickle stays off on load)."""
    arrs = {}
    for name, tree in sections.items():
        arrs.update(_flatten_section(name, tree))
    arrs.update({k: np.asarray(v) for k, v in scalars.items()})
    np.savez(path, **arrs)


def _is_npz(path: str) -> bool:
    import zipfile
    return zipfile.is_zipfile(path)


def _load_legacy_pickle(path: str) -> dict:
    """Read-only loader for rounds ≤4 pickle-format learner snapshots."""
    with open(path, "rb") as f:
        return pickle.load(f)


def snapshot(prefix: str, ls: LearnerState, replay: Optional[rp.ReplayState],
             snapshot_memory: bool = True, remove_old: bool = False):
    """Write the snapshot triple at the learner's current iteration.
    Works for single (scalar iteration) and stacked multi-agent learners."""
    it = int(np.max(np.asarray(ls.iteration)))
    actor_path = f"{prefix}_actor_iter_{it}.npz"
    critic_path = f"{prefix}_critic_iter_{it}.npz"
    _save_learner_npz(actor_path,
                      {"params": ls.actor, "opt": ls.actor_opt},
                      {"iter": it,
                       "iter_array": np.asarray(ls.iteration),
                       "rng": np.asarray(ls.rng)})
    _save_learner_npz(critic_path,
                      {"params": ls.critic, "opt": ls.critic_opt},
                      {"iter": it})
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
    # Write-then-rename so a crash mid-write never leaves a torn shard
    # file under the final name (the set-level completeness marker is
    # written by the coordinator after the barrier — see
    # mark_snapshot_complete).
    tmp = os.path.join(os.path.dirname(path) or ".",
                       ".tmp." + os.path.basename(path))
    np.savez(tmp, **payload)  # keeps the .npz suffix so savez won't append
    os.replace(tmp, path)
    return path


def mark_snapshot_complete(prefix: str, it: int) -> str:
    """Write the multi-host snapshot set's completion marker.

    The coordinator calls this LAST — after every process's replay shard
    has passed the sync barrier and after the learner actor/critic files
    are on disk — so a marker's presence certifies the whole iter-N set
    (shards + nets) is consistent.  find_latest_snapshot skips unmarked
    shard sets and falls back to the next-lower complete one, closing the
    crash windows between shard writes and the learner snapshot (the
    reference's analogue is its CHECK on snapshot file existence,
    dqn.cpp:593-610)."""
    path = f"{prefix}_iter_{it}.replaymemory.complete"
    with open(path, "w"):
        pass
    return path


def _shard_set_usable(stem: str) -> bool:
    """A shard set at `stem` is loadable: its marker exists, or (markerless
    rounds ≤4 sets) the files present match the declared shard count."""
    if os.path.exists(stem + ".complete"):
        return True
    files = glob.glob(stem + ".shard*-of-*.npz")
    if not files:
        return False
    m = re.search(r"\.shard\d+-of-(\d+)\.npz$", files[0])
    return m is not None and len(files) == int(m.group(1))


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
    counts = {int(re.search(r"\.shard\d+-of-(\d+)\.npz$", f).group(1))
              for f in files}
    if len(counts) != 1:
        raise ValueError(
            f"replay shard set at {base} mixes topologies: files declare "
            f"shard counts {sorted(counts)} — remove the stale set before "
            f"resuming")
    want = counts.pop()
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
        if covered[ids].any():
            dup = np.flatnonzero(covered[ids])
            raise ValueError(
                f"replay shard file {f} re-claims {dup.size} column(s) "
                f"already written by an earlier shard (first: col "
                f"{int(ids[dup[0]])}) — overlapping shard set")
        covered[ids] = True
        for k in out:
            out[k][:, ids] = d[k]
        cursor = d["cursor"]
    if not covered.all():
        missing = np.flatnonzero(~covered)
        raise ValueError(
            f"replay shard set {base} leaves {missing.size} of "
            f"{covered.size} columns uncovered (first missing: col "
            f"{int(missing[0])}) — shard files from mismatched runs?")
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
        if kind == "memory":
            # Newest USABLE memory snapshot: a single file, or a shard set
            # that is marked complete (or markerless-but-full, rounds ≤4).
            # An interrupted multi-host snapshot leaves a partial set at
            # the greatest iter; fall back to the next-lower complete one
            # instead of aborting the resume.
            iters = set()
            for f in glob.glob(prefix + "*"):
                rest = f[len(prefix):]
                m = re.search(pat, f)
                if m and f.startswith(prefix) \
                        and not rest.startswith("_HiScore"):
                    iters.add(int(m.group(1)))
            chosen = ""
            for it in sorted(iters, reverse=True):
                single = f"{prefix}_iter_{it}.replaymemory.npz"
                stem = f"{prefix}_iter_{it}.replaymemory"
                if os.path.exists(single):
                    chosen = single
                    break
                if _shard_set_usable(stem):
                    chosen = stem
                    break
            out.append(chosen)
        else:
            it = _find_greatest_iter(prefix, pat)
            if it > 0:
                mid = "_actor" if kind == "actor" else "_critic"
                out.append(f"{prefix}{mid}_iter_{it}.npz")
            else:
                out.append("")
    return tuple(out)


def remove_snapshots(prefix: str, min_iter: int):
    pats = list(_PATTERNS.values()) + [
        r"_iter_(\d+)\.replaymemory\.complete$"]
    for pat in pats:
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


def _load_weights(path: str, kind: str, template):
    """Bare-weights loader: this framework's npz or a reference-format
    .caffemodel actor/critic (dqn_main.cpp:23-24; runtime/caffemodel.py).
    `template` is the live learner's params tree (for flat-npz reassembly;
    unused by the caffemodel and legacy-pickle paths)."""
    if path.endswith(".caffemodel"):
        from dqn_hfo_tpu.runtime import caffemodel as cm
        fn = (cm.actor_params_from_caffemodel if kind == "actor"
              else cm.critic_params_from_caffemodel)
        return fn(path)
    if _is_npz(path):
        return _unflatten_section("params", template, np.load(path))
    return _load_legacy_pickle(path)["params"]


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
        if _is_npz(actor_path):
            d = np.load(actor_path)
            actor = _unflatten_section("params", ls.actor, d)
            actor_opt = _unflatten_section("opt", ls.actor_opt, d)
            it = int(d["iter"])
            iter_array = d["iter_array"] if "iter_array" in d.files else None
            rng = jnp.asarray(d["rng"]) if "rng" in d.files else rng
        else:  # rounds ≤4 pickle snapshot (read-only legacy path)
            d = _load_legacy_pickle(actor_path)
            actor, actor_opt, it = d["params"], d["opt"], int(d["iter"])
            iter_array = d.get("iter_array")
            rng = jnp.asarray(d["rng"]) if "rng" in d else rng
    elif actor_weights:
        actor = _load_weights(actor_weights, "actor", ls.actor)
    if critic_path:
        if _is_npz(critic_path):
            d = np.load(critic_path)
            critic = _unflatten_section("params", ls.critic, d)
            critic_opt = _unflatten_section("opt", ls.critic_opt, d)
            it = max(it, int(d["iter"]))
        else:
            d = _load_legacy_pickle(critic_path)
            critic, critic_opt = d["params"], d["opt"]
            it = max(it, int(d["iter"]))
    elif critic_weights:
        critic = _load_weights(critic_weights, "critic", ls.critic)

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
