#!/usr/bin/env python
"""Split a stacked multi-agent snapshot into per-agent weight files.

A multi-agent run snapshots ONE stacked learner (leading agent axis A,
runtime/checkpoint.py).  Curriculum topologies (e.g. seeding a 3v3 run
from a trained 2v2 policy) need single-agent weight files for the
per-agent comma-separated --actor_weights/--critic_weights values
(GetArg, /root/reference/src/dqn_main.cpp:73-83, 270-286).

Usage:
  python scripts/split_snapshot.py runs/x_actor_iter_N.npz out_prefix \
      [--remap T_old,O_old,T_new,O_new]
  -> out_prefix_agent{a}.npz for each agent slice, loadable via
     --actor_weights (same for critic snapshots).

Reads both snapshot formats (flat-npz, round 5+; legacy pickle, rounds
≤4) and always writes the flat-npz bare-weights format — inert arrays,
no pickled objects (runtime/checkpoint.py docstring).

--remap adapts the first-layer weights across topologies for curriculum
runs (e.g. 2v2 -> 3v3): the state is 59 base features + 9 per other
player, teammates first (env/features.py), so rows are scattered onto
their semantic slots in the wider input and newly-visible players'
rows start at zero.  (The critic's first layer additionally carries the
10 action inputs after the state block; they are moved to the end.)
"""

import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASE, PER = 59, 9
IP1_KEY = "params:['tower'][0]['w']"


def remap_first_layer(w, spec, extra_in):
    """Scatter ip1 rows (in_dim, out) from the old input layout onto the
    new one.  `extra_in` = trailing non-state inputs (critic actions)."""
    t_old, o_old, t_new, o_new = spec
    in_old = BASE + PER * (t_old + o_old) + extra_in
    in_new = BASE + PER * (t_new + o_new) + extra_in
    assert w.shape[0] == in_old, (w.shape, in_old)
    out = np.zeros((in_new, w.shape[1]), w.dtype)
    out[:BASE] = w[:BASE]
    for j in range(min(t_old, t_new)):        # teammate blocks
        out[BASE + PER * j:BASE + PER * (j + 1)] = \
            w[BASE + PER * j:BASE + PER * (j + 1)]
    for j in range(min(o_old, o_new)):        # opponent blocks
        src = BASE + PER * (t_old + j)
        dst = BASE + PER * (t_new + j)
        out[dst:dst + PER] = w[src:src + PER]
    if extra_in:
        out[-extra_in:] = w[-extra_in:]
    return out


def load_flat_params(path: str) -> dict:
    """{'params:<keystr>': array} from either snapshot format."""
    if zipfile.is_zipfile(path):
        d = np.load(path)
        flat = {k: d[k] for k in d.files if k.startswith("params:")}
        if not flat:
            raise ValueError(f"{path}: no 'params:' leaves in archive")
        return flat
    import pickle  # legacy rounds ≤4 snapshot (read-only)
    from dqn_hfo_tpu.runtime.checkpoint import _flatten_section
    with open(path, "rb") as f:
        return _flatten_section("params", pickle.load(f)["params"])


def main(path: str, out_prefix: str, remap=None):
    flat = load_flat_params(path)
    A = next(iter(flat.values())).shape[0]
    for a in range(A):
        p = {k: np.asarray(v)[a] for k, v in flat.items()}
        if remap is not None:
            state_in = BASE + PER * (remap[0] + remap[1])
            extra = p[IP1_KEY].shape[0] - state_in   # 0 actor, 10 critic
            p[IP1_KEY] = remap_first_layer(p[IP1_KEY], remap, extra)
        out = f"{out_prefix}_agent{a}.npz"
        np.savez(out, **p)
        print(out)


if __name__ == "__main__":
    spec = None
    if len(sys.argv) > 4 and sys.argv[3] == "--remap":
        spec = tuple(int(x) for x in sys.argv[4].split(","))
    main(sys.argv[1], sys.argv[2], spec)
