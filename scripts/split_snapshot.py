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

--remap adapts the first-layer weights across topologies for curriculum
runs (e.g. 2v2 -> 3v3): the state is 59 base features + 9 per other
player, teammates first (env/features.py), so rows are scattered onto
their semantic slots in the wider input and newly-visible players'
rows start at zero.  (The critic's first layer additionally carries the
10 action inputs after the state block; they are moved to the end.)
"""

import pickle
import sys

import numpy as np

BASE, PER = 59, 9


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


def main(path: str, out_prefix: str, remap=None):
    with open(path, "rb") as f:
        d = pickle.load(f)
    params = d["params"]

    # leading-axis arity from any leaf
    def leaves(t):
        if isinstance(t, dict):
            for v in t.values():
                yield from leaves(v)
        elif isinstance(t, (list, tuple)):
            for v in t:
                yield from leaves(v)
        else:
            yield t

    A = next(iter(leaves(params))).shape[0]

    def take(t, a):
        if isinstance(t, dict):
            return {k: take(v, a) for k, v in t.items()}
        if isinstance(t, list):
            return [take(v, a) for v in t]
        if isinstance(t, tuple):
            return tuple(take(v, a) for v in t)
        return np.asarray(t)[a]

    for a in range(A):
        p = take(params, a)
        if remap is not None:
            ip1 = p["tower"][0]
            state_in = BASE + PER * (remap[0] + remap[1])
            extra = ip1["w"].shape[0] - state_in   # 0 actor, 10 critic
            p["tower"][0] = {"w": remap_first_layer(ip1["w"], remap, extra),
                             "b": ip1["b"]}
        out = f"{out_prefix}_agent{a}.npz"
        with open(out, "wb") as f:
            pickle.dump({"params": p}, f, protocol=4)
        print(out)


if __name__ == "__main__":
    spec = None
    if len(sys.argv) > 4 and sys.argv[3] == "--remap":
        spec = tuple(int(x) for x in sys.argv[4].split(","))
    main(sys.argv[1], sys.argv[2], spec)
