"""Episode recording and rendering — the reference's game-log + video
pipeline (C11: scripts/record.sh renders rcssserver .rcg logs via
soccerwindow2 + ffmpeg; the --record_dir flag, hfo_game.cpp:16).

Here the env is in-graph, so recording is just capturing the state trace of
an episode: `record_episode` rolls a policy and returns (and optionally
saves) a positions/status/reward trajectory; `render_gif` draws it with
matplotlib (pillow writer — no ffmpeg needed in this image).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu import spaces as sp_mod
from dqn_hfo_tpu.constants import ServerParams
from dqn_hfo_tpu.env.hfo_env import HFOEnv
from dqn_hfo_tpu.learner.agent import decode_action, select_actions


ACTION_NAMES = {C.DASH: "Dash", C.TURN: "Turn", C.TACKLE: "Tackle",
                C.KICK: "Kick", C.CATCH: "Catch", C.NOOP: "NoOp"}


def record_episode(env: HFOEnv, actor_params, key, epsilon: float = 0.0,
                   space=sp_mod.LOW_LEVEL, max_steps: Optional[int] = None,
                   save_path: str = "", critic_params=None, logger=None):
    """Roll one episode greedily and capture the trajectory.

    Returns a dict of numpy arrays: ball (T,2), players (T,P,2),
    body (T,P), reward (T,A), status (T,), obs (T,A,F) — plus, when
    `critic_params` is given, q (T,A) and action (T,A): the per-step
    EvaluateAction Q trace the reference emits under VLOG(1)
    (dqn_main.cpp:124-128).  With `logger` set (--verbose), each step's
    action/Q is also emitted as a q_trace log line.
    """
    max_steps = max_steps or env.sp.frames_per_trial + 1
    k_reset, k_act = jax.random.split(key)
    state, obs = jax.jit(env.reset)(k_reset)
    step = jax.jit(env.step)

    @jax.jit
    def _select(params, obs, k):
        out = select_actions(params, obs, k, epsilon, None, space)
        return (out,) + decode_action(out, space)

    q_fn = None
    if critic_params is not None:
        from dqn_hfo_tpu.models.nets import critic_apply
        q_fn = jax.jit(lambda o, a: critic_apply(critic_params, o, a))

    traj = {k: [] for k in ("ball", "players", "body", "reward", "status",
                            "obs")}
    if q_fn is not None:
        traj["q"] = []
        traj["action"] = []
    key = k_act
    for t in range(max_steps):
        key, k = jax.random.split(key)
        out, act, a1, a2, a3 = _select(actor_params, obs, k)
        if q_fn is not None:
            q = np.asarray(q_fn(obs, out))
            traj["q"].append(q)
            traj["action"].append(np.asarray(act))
            if logger is not None:
                logger.q_trace(t, ACTION_NAMES.get(int(act[0]),
                                                   str(int(act[0]))),
                               float(q[0]))
        state, obs, info = step(state, act, a1, a2, a3)
        traj["ball"].append(np.asarray(state.ball_pos))
        traj["players"].append(np.asarray(state.p_pos))
        traj["body"].append(np.asarray(state.p_body))
        traj["reward"].append(np.asarray(info.reward))
        traj["status"].append(int(info.status))
        traj["obs"].append(np.asarray(obs))
        if bool(info.done):
            break
    out = {k: np.asarray(v) for k, v in traj.items()}
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        np.savez_compressed(save_path, **out)
    return out


def render_gif(traj, sp: ServerParams, out_path: str, n_offense: int = 1,
               fps: int = 20):
    """Render a recorded trajectory to an animated GIF (record.sh analogue)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle, Rectangle

    hl, hw, gw = sp.half_length, sp.half_width, sp.goal_width
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.set_xlim(-2, hl + 3)
    ax.set_ylim(-hw - 2, hw + 2)
    ax.set_aspect("equal")
    ax.add_patch(Rectangle((0, -hw), hl, 2 * hw, fill=False, lw=1.5))
    ax.add_patch(Rectangle((hl, -gw / 2), 1.5, gw, fill=False, lw=2,
                           edgecolor="tab:red"))
    ax.invert_yaxis()  # soccer-server convention: +y is down

    T, P, _ = traj["players"].shape
    dots = [Circle((0, 0), 1.0,
                   color="tab:blue" if i < n_offense else "tab:orange")
            for i in range(P)]
    ball = Circle((0, 0), 0.5, color="black")
    for d in dots:
        ax.add_patch(d)
    ax.add_patch(ball)
    title = ax.set_title("")

    status_names = {0: "IN_GAME", 1: "GOAL", 2: "CAPTURED", 3: "OOB",
                    4: "OUT_OF_TIME"}

    def frame(t):
        for i, d in enumerate(dots):
            d.center = tuple(traj["players"][t, i])
        ball.center = tuple(traj["ball"][t])
        title.set_text(
            f"t={t}  r={traj['reward'][t].sum():+.2f}  "
            f"{status_names.get(int(traj['status'][t]), '?')}")
        return dots + [ball, title]

    anim = animation.FuncAnimation(fig, frame, frames=T, blit=False)
    anim.save(out_path, writer="pillow", fps=fps)
    plt.close(fig)
    return out_path
