"""The TPU-native HFO environment: reset/step pure functions + batched
auto-reset wrapper.

Replaces the reference's process/socket env loop (rcssserver subprocess +
HFO client UDP round-trips, /root/reference/src/hfo_game.cpp:22-78 and the
hot loop dqn_main.cpp:97-153) with pure functions under jit/vmap.  One env
step = one rcssserver cycle; a trial mirrors the reference server invocation
`--fullstate --frames-per-trial 500` (hfo_game.cpp:8).

Reset semantics mirror PlayOneEpisode's prologue (dqn_main.cpp:103-105):
entities are placed, a DASH(0,0) tick runs, and the shaped-reward baselines
are recorded from the resulting observation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import DEFAULT_PARAMS, ServerParams
from dqn_hfo_tpu.env import npc
from dqn_hfo_tpu.env.features import observe
from dqn_hfo_tpu.env.physics import physics_step
from dqn_hfo_tpu.env.reward import (RewardOutput, ShapingState,
                                    initial_shaping, shaping_step)
from dqn_hfo_tpu.env.state import EnvConfig, EnvState

F32 = jnp.float32


class StepInfo(NamedTuple):
    reward: jnp.ndarray        # (A,) shaped reward
    extrinsic: jnp.ndarray     # (A,) EOT-only reward
    pass_reward: jnp.ndarray   # (A,) pass detection (logged, not in total —
                               # the hfo_game.cpp:178-180 quirk)
    status: jnp.ndarray        # () i32, status of this step (pre-reset)
    done: jnp.ndarray          # () bool
    steps: jnp.ndarray         # () i32, trial step count at this transition


class HFOEnv:
    """Single-instance env; `vmap` via VecHFOEnv for batches."""

    def __init__(self, cfg: EnvConfig, sp: ServerParams = DEFAULT_PARAMS,
                 noise_scale: float = 1.0, npc_policy="chaser",
                 offense_policy="dummy"):
        """npc_policy: one policy name for every defender ("agent2d"/
        "chaser"/"dummy") or a per-defender sequence of names, length
        cfg.defense_npcs — mixed-topology parity with the reference's
        separate agent2d / chaser / dummy-goalie processes
        (dqn_main.cpp:427-436).  offense_policy: same for the offense NPC
        slots ("agent2d" = moving/passing teammate, "dummy" = NOOP)."""
        self.cfg = cfg
        self.sp = sp
        self.noise_scale = noise_scale
        if isinstance(npc_policy, str):
            npc_policy = (npc_policy,) * cfg.defense_npcs
        self.npc_policy = tuple(npc_policy)
        assert len(self.npc_policy) == cfg.defense_npcs
        if isinstance(offense_policy, str):
            offense_policy = (offense_policy,) * cfg.offense_npcs
        self.offense_policy = tuple(offense_policy)
        assert len(self.offense_policy) == cfg.offense_npcs
        self.agent_unums = jnp.asarray(
            [cfg.unum(i) for i in range(cfg.offense_agents)], jnp.int32
        )

    # ------------------------------------------------------------------ reset
    def reset(self, key):
        cfg, sp = self.cfg, self.sp
        P, A = cfg.n_players, cfg.offense_agents
        kbx, kby, kpx, kpy, kdy, ktick, khold, knext = jax.random.split(key, 8)

        ball_x = jax.random.uniform(
            kbx, (), F32, cfg.ball_x_min, cfg.ball_x_max
        ) * sp.half_length
        ball_y = jax.random.uniform(kby, (), F32, -0.4, 0.4) * sp.half_width
        ball_pos = jnp.stack([ball_x, ball_y])

        # Offense spawn in the back of the offensive half; defense in front of
        # their goal (goalie pinned on the goal line).
        off_x = jax.random.uniform(kpx, (P,), F32, 0.0, 0.2) * sp.half_length
        off_y = jax.random.uniform(kpy, (P,), F32, -0.4, 0.4) * sp.half_width
        def_x = jnp.full((P,), 0.75 * sp.half_length)
        def_y = jax.random.uniform(kdy, (P,), F32, -0.2, 0.2) * sp.half_width
        is_off = jnp.arange(P) < cfg.n_offense
        px = jnp.where(is_off, off_x, def_x)
        py = jnp.where(is_off, off_y, def_y)
        if cfg.defense_npcs > 0 and cfg.defense_goalie:
            g = cfg.n_offense
            px = px.at[g].set(sp.half_length - 1.5)
            py = py.at[g].set(0.0)
        p_pos = jnp.stack([px, py], axis=-1)
        if cfg.offense_on_ball > 0:
            # HFO semantics (bin/HFO --offense-on-ball): player index if it
            # names an existing offense player, otherwise a RANDOM offense
            # player each episode (the reference's 2v1 runs pass 10 with 2
            # offense agents for exactly this, train.sh:41-53).
            if cfg.offense_on_ball > cfg.n_offense:
                holder = jax.random.randint(khold, (), 0, cfg.n_offense)
            else:
                holder = cfg.offense_on_ball - 1
            p_pos = p_pos.at[holder].set(
                ball_pos + jnp.asarray([-0.5 * sp.kickable_area, 0.0], F32)
            )
        p_body = jnp.where(is_off, 0.0, jnp.pi).astype(F32)

        a_f = jnp.zeros((A,), F32)
        state = EnvState(
            ball_pos=ball_pos,
            ball_vel=jnp.zeros((2,), F32),
            p_pos=p_pos,
            p_vel=jnp.zeros((P, 2), F32),
            p_body=p_body,
            p_stamina=jnp.full((P,), sp.stamina_max, F32),
            p_effort=jnp.full((P,), sp.effort_init, F32),
            p_recovery=jnp.full((P,), sp.recover_init, F32),
            p_frozen=jnp.zeros((P,), jnp.int32),
            t=jnp.asarray(0, jnp.int32),
            untouched=jnp.asarray(0, jnp.int32),
            status=jnp.asarray(C.IN_GAME, jnp.int32),
            last_toucher_side=jnp.asarray(C.SIDE_NONE, jnp.int32),
            last_toucher_unum=jnp.asarray(-1, jnp.int32),
            sh_old_ball_prox=a_f,
            sh_old_kickable=a_f,
            sh_old_ball_dist_goal=a_f,
            sh_got_kickable=jnp.zeros((A,), bool),
            sh_pass_active=jnp.zeros((A,), bool),
            sh_old_toucher_unum=jnp.full((A,), -1, jnp.int32),
            sh_old_toucher_side=jnp.full((A,), C.SIDE_NONE, jnp.int32),
            sh_first_step=jnp.ones((A,), bool),
            rng=knext,
        )

        # Baseline tick: agents DASH(0,0), NPCs NOOP (dqn_main.cpp:104-105).
        act = jnp.where(jnp.arange(P) < A, C.DASH, C.NOOP).astype(jnp.int32)
        state, _ = physics_step(
            sp, cfg, state, act, jnp.zeros((P,), F32), jnp.zeros((P,), F32),
            ktick, self.noise_scale,
        )
        obs = self._observe_all(state)
        sh = jax.vmap(initial_shaping, in_axes=(0, None, None))(
            obs, state.last_toucher_unum, state.last_toucher_side
        )
        state = self._write_shaping(state, sh)
        return state, obs

    # ------------------------------------------------------------------- step
    def step(self, state: EnvState, actions, arg1, arg2, arg3=None):
        """Advance one cycle.

        Args:
          actions: (A,) i32 action ids for the learning agents — low-level
            (DASH/TURN/TACKLE/KICK/CATCH/NOOP) or mid-level macros
            (KICK_TO/MOVE_TO/DRIBBLE_TO/INTERCEPT, expanded in-graph).
          arg1, arg2, arg3: (A,) f32 parameters (arg3: KICK_TO speed).
        Returns: (new_state, obs (A,F), StepInfo)
        """
        cfg, sp = self.cfg, self.sp
        P, A = cfg.n_players, cfg.offense_agents
        if arg3 is None:
            arg3 = jnp.zeros_like(arg1)

        full_act = jnp.zeros((P,), jnp.int32).at[:A].set(actions)
        full_a1 = jnp.zeros((P,), F32).at[:A].set(arg1)
        full_a2 = jnp.zeros((P,), F32).at[:A].set(arg2)
        full_a3 = jnp.zeros((P,), F32).at[:A].set(arg3)

        # Offense NPCs: agent2d-style teammates or NOOP dummies.
        for i in range(A, cfg.n_offense):
            if self.offense_policy[i - A] == "agent2d":
                a, p1, p2 = npc.agent2d_teammate_action(sp, cfg, state, i)
                full_act = full_act.at[i].set(a)
                full_a1 = full_a1.at[i].set(p1)
                full_a2 = full_a2.at[i].set(p2)
            else:
                full_act = full_act.at[i].set(C.NOOP)
        # Defense NPCs: agent2d defenders, chasers, or dummies.
        for j in range(cfg.defense_npcs):
            i = cfg.n_offense + j
            is_goalie = cfg.defense_goalie and j == 0
            if self.npc_policy[j] == "agent2d":
                a, p1, p2 = npc.agent2d_defender_action(sp, state, i,
                                                        is_goalie)
            elif self.npc_policy[j] == "chaser":
                a, p1, p2 = npc.chaser_action(sp, state, i, is_goalie)
            else:
                full_act = full_act.at[i].set(C.NOOP)
                continue
            full_act = full_act.at[i].set(a)
            full_a1 = full_a1.at[i].set(p1)
            full_a2 = full_a2.at[i].set(p2)

        # Expand mid-level macros (no-op for low-level ids).
        from dqn_hfo_tpu.env.midlevel import expand_midlevel
        full_act, full_a1, full_a2 = expand_midlevel(
            sp, cfg, state, full_act, full_a1, full_a2, full_a3)

        knoise, knext = jax.random.split(state.rng)
        state = self._replace_rng(state, knext)
        new_state, _ = physics_step(
            sp, cfg, state, full_act, full_a1, full_a2, knoise, self.noise_scale
        )
        obs = self._observe_all(new_state)

        sh = ShapingState(
            old_ball_prox=state.sh_old_ball_prox,
            old_kickable=state.sh_old_kickable,
            old_ball_dist_goal=state.sh_old_ball_dist_goal,
            got_kickable=state.sh_got_kickable,
            pass_active=state.sh_pass_active,
            old_toucher_unum=state.sh_old_toucher_unum,
            old_toucher_side=state.sh_old_toucher_side,
            first_step=state.sh_first_step,
        )
        new_sh, rout = jax.vmap(
            shaping_step, in_axes=(0, 0, None, None, None, 0)
        )(sh, obs, new_state.status, new_state.last_toucher_unum,
          new_state.last_toucher_side, self.agent_unums)
        new_state = self._write_shaping(new_state, new_sh)

        info = StepInfo(
            reward=rout.total,
            extrinsic=rout.extrinsic,
            pass_reward=rout.pass_reward,
            status=new_state.status,
            done=new_state.status != C.IN_GAME,
            steps=new_state.t,
        )
        return new_state, obs, info

    # ---------------------------------------------------------------- helpers
    def _observe_all(self, state):
        return jnp.stack(
            [observe(self.sp, self.cfg, state, a)
             for a in range(self.cfg.offense_agents)]
        )

    @staticmethod
    def _write_shaping(state: EnvState, sh: ShapingState) -> EnvState:
        import dataclasses
        return dataclasses.replace(
            state,
            sh_old_ball_prox=sh.old_ball_prox,
            sh_old_kickable=sh.old_kickable,
            sh_old_ball_dist_goal=sh.old_ball_dist_goal,
            sh_got_kickable=sh.got_kickable,
            sh_pass_active=sh.pass_active,
            sh_old_toucher_unum=sh.old_toucher_unum,
            sh_old_toucher_side=sh.old_toucher_side,
            sh_first_step=sh.first_step,
        )

    @staticmethod
    def _replace_rng(state: EnvState, rng) -> EnvState:
        import dataclasses
        return dataclasses.replace(state, rng=rng)


class VecHFOEnv:
    """Batched auto-resetting env: B lockstep instances under vmap.

    Auto-reset replaces the reference server's immediate new-trial behavior;
    when a trial ends, the returned obs is the first obs of the fresh trial
    while StepInfo carries the terminal status/reward of the finished one.
    """

    def __init__(self, env: HFOEnv, batch: int):
        self.env = env
        self.batch = batch
        # Jitted: on a remote-tunneled backend, eager vmap dispatches each
        # physics primitive as its own tiny compiled program — minutes of
        # compile for one reset.  One jit = one compile.
        self._reset = jax.jit(
            lambda keys: jax.vmap(self.env.reset)(keys))

    def reset(self, key):
        keys = jax.random.split(key, self.batch)
        return self._reset(keys)

    def step(self, states, actions, arg1, arg2, arg3=None):
        if arg3 is None:
            arg3 = jnp.zeros_like(arg1)
        new_states, obs, info = jax.vmap(self.env.step)(
            states, actions, arg1, arg2, arg3
        )
        # Auto-reset finished trials using each env's own rng stream.
        reset_keys = jax.vmap(lambda s: jax.random.fold_in(s.rng, 7))(new_states)
        fresh_states, fresh_obs = jax.vmap(self.env.reset)(reset_keys)
        done = info.done

        def sel(a, b):
            d = done.reshape(done.shape + (1,) * (a.ndim - 1))
            return jnp.where(d, a, b)

        out_states = jax.tree_util.tree_map(sel, fresh_states, new_states)
        out_obs = sel(fresh_obs, obs)
        return out_states, out_obs, info

    # ------------------------------------------------------- banked auto-reset
    def bank_rounds(self, chunk_len: int) -> int:
        """Reset-bank depth for a chunk of `chunk_len` steps: sized so an
        env can finish trials 8x faster than the frames_per_trial cap before
        any within-chunk bank-entry reuse (reuse = a repeated start state,
        not an invalid one). Clamped to [2, 32]."""
        import math
        fpt = max(int(self.env.sp.frames_per_trial), 1)
        return max(2, min(32, math.ceil(8.0 * chunk_len / fpt)))

    def make_reset_bank(self, key, rounds: int):
        """Precompute `rounds` fresh reset states per env: (R, B, ...) states
        + (R, B, A, F) obs.  step_banked consumes one per done event, making
        auto-reset O(R*B) per chunk instead of O(K*B) — the per-step
        vmap(reset) in `step` costs about as much as the step itself."""
        keys = jax.random.split(key, rounds * self.batch)
        keys = keys.reshape((rounds, self.batch) + keys.shape[1:])
        return jax.vmap(jax.vmap(self.env.reset))(keys)

    def step_banked(self, states, counters, bank, actions, arg1, arg2,
                    arg3=None):
        """Auto-resetting step that pulls fresh trials from a precomputed
        reset bank.  `counters` (B,) i32 counts resets per env; env b's i-th
        reset uses bank[i % R, b].  An env that finishes more than R trials
        in one bank lifetime revisits a bank entry (a repeated start state,
        not an invalid one) — callers regenerate the bank every chunk, so
        with R >= chunk_len/typical_episode_len this is rare.

        Returns (new_states, new_counters, obs, info) — same contract as
        `step` otherwise.
        """
        if arg3 is None:
            arg3 = jnp.zeros_like(arg1)
        bank_states, bank_obs = bank
        R = bank_obs.shape[0]
        B = self.batch
        new_states, obs, info = jax.vmap(self.env.step)(
            states, actions, arg1, arg2, arg3
        )
        rows = jnp.arange(B)
        idx = jnp.mod(counters, R)
        fresh_states = jax.tree_util.tree_map(
            lambda x: x[idx, rows], bank_states)
        fresh_obs = bank_obs[idx, rows]
        done = info.done

        def sel(a, b):
            d = done.reshape(done.shape + (1,) * (a.ndim - 1))
            return jnp.where(d, a, b)

        out_states = jax.tree_util.tree_map(sel, fresh_states, new_states)
        out_obs = sel(fresh_obs, obs)
        return out_states, counters + done.astype(jnp.int32), out_obs, info

    def step_absorb(self, states, actions, arg1, arg2, arg3=None):
        """Evaluation stepping: finished trials freeze (no reset, no reward).
        Mirrors the fixed-horizon evaluation loop (dqn_main.cpp:171-204)."""
        if arg3 is None:
            arg3 = jnp.zeros_like(arg1)
        prev_done = states.status != C.IN_GAME
        new_states, obs, info = jax.vmap(self.env.step)(
            states, actions, arg1, arg2, arg3
        )

        def sel(old, new):
            d = prev_done.reshape(prev_done.shape + (1,) * (new.ndim - 1))
            return jnp.where(d, old, new)

        out_states = jax.tree_util.tree_map(sel, states, new_states)
        info = StepInfo(
            reward=jnp.where(prev_done[:, None], 0.0, info.reward),
            extrinsic=jnp.where(prev_done[:, None], 0.0, info.extrinsic),
            pass_reward=jnp.where(prev_done[:, None], 0.0, info.pass_reward),
            status=jnp.where(prev_done, states.status, info.status),
            done=jnp.where(prev_done, True, info.done),
            steps=jnp.where(prev_done, states.t, info.steps),
        )
        return out_states, obs, info
