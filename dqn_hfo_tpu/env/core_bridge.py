"""ctypes bridge to the C++ reference core (dqn_hfo_tpu/core/).

Builds the shared library on demand (make) and exposes a CoreEnv with the
same reset/step semantics as env.hfo_env.HFOEnv, used by the
trajectory-parity test suite (SURVEY.md §4).  pybind11 is not available in
this image, so the boundary is a C ABI over flat float arrays.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import Optional

import numpy as np

from dqn_hfo_tpu import constants as C
from dqn_hfo_tpu.constants import DEFAULT_PARAMS, ServerParams
from dqn_hfo_tpu.env.state import EnvConfig

_CORE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "core")
_SO_PATH = os.path.join(_CORE_DIR, "libhfo_core.so")

_PARAM_FIELDS = [
    ("pitch_length", ctypes.c_float), ("pitch_width", ctypes.c_float),
    ("goal_width", ctypes.c_float), ("penalty_area_length", ctypes.c_float),
    ("penalty_area_width", ctypes.c_float), ("player_size", ctypes.c_float),
    ("ball_size", ctypes.c_float), ("kickable_margin", ctypes.c_float),
    ("catchable_area_l", ctypes.c_float), ("catchable_area_w", ctypes.c_float),
    ("tackle_dist", ctypes.c_float), ("tackle_width", ctypes.c_float),
    ("player_decay", ctypes.c_float), ("ball_decay", ctypes.c_float),
    ("player_speed_max", ctypes.c_float), ("ball_speed_max", ctypes.c_float),
    ("player_accel_max", ctypes.c_float), ("ball_accel_max", ctypes.c_float),
    ("dash_power_rate", ctypes.c_float), ("kick_power_rate", ctypes.c_float),
    ("tackle_power_rate", ctypes.c_float), ("inertia_moment", ctypes.c_float),
    ("max_power", ctypes.c_float), ("min_power", ctypes.c_float),
    ("max_moment", ctypes.c_float), ("side_dash_rate", ctypes.c_float),
    ("back_dash_rate", ctypes.c_float), ("player_rand", ctypes.c_float),
    ("ball_rand", ctypes.c_float), ("kick_rand", ctypes.c_float),
    ("stamina_max", ctypes.c_float), ("stamina_inc_max", ctypes.c_float),
    ("effort_init", ctypes.c_float), ("effort_dec_thr", ctypes.c_float),
    ("effort_dec", ctypes.c_float), ("effort_min", ctypes.c_float),
    ("effort_inc_thr", ctypes.c_float), ("effort_inc", ctypes.c_float),
    ("effort_max", ctypes.c_float), ("recover_init", ctypes.c_float),
    ("recover_dec_thr", ctypes.c_float), ("recover_dec", ctypes.c_float),
    ("recover_min", ctypes.c_float),
    ("tackle_cycles", ctypes.c_int32), ("tackle_exponent", ctypes.c_float),
    ("tackle_back_dist", ctypes.c_float),
    ("max_tackle_power", ctypes.c_float),
    ("max_back_tackle_power", ctypes.c_float),
    ("catch_probability", ctypes.c_float),
    ("frames_per_trial", ctypes.c_int32), ("untouched_time", ctypes.c_int32),
]

PLAYER_STRIDE = 9  # pos(2) vel(2) body stamina frozen effort recovery


class CParams(ctypes.Structure):
    _fields_ = _PARAM_FIELDS


class CGameConfig(ctypes.Structure):
    _fields_ = [
        ("n_players", ctypes.c_int32), ("n_offense", ctypes.c_int32),
        ("offense_agents", ctypes.c_int32), ("defense_goalie", ctypes.c_int32),
    ]


class CState(ctypes.Structure):
    _fields_ = [
        ("ball_pos", ctypes.c_float * 2), ("ball_vel", ctypes.c_float * 2),
        ("players", ctypes.c_float * (PLAYER_STRIDE * 11)),
        ("t", ctypes.c_int32), ("untouched", ctypes.c_int32),
        ("status", ctypes.c_int32), ("last_toucher_side", ctypes.c_int32),
        ("last_toucher_unum", ctypes.c_int32),
    ]


class CShaping(ctypes.Structure):
    _fields_ = [
        ("old_ball_prox", ctypes.c_float), ("old_kickable", ctypes.c_float),
        ("old_ball_dist_goal", ctypes.c_float),
        ("got_kickable", ctypes.c_int32), ("pass_active", ctypes.c_int32),
        ("old_toucher_unum", ctypes.c_int32),
        ("old_toucher_side", ctypes.c_int32), ("first_step", ctypes.c_int32),
    ]


def build_core(force: bool = False) -> str:
    """Compile the C++ core if needed; returns the .so path."""
    src = os.path.join(_CORE_DIR, "hfo_core.cpp")
    if force or not os.path.exists(_SO_PATH) or (
        os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
    ):
        subprocess.run(["make", "-s", "-C", _CORE_DIR], check=True)
    return _SO_PATH


_lib = None


def load_core():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_core())
        lib.core_default_params.argtypes = [ctypes.POINTER(CParams)]
        lib.core_step.argtypes = [
            ctypes.POINTER(CParams), ctypes.POINTER(CGameConfig),
            ctypes.POINTER(CState), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.core_observe.argtypes = [
            ctypes.POINTER(CParams), ctypes.POINTER(CGameConfig),
            ctypes.POINTER(CState), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.core_reward.argtypes = [
            ctypes.POINTER(CShaping), ctypes.POINTER(CShaping),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ]
        lib.core_initial_shaping.argtypes = [
            ctypes.POINTER(CShaping), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.core_npc_action.argtypes = [
            ctypes.POINTER(CParams), ctypes.POINTER(CGameConfig),
            ctypes.POINTER(CState), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    return _lib


def make_cparams(sp: ServerParams) -> CParams:
    cp = CParams()
    for name, _ in _PARAM_FIELDS:
        setattr(cp, name, getattr(sp, name))
    return cp


def make_cconfig(cfg: EnvConfig) -> CGameConfig:
    return CGameConfig(
        n_players=cfg.n_players, n_offense=cfg.n_offense,
        offense_agents=cfg.offense_agents,
        defense_goalie=1 if cfg.defense_goalie else 0,
    )


class CoreEnv:
    """Single-instance env backed by the C++ core, API-compatible with
    HFOEnv for parity testing.  State can be injected from a JAX EnvState."""

    NPC_POLICY_IDS = {"dummy": 0, "chaser": 1, "agent2d": 2,
                      "agent2d_teammate": 3}

    def __init__(self, cfg: EnvConfig, sp: ServerParams = DEFAULT_PARAMS,
                 noise_scale: float = 0.0, seed: int = 1,
                 npc_policy="chaser", offense_policy="dummy"):
        self.lib = load_core()
        self.cfg = cfg
        self.sp = sp
        self.cp = make_cparams(sp)
        self.cc = make_cconfig(cfg)
        self.noise_scale = noise_scale
        if isinstance(npc_policy, str):
            npc_policy = (npc_policy,) * cfg.defense_npcs
        self.npc_policy = tuple(npc_policy)
        if isinstance(offense_policy, str):
            offense_policy = (offense_policy,) * cfg.offense_npcs
        self.offense_policy = tuple(offense_policy)
        self.state = CState()
        self.shapings = [CShaping() for _ in range(cfg.offense_agents)]
        self.rng = ctypes.c_uint64(seed or 1)
        self.F = cfg.state_size

    # -- state injection from the JAX engine -------------------------------
    def set_state(self, ball_pos, ball_vel, p_pos, p_vel, p_body, p_stamina,
                  p_frozen, t=0, untouched=0, status=0,
                  last_side=C.SIDE_NONE, last_unum=-1,
                  p_effort=None, p_recovery=None):
        s = self.state
        s.ball_pos[:] = np.asarray(ball_pos, np.float32)
        s.ball_vel[:] = np.asarray(ball_vel, np.float32)
        P = self.cfg.n_players
        for i in range(P):
            base = i * PLAYER_STRIDE
            s.players[base + 0] = float(p_pos[i][0])
            s.players[base + 1] = float(p_pos[i][1])
            s.players[base + 2] = float(p_vel[i][0])
            s.players[base + 3] = float(p_vel[i][1])
            s.players[base + 4] = float(p_body[i])
            s.players[base + 5] = float(p_stamina[i])
            s.players[base + 6] = float(p_frozen[i])
            s.players[base + 7] = (float(p_effort[i]) if p_effort is not None
                                   else self.sp.effort_init)
            s.players[base + 8] = (float(p_recovery[i])
                                   if p_recovery is not None
                                   else self.sp.recover_init)
        s.t, s.untouched, s.status = int(t), int(untouched), int(status)
        s.last_toucher_side, s.last_toucher_unum = int(last_side), int(last_unum)

    def set_state_from_env(self, env_state):
        self.set_state(
            env_state.ball_pos, env_state.ball_vel, np.asarray(env_state.p_pos),
            np.asarray(env_state.p_vel), np.asarray(env_state.p_body),
            np.asarray(env_state.p_stamina), np.asarray(env_state.p_frozen),
            int(env_state.t), int(env_state.untouched), int(env_state.status),
            int(env_state.last_toucher_side), int(env_state.last_toucher_unum),
            p_effort=np.asarray(env_state.p_effort),
            p_recovery=np.asarray(env_state.p_recovery),
        )

    def observe(self, agent_idx: int = 0) -> np.ndarray:
        out = np.zeros(self.F, np.float32)
        self.lib.core_observe(
            ctypes.byref(self.cp), ctypes.byref(self.cc),
            ctypes.byref(self.state), agent_idx,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out

    def init_shaping(self):
        for a in range(self.cfg.offense_agents):
            obs = self.observe(a)
            self.lib.core_initial_shaping(
                ctypes.byref(self.shapings[a]),
                obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.state.last_toucher_unum, self.state.last_toucher_side,
            )

    def step(self, actions, arg1, arg2):
        """actions/args are per learning agent; NPC slots are filled by the
        scripted core_npc_action policies (offense NPCs: dummies; defense
        NPCs: chaser or dummies, matching HFOEnv.step)."""
        P = self.cfg.n_players
        A = self.cfg.offense_agents
        full_act = np.full(P, C.NOOP, np.int32)
        full_a1 = np.zeros(P, np.float32)
        full_a2 = np.zeros(P, np.float32)
        full_act[:A] = np.asarray(actions, np.int32)
        full_a1[:A] = np.asarray(arg1, np.float32)
        full_a2[:A] = np.asarray(arg2, np.float32)

        def npc(i, policy_id, is_goalie):
            a = ctypes.c_int32()
            p1 = ctypes.c_float()
            p2 = ctypes.c_float()
            self.lib.core_npc_action(
                ctypes.byref(self.cp), ctypes.byref(self.cc),
                ctypes.byref(self.state), i, policy_id, is_goalie,
                ctypes.byref(a), ctypes.byref(p1), ctypes.byref(p2))
            full_act[i] = a.value
            full_a1[i] = p1.value
            full_a2[i] = p2.value

        for j in range(self.cfg.offense_npcs):
            name = self.offense_policy[j]
            pid = 3 if name == "agent2d" else self.NPC_POLICY_IDS[name]
            npc(A + j, pid, 0)
        for j in range(self.cfg.defense_npcs):
            name = self.npc_policy[j]
            pid = self.NPC_POLICY_IDS[name]
            npc(self.cfg.n_offense + j, pid,
                1 if (self.cfg.defense_goalie and j == 0) else 0)
        self.lib.core_step(
            ctypes.byref(self.cp), ctypes.byref(self.cc),
            ctypes.byref(self.state),
            full_act.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            full_a1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            full_a2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(self.noise_scale), ctypes.byref(self.rng),
        )
        obs = np.stack([self.observe(a) for a in range(A)])
        rewards = np.zeros(A, np.float32)
        out5 = np.zeros(5, np.float32)
        for a in range(A):
            new_sh = CShaping()
            self.lib.core_reward(
                ctypes.byref(self.shapings[a]), ctypes.byref(new_sh),
                obs[a].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.state.status, self.state.last_toucher_unum,
                self.state.last_toucher_side, self.cfg.unum(a),
                out5.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            self.shapings[a] = new_sh
            rewards[a] = out5[0]
        return obs, rewards, int(self.state.status)
