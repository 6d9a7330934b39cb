"""PettingZoo ParallelEnv adapters over the multi-agent views.

API-compatible with the reference multi-agent envs
(/root/reference/sustaingym/envs/*/multiagent_env.py, PettingZoo >= 1.24):
per-agent dict obs/reward/termination, ``agents`` cleared on episode end.
"""
from __future__ import annotations

from typing import Any

import numpy as np
from gymnasium import spaces as gym_spaces
from pettingzoo import ParallelEnv

import jax
import jax.numpy as jnp

from ..core import flatdim
from ..envs.multiagent import (COGEN_AGENT_ACTION_IDX, COGEN_AGENTS,
                               MultiAgentBuildingEnv, MultiAgentCogenEnv,
                               MultiAgentEVChargingEnv, make_ma_ev_params)
from .gym import to_gym_space


class _BaseParallelAdapter(ParallelEnv):
    metadata: dict[str, Any] = {}

    def __init__(self, view, params, agents: list):
        self.view = view
        self.params = params
        self.possible_agents = list(agents)
        self.agents = self.possible_agents[:]
        self._step = jax.jit(view.step)
        self._key = jax.random.PRNGKey(0)
        self._state = None

    def _reset_state(self, seed):
        if seed is None:
            self._key, sub = jax.random.split(self._key)
            return self.view.reset(self.params, sub)
        return self._seeded_reset(seed)

    def _seeded_reset(self, seed: int):
        return self.view.reset(self.params, jax.random.PRNGKey(seed))

    def reset(self, seed: int | None = None, options: dict | None = None):
        self._state, ts = self._reset_state(seed)
        self.agents = self.possible_agents[:]
        obs = np.asarray(ts.obs)
        obss = {a: obs[i] for i, a in enumerate(self.agents)}
        infos = {a: {} for a in self.agents}
        return obss, infos

    def _assemble(self, actions: dict) -> jnp.ndarray:
        return jnp.asarray(np.stack(
            [np.asarray(actions[a], np.float32).reshape(-1)
             for a in self.possible_agents]))

    def step(self, actions: dict):
        self._key, sub = jax.random.split(self._key)
        self._state, ts = self._step(self.params, self._state,
                                     self._assemble(actions), sub)
        obs = np.asarray(ts.obs)
        reward = np.asarray(ts.reward)
        term = bool(ts.terminated)
        trunc = bool(ts.truncated)
        obss, rewards, terms, truncs, infos = {}, {}, {}, {}, {}
        for i, a in enumerate(self.possible_agents):
            obss[a] = obs[i]
            rewards[a] = float(reward[i])
            terms[a] = term
            truncs[a] = trunc
            infos[a] = {}
        if term or trunc:
            self.agents = []
        return obss, rewards, terms, truncs, infos

    def render(self) -> None:
        pass

    def close(self) -> None:
        pass

    def observation_space(self, agent):
        return self.observation_spaces[agent]

    def action_space(self, agent):
        return self.action_spaces[agent]


class MultiAgentBuildingParallelEnv(_BaseParallelAdapter):
    """Agents = AC-equipped zone indices (building/multiagent_env.py:54)."""

    def __init__(self, building: str = "OfficeSmall", weather: str = "Hot_Dry",
                 location: str = "Tucson", **kwargs):
        from ..envs.building import make_env
        base_env, params = make_env(building, weather, location, **kwargs)
        view = MultiAgentBuildingEnv(base_env)
        agents = view.agent_ids(params)
        super().__init__(view, params, agents)
        obs_space = to_gym_space(view.observation_space(params))
        self.observation_spaces = {a: obs_space for a in self.possible_agents}
        self.action_spaces = {
            a: gym_spaces.Box(-1.0, 1.0, (1,), np.float32)
            for a in self.possible_agents}

    def _seeded_reset(self, seed: int):
        epoch = self.view.base.epoch_from_seed(self.params, seed)
        return self.view.reset_at_epoch(self.params, epoch)

    def state(self):
        return np.asarray(self._state.x)


class MultiAgentCogenParallelEnv(_BaseParallelAdapter):
    """Agents GT1/GT2/GT3/ST with per-agent Dict action sub-spaces
    (cogen/multiagent_env.py:50-63)."""

    def __init__(self, **kwargs):
        from ..envs.cogen import make_env
        base_env, params = make_env(**kwargs)
        view = MultiAgentCogenEnv(base_env)
        super().__init__(view, params, list(COGEN_AGENTS))
        flat_dim = flatdim(view.observation_space(params))
        obs_space = gym_spaces.Box(-np.inf, np.inf, (flat_dim,), np.float32)
        self.observation_spaces = {a: obs_space for a in self.possible_agents}
        space = view.action_space(params)
        self.action_spaces = {}
        from .gym import CogenGymEnv  # reuse Dict-action construction
        from ..envs.cogen.env import (ACTION_KEYS, ACTION_LOW, ACTION_HIGH,
                                      BINARY_IDX, BAYS_IDX)
        full: dict[str, gym_spaces.Space] = {}
        for i, k in enumerate(ACTION_KEYS):
            if i in BINARY_IDX:
                full[k] = gym_spaces.Discrete(2)
            elif i == BAYS_IDX:
                full[k] = gym_spaces.Discrete(12, start=1)
            else:
                full[k] = gym_spaces.Box(float(ACTION_LOW[i]),
                                         float(ACTION_HIGH[i]), (1,),
                                         np.float32)
        for agent, idx in COGEN_AGENT_ACTION_IDX.items():
            self.action_spaces[agent] = gym_spaces.Dict(
                {ACTION_KEYS[i]: full[ACTION_KEYS[i]] for i in idx})
        self._action_keys = ACTION_KEYS

    def _seeded_reset(self, seed: int):
        day = self.view.base.day_from_seed(self.params, seed)
        k = jax.random.PRNGKey(seed)
        kact, kobs = jax.random.split(k)
        state, ts = self.view.base.reset_at_day(self.params, day, kact, kobs)
        # re-expand through the view
        import jax.numpy as jnp
        from ..core import flatten
        flat = flatten(self.view.base.observation_space(self.params), ts.obs)
        obs = jnp.broadcast_to(flat, (len(COGEN_AGENTS),) + flat.shape)
        return state, ts.replace(
            obs=obs, reward=jnp.zeros(len(COGEN_AGENTS), flat.dtype))

    def _assemble(self, actions: dict) -> jnp.ndarray:
        flat = np.zeros(len(self._action_keys), np.float32)
        for agent, idx in COGEN_AGENT_ACTION_IDX.items():
            for i in idx:
                flat[i] = float(np.asarray(
                    actions[agent][self._action_keys[i]]).reshape(()))
        return jnp.asarray(flat)


class MultiAgentEVChargingParallelEnv(_BaseParallelAdapter):
    """Agents = charging station ids (evcharging/multiagent_env.py:84)."""

    def __init__(self, site: str = "caltech", date_period: str = "Summer 2021",
                 periods_delay: int = 0, discrete_bins: int = -1, **kwargs):
        from ..envs.evcharging import load_site
        params = make_ma_ev_params(periods_delay=periods_delay, site=site,
                                   date_period=date_period,
                                   discrete_bins=max(discrete_bins, 0),
                                   **kwargs)
        view = MultiAgentEVChargingEnv()
        spec = load_site(site)
        super().__init__(view, params, list(spec.station_ids))
        flat_dim = flatdim(view.observation_space(params))
        obs_space = gym_spaces.Box(-np.inf, np.inf, (flat_dim,), np.float32)
        self.observation_spaces = {a: obs_space for a in self.possible_agents}
        self._discrete_bins = discrete_bins
        if discrete_bins > 0:
            act = gym_spaces.Discrete(discrete_bins)
        else:
            act = gym_spaces.Box(0.0, 1.0, (1,), np.float32)
        self.action_spaces = {a: act for a in self.possible_agents}

    def _seeded_reset(self, seed: int):
        day = self.view.base.day_from_seed(self.params.base, seed)
        return self.view.reset_at_day(self.params, day)

    def _assemble(self, actions: dict) -> jnp.ndarray:
        # discrete→continuous mapping happens inside the functional view
        # (MAEVParams.discrete_bins), not here
        arr = np.stack([np.asarray(actions[a], np.float32).reshape(-1)
                        for a in self.possible_agents])
        return jnp.asarray(arr)
