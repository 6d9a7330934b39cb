"""Gymnasium adapters: the classic imperative API over the functional core.

A user of the reference can keep their loop:

    import gymnasium as gym
    import sustaingym_tpu.compat  # registers IDs
    env = gym.make('sustaingym/Building-v0')
    obs, info = env.reset(seed=0)
    obs, r, term, trunc, info = env.step(action)

Seed semantics mirror the reference exactly where the reference is
deterministic: building seed->epoch (env.py:339-345), cogen/ev/market
seed->day (cogen/env.py:214-216, event_generation.py:273-281).
"""
from __future__ import annotations

from typing import Any

import gymnasium
import numpy as np

import jax
import jax.numpy as jnp

from ..core import spaces as core_spaces


def to_gym_space(space: core_spaces.Space) -> gymnasium.spaces.Space:
    if isinstance(space, core_spaces.Box):
        return gymnasium.spaces.Box(
            low=space.low.astype(np.float32), high=space.high.astype(np.float32),
            dtype=np.float32)
    if isinstance(space, core_spaces.Discrete):
        return gymnasium.spaces.Discrete(space.n, start=space.start)
    if isinstance(space, core_spaces.MultiDiscrete):
        return gymnasium.spaces.MultiDiscrete(space.nvec)
    if isinstance(space, core_spaces.DictSpace):
        return gymnasium.spaces.Dict(
            {k: to_gym_space(v) for k, v in space.items()})
    raise TypeError(f"unknown space {space}")


class FunctionalGymEnv(gymnasium.Env):
    """Wraps (FunctionalEnv, params) into a gymnasium.Env.

    Subclasses set ``breakdown_keys`` (info entries accumulated into
    info['reward_breakdown'] like the reference envs do) and may override
    ``_seeded_reset`` / ``_convert_action`` / ``_convert_obs``.
    """

    metadata: dict[str, Any] = {}
    breakdown_keys: tuple[str, ...] = ()

    def __init__(self, env, params):
        self.fenv = env
        self.params = params
        self.observation_space = to_gym_space(env.observation_space(params))
        self.action_space = to_gym_space(env.action_space(params))
        self._step = jax.jit(env.step)
        self._key = jax.random.PRNGKey(0)
        self._state = None
        self._breakdown: dict[str, float] = {}

    # -- overridables -----------------------------------------------------
    def _seeded_reset(self, seed: int):
        return self.fenv.reset(self.params, jax.random.PRNGKey(seed))

    def _convert_action(self, action):
        return jnp.asarray(action)

    def _convert_obs(self, obs):
        if isinstance(obs, dict):
            return {k: np.asarray(v) for k, v in obs.items()}
        return np.asarray(obs)

    # -- gymnasium API ----------------------------------------------------
    def reset(self, *, seed: int | None = None, options: dict | None = None):
        super().reset(seed=seed)
        if seed is None:
            self._key, sub = jax.random.split(self._key)
            self._state, ts = self.fenv.reset(self.params, sub)
        else:
            self._state, ts = self._seeded_reset(seed)
        self._breakdown = {k: 0.0 for k in self.breakdown_keys}
        return self._convert_obs(ts.obs), self._info(ts)

    def step(self, action):
        self._key, sub = jax.random.split(self._key)
        self._state, ts = self._step(self.params, self._state,
                                     self._convert_action(action), sub)
        for k in self.breakdown_keys:
            self._breakdown[k] += float(np.asarray(ts.info[k]))
        return (self._convert_obs(ts.obs), float(ts.reward),
                bool(ts.terminated), bool(ts.truncated), self._info(ts))

    def _info(self, ts) -> dict[str, Any]:
        info = {k: np.asarray(v) for k, v in ts.info.items()}
        if self.breakdown_keys:
            info["reward_breakdown"] = dict(self._breakdown)
        return info


class BuildingGymEnv(FunctionalGymEnv):
    breakdown_keys = ("comfort_level", "power_consumption")

    def __init__(self, building: str = "OfficeSmall", weather: str = "Hot_Dry",
                 location: str = "Tucson", **kwargs):
        from ..envs.building import make_env
        env, params = make_env(building, weather, location, **kwargs)
        super().__init__(env, params)

    def _seeded_reset(self, seed: int):
        epoch = self.fenv.epoch_from_seed(self.params, seed)
        return self.fenv.reset_at_epoch(self.params, epoch)


class CogenGymEnv(FunctionalGymEnv):
    def __init__(self, **kwargs):
        from ..envs.cogen import ACTION_KEYS, make_env
        from ..core import Box, DictSpace, Discrete
        from ..envs.cogen.env import ACTION_LOW, ACTION_HIGH, BINARY_IDX, BAYS_IDX
        env, params = make_env(**kwargs)
        self._keys = ACTION_KEYS
        self._binary = set(BINARY_IDX)
        self._bays = BAYS_IDX
        super().__init__(env, params)
        # Dict action space mirroring the reference (cogen/env.py:114-130)
        comps: dict[str, gymnasium.spaces.Space] = {}
        for i, k in enumerate(ACTION_KEYS):
            if i in self._binary:
                comps[k] = gymnasium.spaces.Discrete(2)
            elif i == self._bays:
                comps[k] = gymnasium.spaces.Discrete(12, start=1)
            else:
                comps[k] = gymnasium.spaces.Box(
                    float(ACTION_LOW[i]), float(ACTION_HIGH[i]), (1,),
                    np.float32)
        self.action_space = gymnasium.spaces.Dict(comps)

    def _seeded_reset(self, seed: int):
        day = self.fenv.day_from_seed(self.params, seed)
        k = jax.random.PRNGKey(seed)
        return self.fenv.reset_at_day(self.params, day,
                                      *jax.random.split(k))

    def _convert_action(self, action):
        if isinstance(action, dict):
            flat = np.zeros(len(self._keys), np.float32)
            for i, k in enumerate(self._keys):
                v = action[k]
                flat[i] = float(np.asarray(v).reshape(()))
            return jnp.asarray(flat)
        return jnp.asarray(action)

    def _convert_obs(self, obs):
        out = {k: np.asarray(v) for k, v in obs.items()}
        # expand Prev_Action back into the reference's dict layout
        pa = out.pop("Prev_Action")
        out["Prev_Action"] = {
            k: (int(round(float(pa[i]))) if (i in self._binary
                                             or i == self._bays)
                else np.asarray([pa[i]], np.float32))
            for i, k in enumerate(self._keys)}
        return out


class EVChargingGymEnv(FunctionalGymEnv):
    breakdown_keys = ("profit", "carbon_cost", "excess_charge")

    def __init__(self, site: str = "caltech", date_period: str = "Summer 2021",
                 **kwargs):
        from ..envs.evcharging import make_env
        env, params = make_env(site=site, date_period=date_period, **kwargs)
        super().__init__(env, params)

    def _seeded_reset(self, seed: int):
        day = self.fenv.day_from_seed(self.params, seed)
        return self.fenv.reset_at_day(self.params, day)


class ElectricityMarketGymEnv(FunctionalGymEnv):
    breakdown_keys = ("revenue", "carbon_value", "terminal_cost")

    def __init__(self, **kwargs):
        from ..envs.electricitymarket import make_env
        env, params = make_env(**kwargs)
        super().__init__(env, params)

    def _seeded_reset(self, seed: int):
        day = self.fenv.day_from_seed(self.params, seed)
        return self.fenv.reset_at_day(self.params, day)


class DataCenterGymEnv(FunctionalGymEnv):
    breakdown_keys = ("carbon_cost", "delay_penalty")

    def __init__(self, **kwargs):
        from ..envs.datacenter import make_env
        env, params = make_env(**kwargs)
        super().__init__(env, params)

    def _seeded_reset(self, seed: int):
        month = self.fenv.month_from_seed(self.params, seed)
        return self.fenv.reset_at_month(self.params, month)


class DiscreteActionWrapper(gymnasium.ActionWrapper):
    """Maps Discrete/MultiDiscrete(bins) -> continuous [0, 1] via
    a / (bins - 1) (mirrors /root/reference/sustaingym/envs/wrappers.py:13-45)."""

    def __init__(self, env: gymnasium.Env, bins: int = 5):
        if not isinstance(env.action_space, gymnasium.spaces.Box):
            raise ValueError("Should only be used to wrap continuous env")
        super().__init__(env)
        self._bins = bins
        self._cont_dtype = env.action_space.dtype
        dims = env.action_space.shape
        if len(dims) == 0:
            self.action_space = gymnasium.spaces.Discrete(bins)
        else:
            self.action_space = gymnasium.spaces.MultiDiscrete(
                np.ones(dims, dtype=np.int64) * bins)

    def action(self, action):
        return np.asarray(action, dtype=self._cont_dtype) / (self._bins - 1)


class FunctionalVectorGymEnv(gymnasium.vector.VectorEnv):
    """``gymnasium.vector.VectorEnv`` over ONE jitted vmapped device program.

    The host-API analogue of the reference's SB3 ``SubprocVecEnv`` of 4
    worker processes (/root/reference/examples/evcharging/
    train_stable_baselines.py:275) — here ``num_envs`` can be thousands
    because the batch lives on-device and each ``step()`` call is a single
    dispatch of the vmapped autoreset step.

    Autoreset semantics are FUNCTIONAL (same-step): when an episode ends,
    the returned obs is already the next episode's reset obs and
    terminated/truncated flag that boundary — matching
    ``core.env.autoreset_step`` (and gymnasium's classic VectorEnv
    behavior, not the v1.0 one-step-delayed variant).
    """

    metadata: dict[str, Any] = {}

    def __init__(self, env, params, num_envs: int, seed: int = 0):
        from ..core.env import autoreset_step

        self.fenv = env
        self.params = params
        self.num_envs = int(num_envs)
        self.single_observation_space = to_gym_space(
            env.observation_space(params))
        self.single_action_space = to_gym_space(env.action_space(params))
        self.observation_space = gymnasium.vector.utils.batch_space(
            self.single_observation_space, self.num_envs)
        self.action_space = gymnasium.vector.utils.batch_space(
            self.single_action_space, self.num_envs)
        self._vreset = jax.jit(jax.vmap(env.reset, in_axes=(None, 0)))
        self._vstep = jax.jit(
            jax.vmap(autoreset_step(env), in_axes=(None, 0, 0, 0)))
        self._key = jax.random.PRNGKey(seed)
        self._states = None

    def _convert_obs(self, obs):
        if isinstance(obs, dict):
            return {k: np.asarray(v) for k, v in obs.items()}
        return np.asarray(obs)

    def reset(self, *, seed: int | None = None, options: dict | None = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self.num_envs)
        self._states, ts = self._vreset(self.params, keys)
        return self._convert_obs(ts.obs), {}

    def step(self, actions):
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self.num_envs)
        self._states, ts = self._vstep(self.params, self._states,
                                       jnp.asarray(actions), keys)
        info = {k: np.asarray(v) for k, v in ts.info.items()}
        return (self._convert_obs(ts.obs), np.asarray(ts.reward),
                np.asarray(ts.terminated), np.asarray(ts.truncated), info)

    def close(self, **kwargs):
        pass


def make_vec(name: str, num_envs: int, seed: int = 0,
             **kwargs) -> FunctionalVectorGymEnv:
    """``make_vec('building', 1024)`` -> vectorized gymnasium env."""
    from .. import make as _make
    env, params = _make(name, **kwargs)
    return FunctionalVectorGymEnv(env, params, num_envs, seed=seed)
