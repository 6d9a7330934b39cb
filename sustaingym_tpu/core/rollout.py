"""Rollout drivers: lax.scan over time, vmap over env batch.

The episode loop of the reference (`BaseAlgorithm.run`,
/root/reference/sustaingym/algorithms/base.py:64-88) becomes a single
compiled program: ``scan`` over the time axis with the env batch vmapped
(and optionally sharded over a device mesh by the caller via pjit).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .env import FunctionalEnv, TimeStep, autoreset_step, autoreset_vstep

__all__ = ["rollout", "batch_rollout", "batch_reset", "episode_return",
           "random_policy"]

PolicyFn = Callable[[Any, Any, jax.Array], Any]
# policy(policy_params, obs, key) -> action


def rollout(env: FunctionalEnv, params, policy: PolicyFn, policy_params,
            key: jax.Array, num_steps: int, auto_reset: bool = True
            ) -> tuple[Any, TimeStep]:
    """Rolls one env instance forward ``num_steps`` under ``policy``.

    Resets internally. Returns (final_state, traj) where ``traj`` leaves
    carry a leading time axis of length ``num_steps``.
    """
    step_fn = autoreset_step(env) if auto_reset else env.step

    def body(carry, key_t):
        state, obs = carry
        key_act, key_env = jax.random.split(key_t)
        action = policy(policy_params, obs, key_act)
        state, ts = step_fn(params, state, action, key_env)
        return (state, ts.obs), ts

    key_init, key_scan = jax.random.split(key)
    state, ts0 = env.reset(params, key_init)
    keys = jax.random.split(key_scan, num_steps)
    (state, _), traj = jax.lax.scan(body, (state, ts0.obs), keys)
    return state, traj


def batch_reset(env: FunctionalEnv, params, key: jax.Array, batch: int):
    """vmap-reset ``batch`` env instances (shared params)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(env.reset, in_axes=(None, 0))(params, keys)


def batch_rollout(env: FunctionalEnv, params, policy: PolicyFn, policy_params,
                  key: jax.Array, batch: int, num_steps: int,
                  auto_reset: bool = True, fast: bool = True) -> TimeStep:
    """Rolls ``batch`` env instances for ``num_steps`` in lockstep.

    ``policy`` receives batched observations (leading axis = batch) and must
    return batched actions. Returned ``TimeStep`` leaves have shape
    [num_steps, batch, ...]. This is the engine's throughput primitive
    (BASELINE.json configs: "CogenEnv vmapped batch 1024" etc.).

    Envs with fixed episode lengths may provide a ``batch_unroll`` lockstep
    specialization (same PRNG stream, bit-identical trajectories) that
    replaces per-step exogenous-data gathers with per-episode prefetches;
    it is used whenever ``fast`` and ``auto_reset`` are set.
    """
    unroll = getattr(env, "batch_unroll", None)
    if fast and auto_reset and unroll is not None:
        return unroll(params, policy, policy_params, key, batch, num_steps)
    # batched autoreset gates the per-env reset behind a scalar any(done)
    # cond (bit-identical trajectories, ~40% less rollout device time)
    vstep = (autoreset_vstep(env) if auto_reset
             else jax.vmap(env.step, in_axes=(None, 0, 0, 0)))

    key_init, key_scan = jax.random.split(key)
    states, ts0 = batch_reset(env, params, key_init, batch)

    def body(carry, key_t):
        states, obs = carry
        key_act, key_env = jax.random.split(key_t)
        actions = policy(policy_params, obs, key_act)
        env_keys = jax.random.split(key_env, batch)
        states, ts = vstep(params, states, actions, env_keys)
        return (states, ts.obs), ts

    keys = jax.random.split(key_scan, num_steps)
    (_, _), traj = jax.lax.scan(body, (states, ts0.obs), keys)
    return traj


def episode_return(traj: TimeStep) -> jax.Array:
    """Sums rewards over the time axis (axis 0)."""
    return jnp.sum(traj.reward, axis=0)


def random_policy(env: FunctionalEnv, params, batch: int | None = None
                  ) -> PolicyFn:
    """Key-based uniform-random policy over the env's action space.

    With ``batch`` set, returns a batched policy for ``batch_rollout``.
    """
    space = env.action_space(params)

    def policy(_, obs, key):
        if batch is None:
            return space.sample(key)
        return space.sample_batch(key, batch)

    return policy
