"""Sharded PPO learner tests (CPU mesh of 8 virtual devices)."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sustaingym_tpu import make
from sustaingym_tpu.parallel import (PPOConfig, init_policy, make_mesh,
                                     policy_apply, train)
from sustaingym_tpu.parallel.ppo import _shard_carry, make_train_step
from sustaingym_tpu.parallel.mesh import data_sharding, replicated


def test_policy_shapes():
    p = init_policy(jax.random.PRNGKey(0), obs_dim=10, act_dim=6, hidden=32)
    mu, log_std, v = policy_apply(p, jnp.zeros((4, 10)))
    assert mu.shape == (4, 6) and log_std.shape == (6,) and v.shape == (4,)


def test_train_step_runs_and_updates():
    env, params = make("building")
    cfg = PPOConfig(num_envs=16, rollout_len=8, hidden=32, epochs=1,
                    minibatches=2)
    init_state, train_step = make_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    before = np.asarray(carry["policy"]["mu"]["w"]).copy()
    carry, metrics = jax.jit(train_step)(carry, jax.random.PRNGKey(1))
    after = np.asarray(carry["policy"]["mu"]["w"])
    assert not np.allclose(before, after)
    assert np.isfinite(metrics["mean_reward"])


class _QuadTrackEnv:
    """Minimal stationary env with a deterministic learnable optimum:
    reward = -||action - 0.3 * obs||^2. Validates the PPO update math
    end-to-end without BuildingEnv's weather-episode reward variance."""

    from sustaingym_tpu.core import Box, TimeStep

    def __init__(self, dim=4):
        self.dim = dim

    def observation_space(self, params):
        from sustaingym_tpu.core import Box
        return Box(-1, 1, (self.dim,))

    def action_space(self, params):
        from sustaingym_tpu.core import Box
        return Box(-1, 1, (self.dim,))

    def reset(self, params, key):
        from sustaingym_tpu.core import TimeStep
        obs = jax.random.uniform(key, (self.dim,), minval=-1, maxval=1)
        ts = TimeStep(obs=obs, reward=jnp.zeros(()),
                      terminated=jnp.zeros((), bool),
                      truncated=jnp.zeros((), bool), info={})
        return obs, ts

    def step(self, params, state, action, key):
        from sustaingym_tpu.core import TimeStep
        reward = -jnp.sum((action - 0.3 * state) ** 2)
        obs = jax.random.uniform(key, (self.dim,), minval=-1, maxval=1)
        ts = TimeStep(obs=obs, reward=reward,
                      terminated=jnp.zeros((), bool),
                      truncated=jnp.zeros((), bool), info={})
        return obs, ts


def test_ppo_learns_quadratic_tracking():
    env = _QuadTrackEnv()
    cfg = PPOConfig(num_envs=64, rollout_len=16, hidden=32, epochs=4,
                    minibatches=4, lr=3e-3, gamma=0.0, lam=0.0)
    carry, history = train(env, None, cfg, jax.random.PRNGKey(0),
                           num_iterations=25, verbose=False)
    first = np.mean([h["mean_reward"] for h in history[:3]])
    last = np.mean([h["mean_reward"] for h in history[-3:]])
    assert last > first + 0.2, (first, last)


def test_sharded_train_step_matches_mesh():
    n = len(jax.devices())
    assert n == 8, "conftest should provide 8 virtual CPU devices"
    mesh = make_mesh(8, mp=2)
    env, params = make("building")
    cfg = PPOConfig(num_envs=16, rollout_len=4, hidden=64, epochs=1,
                    minibatches=2)
    init_state, train_step = make_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    carry = _shard_carry(carry, mesh, data_sharding(mesh), replicated(mesh))
    # hidden axis of trunk1 sharded over mp
    sh = carry["policy"]["trunk1"]["w"].sharding
    assert "mp" in str(sh.spec)
    carry, metrics = jax.jit(train_step)(carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["mean_reward"]))


def test_ppo_multiagent_ev_smoke():
    """Shared-policy PPO over the agent-axis MA EV view: the agent axis is
    extra batch, act_dim is per-agent (the batched analogue of the
    reference's per-agent RLLib policies, train_rllib.py:119-132)."""
    import sustaingym_tpu as sg
    from sustaingym_tpu.parallel import PPOConfig
    from sustaingym_tpu.parallel.ppo import make_train_step

    env, params = sg.make("evcharging-multiagent", periods_delay=1,
                          project_action=False)
    cfg = PPOConfig(num_envs=4, rollout_len=6, hidden=32, epochs=1,
                    minibatches=2)
    init_state, train_step = make_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    n_agents = params.base.n_stations
    assert carry["obs"].shape[1] == n_agents
    carry, metrics = jax.jit(train_step)(carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["pg_loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))


def test_ppo_multiagent_building_smoke():
    import sustaingym_tpu as sg
    from sustaingym_tpu.parallel import PPOConfig
    from sustaingym_tpu.parallel.ppo import make_train_step

    env, params = sg.make("building-multiagent")
    cfg = PPOConfig(num_envs=4, rollout_len=5, hidden=32, epochs=1,
                    minibatches=1)
    init_state, train_step = make_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    carry, metrics = jax.jit(train_step)(carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["mean_reward"]))


def test_ppo_multiagent_ev_sharded_mesh():
    """The BASELINE ladder's top config: multi-agent EVCharging sharded over
    a device mesh feeding the PPO learner — env batch + trajectories over
    'dp', tensor-parallel MLP over 'mp' (8 virtual CPU devices in CI; the
    identical program spans real hosts via jax.distributed)."""
    import sustaingym_tpu as sg

    env, params = sg.make("evcharging-multiagent", periods_delay=1,
                          project_action=False)
    cfg = PPOConfig(num_envs=16, rollout_len=4, hidden=32, epochs=1,
                    minibatches=2)
    init_state, train_step = make_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(8, mp=2)
    carry = _shard_carry(carry, mesh, data_sharding(mesh), replicated(mesh))
    carry, metrics = jax.jit(train_step, donate_argnums=0)(
        carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["pg_loss"]))
