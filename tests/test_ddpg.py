"""DDPG (TD3-style) learner tests — completes the market doc's advertised
algorithm set (/root/reference/docs/electricitymarketenv.md:84-90)."""
from __future__ import annotations

import numpy as np
import pytest

import jax

from sustaingym_tpu import make
from sustaingym_tpu.parallel import DDPGConfig, make_ddpg_train_step
from sustaingym_tpu.parallel.ddpg import shard_ddpg_carry


def test_ddpg_learns_building_tracking():
    """Mean reward improves on the building comfort-tracking task (same
    yardstick as the SAC learning test)."""
    env, params = make("building")
    cfg = DDPGConfig(num_envs=32, rollout_len=16, capacity=256,
                     batch_per_env=8, updates=8, hidden=64, lr=1e-3,
                     expl_noise=0.2)
    init_state, train_step = make_ddpg_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    rewards = []
    for i in range(30):
        carry, metrics = step(carry, jax.random.fold_in(
            jax.random.PRNGKey(1), i))
        rewards.append(float(metrics["mean_reward"]))
    assert np.isfinite(rewards).all()
    assert np.mean(rewards[-5:]) > np.mean(rewards[:5]), (
        np.mean(rewards[:5]), np.mean(rewards[-5:]))


def test_ddpg_market_runs():
    """DDPG trains the continuous-bid market env (the doc's primary use)."""
    env, params = make("electricitymarket", horizon=2, lp_iters=40,
                       lp_warm_iters=20)
    cfg = DDPGConfig(num_envs=8, rollout_len=8, capacity=64, batch_per_env=4,
                     updates=4, hidden=32)
    init_state, train_step = make_ddpg_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    carry, metrics = jax.jit(train_step)(carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["q_loss"]))
    assert np.isfinite(float(metrics["actor_loss"]))


def test_ddpg_rejects_discrete_space():
    env, params = make("electricitymarket", discrete=True, horizon=2,
                       lp_iters=20, lp_warm_iters=10)
    with pytest.raises(ValueError, match="continuous"):
        make_ddpg_train_step(env, params, DDPGConfig())


def test_ddpg_sharded_mesh_step():
    from sustaingym_tpu.parallel import make_mesh

    env, params = make("building")
    cfg = DDPGConfig(num_envs=8, rollout_len=2, capacity=16, batch_per_env=2,
                     updates=2, hidden=16)
    init_state, train_step = make_ddpg_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(8, mp=1)
    carry = shard_ddpg_carry(carry, mesh)
    carry, metrics = jax.jit(train_step)(carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["q_loss"]))
