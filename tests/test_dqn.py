"""Double-DQN learner tests (discrete market + discrete multi-agent EV).

Covers the doc-advertised algorithm set's dqn entry
(/root/reference/docs/electricitymarketenv.md:84-90).
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sustaingym_tpu import make
from sustaingym_tpu.envs import electricitymarket as em
from sustaingym_tpu.parallel import DQNConfig, make_dqn_train_step
from sustaingym_tpu.parallel.dqn import qnet_apply, shard_dqn_carry


def test_dqn_learns_discrete_market():
    """On the 3-action market, immediate discharge revenue dominates at a
    fresh battery, so the greedy Q-action at the initial observation must
    become 'discharge' (mean-reward curves are confounded by battery
    depletion — same reasoning as the PPO test)."""
    env, params = em.make_env(month="2021-05", horizon=2, lp_iters=40,
                              lp_warm_iters=20, discrete=True)
    cfg = DQNConfig(num_envs=16, rollout_len=16, capacity=256,
                    batch_per_env=8, updates=8, hidden=32, lr=1e-3,
                    eps_decay_iters=6, reward_scale=1e-2)
    init_state, train_step = make_dqn_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))

    from sustaingym_tpu.core import flatten
    _, ts0 = env.reset_at_day(params, 0)
    obs0 = flatten(env.observation_space(params), ts0.obs)

    step = jax.jit(train_step)
    for i in range(12):
        carry, metrics = step(carry, jax.random.fold_in(
            jax.random.PRNGKey(1), i))
    assert np.isfinite(float(metrics["q_loss"]))
    q = qnet_apply(carry["qnet"], obs0, 1, 3)[0]
    assert int(jnp.argmax(q)) == 2, np.asarray(q)  # discharge is greedy
    # epsilon decayed to its floor
    assert float(metrics["epsilon"]) == pytest.approx(0.05)


def test_dqn_discrete_ma_ev_runs_and_is_finite():
    """Branching Q heads over the agent axis: discrete multi-agent EV
    (one Discrete(bins) action per station) trains through the same
    learner; one fused step executes with finite losses and correctly
    shaped replay entries."""
    env, params = make("evcharging-multiagent", discrete_bins=5,
                       project_action=False)
    cfg = DQNConfig(num_envs=4, rollout_len=4, capacity=32, batch_per_env=2,
                    updates=2, hidden=32)
    init_state, train_step = make_dqn_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    n_agents = params.base.n_stations
    assert carry["buffer"]["act"].shape[:3] == (32, 4, n_agents)
    carry, metrics = jax.jit(train_step)(carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["q_loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))


def test_dqn_rejects_continuous_space():
    env, params = make("building")
    with pytest.raises(ValueError, match="Discrete"):
        make_dqn_train_step(env, params, DQNConfig())


def test_dqn_sharded_mesh_step():
    """dp-sharded DQN carry executes one fused step on the virtual mesh."""
    from sustaingym_tpu.parallel import make_mesh

    env, params = em.make_env(month="2021-05", horizon=2, lp_iters=20,
                              lp_warm_iters=10, discrete=True)
    cfg = DQNConfig(num_envs=8, rollout_len=2, capacity=16, batch_per_env=2,
                    updates=2, hidden=16)
    init_state, train_step = make_dqn_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(8, mp=1)
    carry = shard_dqn_carry(carry, mesh)
    carry, metrics = jax.jit(train_step)(carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["q_loss"]))
