"""SAC (off-policy) + A2C learner tests — the reference harnesses expose
ppo/a2c/sac (examples/evcharging/train_stable_baselines.py:162); these cover
the native equivalents on the 8-virtual-device CPU mesh."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from sustaingym_tpu import make
from sustaingym_tpu.parallel import (PPOConfig, SACConfig,
                                     make_mesh, make_sac_train_step, train,
                                     train_sac)
from sustaingym_tpu.parallel.sac import (actor_apply, critic_apply,
                                         init_actor, init_critic,
                                         shard_sac_carry)

from .test_ppo import _QuadTrackEnv


def test_sac_network_shapes():
    a = init_actor(jax.random.PRNGKey(0), obs_dim=10, act_dim=6, hidden=32)
    mu, log_std = actor_apply(a, jnp.zeros((4, 10)))
    assert mu.shape == (4, 6) and log_std.shape == (4, 6)
    assert np.all(np.asarray(log_std) >= -5.0)
    assert np.all(np.asarray(log_std) <= 2.0)
    q = init_critic(jax.random.PRNGKey(1), obs_dim=10, act_dim=6, hidden=32)
    assert critic_apply(q, jnp.zeros((4, 10)), jnp.zeros((4, 6))).shape == (4,)


def test_sac_train_step_runs_and_updates():
    env, params = make("building")
    cfg = SACConfig(num_envs=8, rollout_len=4, capacity=16, batch_per_env=2,
                    updates=2, hidden=32)
    init_state, train_step = make_sac_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    before = np.asarray(carry["actor"]["mu"]["w"]).copy()
    carry, metrics = jax.jit(train_step)(carry, jax.random.PRNGKey(1))
    after = np.asarray(carry["actor"]["mu"]["w"])
    assert not np.allclose(before, after)
    assert np.isfinite(float(metrics["mean_reward"]))
    assert np.isfinite(float(metrics["q_loss"]))
    assert int(carry["written"]) == cfg.rollout_len
    # target nets moved toward (but not onto) the online critics
    t = np.asarray(carry["targets"]["q1"]["l1"]["w"])
    o = np.asarray(carry["critics"]["q1"]["l1"]["w"])
    assert not np.allclose(t, o)


def test_sac_ring_buffer_wraps():
    env, params = make("building")
    cfg = SACConfig(num_envs=4, rollout_len=6, capacity=4, batch_per_env=2,
                    updates=1, hidden=16)
    init_state, train_step = make_sac_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    carry, _ = jax.jit(train_step)(carry, jax.random.PRNGKey(1))
    assert int(carry["written"]) == 6  # ring holds the last 4 of them
    assert carry["buffer"]["obs"].shape[0] == 4


def test_sac_learns_quadratic_tracking():
    env = _QuadTrackEnv()
    cfg = SACConfig(num_envs=64, rollout_len=8, capacity=256, batch_per_env=8,
                    updates=16, hidden=32, lr=5e-3, alpha_lr=3e-2, gamma=0.0,
                    init_alpha=0.02)
    carry, history = train_sac(env, None, cfg, jax.random.PRNGKey(0),
                               num_iterations=30, verbose=False)
    first = np.mean([h["mean_reward"] for h in history[:3]])
    last = np.mean([h["mean_reward"] for h in history[-3:]])
    assert last > first + 0.2, (first, last)


def test_sac_sharded_mesh():
    mesh = make_mesh(8, mp=2)
    env, params = make("building")
    cfg = SACConfig(num_envs=16, rollout_len=4, capacity=16, batch_per_env=2,
                    updates=2, hidden=32)
    init_state, train_step = make_sac_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    carry = shard_sac_carry(carry, mesh)
    # replay ring's env axis sharded over dp
    assert "dp" in str(carry["buffer"]["obs"].sharding.spec)
    carry, metrics = jax.jit(train_step, donate_argnums=0)(
        carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["q_loss"]))


def test_sac_multiagent_building_smoke():
    env, params = make("building-multiagent")
    cfg = SACConfig(num_envs=4, rollout_len=4, capacity=8, batch_per_env=2,
                    updates=2, hidden=16)
    init_state, train_step = make_sac_train_step(env, params, cfg)
    carry = init_state(jax.random.PRNGKey(0))
    # agent axis present in the replay ring: (capacity, envs, agents, D)
    assert carry["buffer"]["obs"].ndim == 4
    carry, metrics = jax.jit(train_step)(carry, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["mean_reward"]))


def test_a2c_learns_quadratic_tracking():
    env = _QuadTrackEnv()
    cfg = PPOConfig(algo="a2c", num_envs=64, rollout_len=16, hidden=32,
                    epochs=1, minibatches=1, lr=3e-3, gamma=0.0, lam=0.0)
    carry, history = train(env, None, cfg, jax.random.PRNGKey(0),
                           num_iterations=25, verbose=False)
    first = np.mean([h["mean_reward"] for h in history[:3]])
    last = np.mean([h["mean_reward"] for h in history[-3:]])
    assert last > first + 0.2, (first, last)


def test_replay_sampling_modes():
    """parallel/replay.py: both index modes return (batch_per_env,
    num_envs, ...) batches of real ring content; the per-env mode draws
    a different slot per env (phase diversity), the slot mode one shared
    slot per row."""
    import jax.numpy as jnp
    from sustaingym_tpu.parallel.replay import (init_ring,
                                                sample_transitions,
                                                write_transition)

    cap, envs, d = 8, 5, 3
    buf = init_ring(cap, {"obs": ((envs, d), jnp.float32),
                          "reward": ((envs,), jnp.float32)})
    for i in range(cap):
        buf = write_transition(
            buf, {"obs": jnp.full((envs, d), float(i)),
                  "reward": jnp.full((envs,), float(i))},
            jnp.asarray(i), cap)
    written = jnp.asarray(cap)
    for per_env in (False, True):
        batch = sample_transitions(buf, written, cap, 4,
                                   jax.random.PRNGKey(0),
                                   per_env_sample=per_env)
        assert batch["obs"].shape == (4, envs, d)
        assert batch["reward"].shape == (4, envs)
        # every sampled value is a written slot id
        assert set(np.asarray(batch["reward"]).ravel()) <= set(
            float(i) for i in range(cap))
        # obs rows are consistent with their reward's slot
        np.testing.assert_array_equal(
            np.asarray(batch["obs"][..., 0]), np.asarray(batch["reward"]))
    # slot mode: one shared slot per sampled row
    b = sample_transitions(buf, written, cap, 4, jax.random.PRNGKey(1))
    r = np.asarray(b["reward"])
    assert all(len(set(row)) == 1 for row in r)
