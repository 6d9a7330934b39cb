"""Baseline-algorithm tests: runner harness + ordering sanity
(offline-optimal >= MPC >= greedy >= random in expectation on the same day,
mirroring the reference's evaluation methodology,
/root/reference/examples/evcharging/run_baselines.py:129-142)."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sustaingym_tpu.compat as compat
from sustaingym_tpu import algorithms as algos
from sustaingym_tpu.algorithms.evcharging import offline_optimal_schedule
from sustaingym_tpu.envs.evcharging.env import MAX_TIMESTEP


@pytest.fixture(scope="module")
def ev_env():
    return compat.EVChargingGymEnv()


@pytest.fixture(scope="module")
def busy_seed(ev_env):
    mask = np.asarray(ev_env.params.ev_mask).sum(axis=1)
    return int(np.argmax(mask))


def test_greedy_runner(ev_env, busy_seed):
    df = algos.GreedyAlgorithm(ev_env).run([busy_seed])
    assert set(df.columns) >= {"seed", "return"}
    assert df["return"].iloc[0] > 0


def test_mpc_beats_greedy_on_carbon(ev_env, busy_seed):
    g = algos.GreedyAlgorithm(ev_env).run([busy_seed])["return"].iloc[0]
    m = algos.MPC(ev_env, lookahead=12, lp_iters=400).run(
        [busy_seed])["return"].iloc[0]
    # MPC optimizes profit - carbon; it must do at least on par with greedy
    assert m > g - 0.25, (m, g)


def test_offline_optimal_schedule_feasible(ev_env, busy_seed):
    params = ev_env.params
    traj = offline_optimal_schedule(params, busy_seed, iters=2000)
    assert traj.shape == (MAX_TIMESTEP, params.n_stations)
    assert traj.min() >= -1e-5 and traj.max() <= 1.0 + 1e-5
    # respects session demand caps (in A-period units)
    from sustaingym_tpu.envs.evcharging.env import (A_PERS_TO_KWH,
                                                    ACTION_SCALE_FACTOR)
    ev = np.asarray(params.ev_data)[busy_seed]
    st = np.asarray(params.ev_station)[busy_seed]
    msk = np.asarray(params.ev_mask)[busy_seed]
    for e in range(ev.shape[0]):
        if not msk[e]:
            continue
        a, d = int(ev[e, 0]), int(ev[e, 1])
        delivered = traj[a:d, st[e]].sum()
        cap = ev[e, 3] / A_PERS_TO_KWH / ACTION_SCALE_FACTOR
        assert delivered <= cap * 1.02 + 1e-3


def test_offline_optimal_beats_mpc(ev_env, busy_seed):
    m = algos.MPC(ev_env, lookahead=12, lp_iters=400).run(
        [busy_seed])["return"].iloc[0]
    o = algos.OfflineOptimal(ev_env, iters=3000).run(
        [busy_seed])["return"].iloc[0]
    assert o > m - 0.3, (o, m)


def test_building_mpc_beats_zero_action():
    env = compat.BuildingGymEnv()
    # zero-action baseline
    obs, _ = env.reset(seed=150)
    zero_ret = 0.0
    for _ in range(50):
        _, r, *_ = env.step(np.zeros(6, np.float32))
        zero_ret += r
    agent = algos.MPCAgent(env, iters=200)
    obs, _ = env.reset(seed=150)
    mpc_ret = 0.0
    for _ in range(50):
        a = agent.get_action(obs)
        obs, r, *_ = env.step(a.astype(np.float32))
        mpc_ret += r
    assert mpc_ret > zero_ret, (mpc_ret, zero_ret)


def test_building_mpc_data_driven_beats_zero_action():
    """MPC planning on IDENTIFIED (data_driven) dynamics — the counterpart of
    the reference's MPCAgent_DataDriven (/root/reference/sustaingym/
    algorithms/building/mpc_controller.py:122-224), whose predictor input is
    the n+7 layout [avg^2, avg, meta^2, meta, ground, out, u(n), ghi]."""
    from sustaingym_tpu import make
    from sustaingym_tpu.algorithms.building import mpc_action
    from sustaingym_tpu.envs.building import fit_data_driven

    env, params = make("building")
    # identify dynamics from a physics-model trajectory
    state, _ = env.reset_at_epoch(params, 1000)
    states, actions = [np.asarray(state.x)], []
    rng = np.random.default_rng(0)
    for _ in range(300):
        a = rng.uniform(-1, 1, params.n).astype(np.float32)
        state, _ = env.step(params, state, a, jax.random.PRNGKey(0))
        states.append(np.asarray(state.x))
        actions.append(a * params.max_power)
    dd = fit_data_driven(params, np.asarray(states), np.asarray(actions),
                         start_epoch=1000)
    assert dd.data_driven and dd.BD_d.shape == (params.n, params.n + 7)

    def rollout(policy_fn):
        s, _ = env.reset_at_epoch(dd, 2000)
        total = 0.0
        for _ in range(40):
            a = policy_fn(s)
            s, ts = env.step(dd, s, a, jax.random.PRNGKey(0))
            total += float(ts.reward)
        return total

    zero_ret = rollout(lambda s: jnp.zeros(params.n, jnp.float32))
    plan = jax.jit(lambda x, e: mpc_action(dd, x, e, iters=200))
    mpc_ret = rollout(lambda s: plan(s.x, s.epoch))
    assert mpc_ret > zero_ret, (mpc_ret, zero_ret)


def test_batch_run_matches_seed_semantics():
    from sustaingym_tpu import make
    from sustaingym_tpu.algorithms.base import batch_run
    env, params = make("building")

    def zero_policy(obs, key):
        return jnp.zeros(params.n)

    df = batch_run(env, params, zero_policy, seeds=[0, 1, 2],
                   num_steps=params.episode_len)
    assert len(df) == 3
    assert np.all(np.isfinite(df["return"]))


def test_random_algorithm_runs(ev_env, busy_seed):
    df = algos.EVRandomAlgorithm(ev_env).run([busy_seed])
    assert np.isfinite(df["return"].iloc[0])
