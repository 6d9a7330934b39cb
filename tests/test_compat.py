"""Compat-layer conformance tests — the reference's own test strategy
(SURVEY.md §4): gymnasium env_checker + PettingZoo parallel_api_test +
seed determinism, applied to the adapters."""
from __future__ import annotations

import numpy as np
import pytest

import gymnasium
import gymnasium.utils.env_checker
from pettingzoo.test import parallel_api_test, parallel_seed_test

import sustaingym_tpu.compat as compat


@pytest.fixture(scope="module")
def building_env():
    return compat.BuildingGymEnv()


def test_gym_registration():
    import gymnasium
    # other test modules import the reference package, which re-registers
    # the same IDs pointing at its own classes; re-claim ours
    compat._register()
    env = gymnasium.make("sustaingym/Building-v0")
    obs, info = env.reset(seed=0)
    assert obs.shape == (10,)
    env.close()


def test_building_check_env(building_env):
    gymnasium.utils.env_checker.check_env(building_env,
                                          skip_render_check=True)


def test_building_seed_determinism(building_env):
    obs1, _ = building_env.reset(seed=42)
    r1 = [building_env.step(np.zeros(6, np.float32))[1] for _ in range(5)]
    obs2, _ = building_env.reset(seed=42)
    r2 = [building_env.step(np.zeros(6, np.float32))[1] for _ in range(5)]
    np.testing.assert_allclose(obs1, obs2)
    np.testing.assert_allclose(r1, r2)


def test_cogen_gym_dict_api():
    env = compat.CogenGymEnv(forecast_horizon=2)
    obs, info = env.reset(seed=3)
    assert set(obs.keys()) == {"Time", "Prev_Action", "TAMB", "PAMB", "RHAMB",
                               "Target_Power", "Target_Steam", "Energy_Price",
                               "Gas_Price"}
    assert isinstance(obs["Prev_Action"], dict)
    action = env.action_space.sample()
    obs, r, term, trunc, info = env.step(action)
    assert np.isfinite(r)
    assert "fuel_costs" in info


def test_evcharging_gym_roundtrip():
    env = compat.EVChargingGymEnv()
    obs, info = env.reset(seed=0)
    assert set(obs.keys()) == {"timestep", "est_departures", "demands",
                               "prev_moer", "forecasted_moer"}
    a = np.ones(54, np.float32)
    for _ in range(3):
        obs, r, term, trunc, info = env.step(a)
    assert "reward_breakdown" in info
    assert set(info["reward_breakdown"]) == {"profit", "carbon_cost",
                                             "excess_charge"}


def test_discrete_action_wrapper(building_env):
    wrapped = compat.DiscreteActionWrapper(building_env, bins=5)
    assert isinstance(wrapped.action_space, gymnasium.spaces.MultiDiscrete)
    a = wrapped.action_space.sample()
    cont = wrapped.action(a)
    assert np.all(cont >= 0) and np.all(cont <= 1)
    np.testing.assert_allclose(cont, np.asarray(a) / 4.0)


# ---------------------------------------------------------------------------
# PettingZoo
# ---------------------------------------------------------------------------

def test_ma_building_parallel_api():
    # 1000 cycles: the reference's rigor
    # (/root/reference/tests/test_building.py:39), spanning episode
    # boundaries
    env = compat.MultiAgentBuildingParallelEnv()
    parallel_api_test(env, num_cycles=1000)


def test_ma_cogen_parallel_api():
    env = compat.MultiAgentCogenParallelEnv(forecast_horizon=2)
    parallel_api_test(env, num_cycles=1000)


def test_ma_evcharging_parallel_api():
    env = compat.MultiAgentEVChargingParallelEnv()
    parallel_api_test(env, num_cycles=1000)


def test_ma_parallel_seed_determinism():
    """pettingzoo parallel_seed_test for all three MA adapters (the
    reference runs it at /root/reference/tests/test_evcharging.py:42):
    same seed => identical episodes."""
    parallel_seed_test(lambda: compat.MultiAgentBuildingParallelEnv())
    parallel_seed_test(
        lambda: compat.MultiAgentCogenParallelEnv(forecast_horizon=2))
    parallel_seed_test(lambda: compat.MultiAgentEVChargingParallelEnv())


def test_ma_evcharging_discrete_parallel_api():
    """Discrete-action MA EV (DiscreteActionWrapper composed into the view,
    mirroring the reference MultiAgentEVChargingEnv(discrete_bins=5),
    multiagent_env.py:64,91-96)."""
    env = compat.MultiAgentEVChargingParallelEnv(discrete_bins=5)
    import gymnasium.spaces as gs
    assert isinstance(env.action_spaces[env.possible_agents[0]], gs.Discrete)
    parallel_api_test(env, num_cycles=500)


def test_ma_evcharging_discrete_matches_continuous():
    """Discrete action k equals continuous action k/(bins-1) exactly."""
    import jax, jax.numpy as jnp
    from sustaingym_tpu.envs.multiagent import (MultiAgentEVChargingEnv,
                                                make_ma_ev_params)
    pd = make_ma_ev_params(discrete_bins=5, project_action=False)
    pc = make_ma_ev_params(project_action=False)
    view = MultiAgentEVChargingEnv()
    sd, _ = view.reset_at_day(pd, 3)
    sc, _ = view.reset_at_day(pc, 3)
    disc = np.full((pd.base.n_stations,), 3, np.int32)
    cont = disc.astype(np.float32) / 4.0
    _, tsd = view.step(pd, sd, jnp.asarray(disc), jax.random.PRNGKey(0))
    _, tsc = view.step(pc, sc, jnp.asarray(cont), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(tsd.reward),
                                  np.asarray(tsc.reward))
    np.testing.assert_array_equal(np.asarray(tsd.obs), np.asarray(tsc.obs))


def test_ma_evcharging_periods_delay():
    env = compat.MultiAgentEVChargingParallelEnv(periods_delay=2)
    obss, _ = env.reset(seed=0)
    assert len(obss) == 54
    actions = {a: np.ones(1, np.float32) for a in env.agents}
    for _ in range(4):
        obss, rewards, terms, truncs, infos = env.step(actions)
    # reward split evenly across agents
    vals = list(rewards.values())
    assert np.allclose(vals, vals[0])


def test_ma_cogen_reward_decomposition():
    env = compat.MultiAgentCogenParallelEnv(forecast_horizon=2)
    obss, _ = env.reset(seed=1)
    actions = {a: env.action_spaces[a].sample() for a in env.agents}
    obss, rewards, terms, truncs, infos = env.step(actions)
    assert set(rewards) == {"GT1", "GT2", "GT3", "ST"}
    assert all(np.isfinite(v) for v in rewards.values())


# ---------------------------------------------------------------------------
# Vectorized gymnasium adapter (SubprocVecEnv analogue — one device program)
# ---------------------------------------------------------------------------

def test_vector_env_building():
    venv = compat.make_vec("building", num_envs=8, seed=0)
    obs, info = venv.reset(seed=0)
    assert obs.shape == (8,) + venv.single_observation_space.shape
    a = venv.action_space.sample()
    obs, r, term, trunc, info = venv.step(a)
    assert r.shape == (8,) and term.shape == (8,)
    assert np.all(np.isfinite(r))
    # autoreset: run past the episode boundary without host intervention
    ep_len = venv.params.episode_len
    for _ in range(3):
        obs, r, term, trunc, info = venv.step(a)
    assert np.all(np.isfinite(obs))


def test_vector_env_dict_obs():
    venv = compat.make_vec("evcharging", num_envs=4, seed=1,
                           project_action=False)
    obs, _ = venv.reset(seed=1)
    assert isinstance(obs, dict)
    assert obs["demands"].shape == (4, venv.params.n_stations)
    a = np.random.default_rng(0).uniform(
        0, 1, (4, venv.params.n_stations)).astype(np.float32)
    obs, r, term, trunc, info = venv.step(a)
    assert r.shape == (4,)
    assert "excess_charge" in info


def test_vector_env_matches_single():
    """Vector env with num_envs=1 reproduces the functional env's stream
    given the same key derivation."""
    import jax
    venv = compat.make_vec("building", num_envs=1, seed=5)
    obs, _ = venv.reset(seed=5)
    # replicate the key plumbing: PRNGKey(5) -> split -> split(num_envs)
    key = jax.random.PRNGKey(5)
    _, sub = jax.random.split(key)
    k0 = jax.random.split(sub, 1)[0]
    from sustaingym_tpu import make
    env, params = make("building")
    state, ts = env.reset(params, k0)
    np.testing.assert_allclose(obs[0], np.asarray(ts.obs), rtol=1e-6)
