"""Pallas kernel unit tests (interpret mode on CPU, compiled on TPU).

Kernel-vs-oracle pattern from SURVEY.md §4: every TPU kernel is checked
against its XLA reference semantics on the exact shapes the engine uses.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sustaingym_tpu.ops.pallas.exog_gather import (
    _pallas_hbm_slice_gather, _pallas_slice_gather, _xla_slice_gather,
    episode_slice_gather)


@pytest.mark.parametrize("rows,cols,batch,length", [
    (105408, 4, 64, 288),    # BuildingEnv exog shape
    (105408, 4, 64, 7),      # partial segment
    (1000, 7, 33, 96),       # cogen-like (odd cols -> padded to 8)
    (513, 1, 5, 17),         # degenerate small
    (4096, 4, 768, 32),      # batch between chunk (512) and smem block:
    (4096, 4, 1025, 32),     # the subchunk count must round UP (regression
                             # for a floored-subs bug that left the output
                             # tail unwritten)
])
def test_slice_gather_matches_xla(rows, cols, batch, length):
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (rows, cols), jnp.float32)
    starts = jax.random.randint(
        jax.random.PRNGKey(1), (batch,), 0, rows - length)
    ref = _xla_slice_gather(table, starts, length)
    on_tpu = jax.devices()[0].platform == "tpu"
    out = _pallas_slice_gather(table, starts, length, interpret=not on_tpu)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("rows,cols,batch,length", [
    (2890, 201, 33, 96),     # EV step-table-like (2 lane-rows per epoch)
    (500, 128, 7, 12),       # exactly one lane-row per epoch
    (2890, 201, 100, 96),    # batch not a multiple of the DMA chunk (64)
])
def test_hbm_slice_gather_matches_xla(rows, cols, batch, length):
    key = jax.random.PRNGKey(4)
    table = jax.random.uniform(key, (rows, cols), jnp.float32)
    starts = jax.random.randint(
        jax.random.PRNGKey(5), (batch,), 0, rows - length)
    ref = _xla_slice_gather(table, starts, length)
    on_tpu = jax.devices()[0].platform == "tpu"
    out = _pallas_hbm_slice_gather(table, starts, length,
                                   interpret=not on_tpu)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_episode_slice_gather_dispatch():
    """Public wrapper returns XLA-identical values on any backend."""
    table = jax.random.uniform(jax.random.PRNGKey(2), (4096, 4), jnp.float32)
    starts = jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 4096 - 288)
    out = episode_slice_gather(table, starts, 288)
    ref = _xla_slice_gather(table, starts, 288)
    assert out.shape == (16, 288, 4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_ev_rollout_matches_xla():
    """Fused EV Pallas kernel (interpret mode) == the XLA step loop on the
    same prescribed actions and days: 30-iter ADMM projection, pilot
    quantization, plug/unplug events, two-stage battery, reward terms."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sustaingym_tpu.envs import evcharging

    env, params = evcharging.make_env(site="caltech",
                                      date_period="Summer 2021",
                                      project_action=True, proj_iters=12,
                                      proj_method="admm")
    n = params.n_stations
    batch, steps, w = 128, 12, 128
    key = jax.random.PRNGKey(7)
    rng = np.random.default_rng(0)
    actions = jnp.asarray(rng.uniform(0, 1, (steps, batch, n)), jnp.float32)

    fused = env.fused_rollout(params, key, batch, steps, actions=actions,
                              w=w, interpret=True)

    # replicate the fused path's day derivation, then drive the XLA step
    key_init, _ = jax.random.split(key)
    init_keys = jax.random.split(key_init, batch)
    days = jax.vmap(lambda k: jax.random.randint(
        k, (), 0, params.n_days))(init_keys)
    state, _ = jax.vmap(env.reset_at_day, in_axes=(None, 0))(params, days)
    vstep = jax.jit(jax.vmap(env.step, in_axes=(None, 0, 0, None)))
    rewards, profits, excesses = [], [], []
    for t in range(steps):
        state, ts = vstep(params, state, actions[t], jax.random.PRNGKey(0))
        rewards.append(np.asarray(ts.reward))
        profits.append(np.asarray(ts.info["profit"]))
        excesses.append(np.asarray(ts.info["excess_charge"]))

    np.testing.assert_allclose(np.asarray(fused.reward),
                               np.asarray(rewards), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fused.info["profit"]),
                               np.asarray(profits), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fused.info["excess_charge"]),
                               np.asarray(excesses), rtol=2e-4, atol=2e-5)


def test_fused_ev_rollout_unprojected_matches_xla():
    """Projection-off fused EV kernel == XLA step loop (prescribed actions);
    also exercises the excess_charge path, which an unprojected greedy
    policy drives hard. (RNG mode needs the on-core PRNG — TPU only, driven
    by bench.py; interpret mode has no prng_seed lowering.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sustaingym_tpu.envs import evcharging

    env, params = evcharging.make_env(site="caltech",
                                      date_period="Summer 2021",
                                      project_action=False)
    n = params.n_stations
    batch, steps = 128, 10
    key = jax.random.PRNGKey(3)
    actions = jnp.ones((steps, batch, n), jnp.float32)
    fused = env.fused_rollout(params, key, batch, steps, actions=actions,
                              interpret=True)
    key_init, _ = jax.random.split(key)
    init_keys = jax.random.split(key_init, batch)
    days = jax.vmap(lambda k: jax.random.randint(
        k, (), 0, params.n_days))(init_keys)
    state, _ = jax.vmap(env.reset_at_day, in_axes=(None, 0))(params, days)
    vstep = jax.jit(jax.vmap(env.step, in_axes=(None, 0, 0, None)))
    rewards, excesses = [], []
    for t in range(steps):
        state, ts = vstep(params, state, actions[t], jax.random.PRNGKey(0))
        rewards.append(np.asarray(ts.reward))
        excesses.append(np.asarray(ts.info["excess_charge"]))
    assert np.asarray(excesses).sum() > 0  # greedy violates the network
    np.testing.assert_allclose(np.asarray(fused.reward),
                               np.asarray(rewards), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fused.info["excess_charge"]),
                               np.asarray(excesses), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("site", ["caltech", "jpl"])
def test_fused_ev_rollout_dual_fista_matches_xla(site):
    """Round-4 in-kernel dual-FISTA projection (interpret mode) == the XLA
    step loop on the same prescribed actions/days — including JPL, whose 9
    cones the round-3 16-row layout excluded. The XLA reference runs with
    inner_bf16=False so both sides compute the f32 operator (the kernel's
    VMEM-resident chain has no HBM pressure, hence no bf16 inner trick)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sustaingym_tpu.envs import evcharging
    from sustaingym_tpu.envs.evcharging.env import ACTION_SCALE_FACTOR
    from sustaingym_tpu.ops import qp

    env, params = evcharging.make_env(site=site,
                                      date_period="Summer 2021",
                                      project_action=True, proj_iters=15,
                                      proj_method="dual")
    spec = evcharging.caltech_site() if site == "caltech" \
        else evcharging.jpl_site()
    # f32 inner loop on the XLA side to match the kernel's f32 chain
    proj = qp.make_dual_soc_projection(
        spec.constraint_matrix, spec.phase_angles, spec.magnitudes,
        action_scale=ACTION_SCALE_FACTOR, iters=15, inner_bf16=False)
    params = params.replace(proj=proj)
    n = params.n_stations
    batch, steps, w = 128, 12, 128
    key = jax.random.PRNGKey(11)
    rng = np.random.default_rng(5)
    actions = jnp.asarray(rng.uniform(0, 1, (steps, batch, n)), jnp.float32)

    fused = env.fused_rollout(params, key, batch, steps, actions=actions,
                              w=w, interpret=True)

    key_init, _ = jax.random.split(key)
    init_keys = jax.random.split(key_init, batch)
    days = jax.vmap(lambda k: jax.random.randint(
        k, (), 0, params.n_days))(init_keys)
    state, _ = jax.vmap(env.reset_at_day, in_axes=(None, 0))(params, days)
    vstep = jax.jit(jax.vmap(env.step, in_axes=(None, 0, 0, None)))
    rewards, profits = [], []
    for t in range(steps):
        state, ts = vstep(params, state, actions[t], jax.random.PRNGKey(0))
        rewards.append(np.asarray(ts.reward))
        profits.append(np.asarray(ts.info["profit"]))

    np.testing.assert_allclose(np.asarray(fused.reward),
                               np.asarray(rewards), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fused.info["profit"]),
                               np.asarray(profits), rtol=2e-4, atol=2e-5)


def test_fused_ev_dual_fista_respects_restart_flag():
    """The in-kernel FISTA honors DualSOCProjection.restart: restart=False
    (with the provable spectral step the qp guard enforces) must match the
    XLA path running the same no-restart operator."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sustaingym_tpu.envs import evcharging
    from sustaingym_tpu.envs.evcharging.env import ACTION_SCALE_FACTOR
    from sustaingym_tpu.ops import qp

    env, params = evcharging.make_env(site="caltech",
                                      date_period="Summer 2021",
                                      project_action=True,
                                      proj_method="dual")
    spec = evcharging.caltech_site()
    proj = qp.make_dual_soc_projection(
        spec.constraint_matrix, spec.phase_angles, spec.magnitudes,
        action_scale=ACTION_SCALE_FACTOR, iters=25, step_scale=None,
        restart=False, inner_bf16=False)
    params = params.replace(proj=proj)
    n = params.n_stations
    batch, steps = 128, 6
    key = jax.random.PRNGKey(2)
    rng = np.random.default_rng(9)
    actions = jnp.asarray(rng.uniform(0, 1, (steps, batch, n)), jnp.float32)
    fused = env.fused_rollout(params, key, batch, steps, actions=actions,
                              w=128, interpret=True)

    key_init, _ = jax.random.split(key)
    init_keys = jax.random.split(key_init, batch)
    days = jax.vmap(lambda k: jax.random.randint(
        k, (), 0, params.n_days))(init_keys)
    state, _ = jax.vmap(env.reset_at_day, in_axes=(None, 0))(params, days)
    vstep = jax.jit(jax.vmap(env.step, in_axes=(None, 0, 0, None)))
    rewards = []
    for t in range(steps):
        state, ts = vstep(params, state, actions[t], jax.random.PRNGKey(0))
        rewards.append(np.asarray(ts.reward))
    np.testing.assert_allclose(np.asarray(fused.reward),
                               np.asarray(rewards), rtol=2e-4, atol=2e-5)


def test_fused_ev_chunking_handles_non_divisor_steps():
    """Segment lengths not divisible by 36 pick a smaller dividing chunk
    instead of falling back to a whole-segment block (which at w=2048
    exceeds VMEM — round-4 review finding). Driven in interpret mode with
    prescribed actions; exercises chunks of 25 (steps=100)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sustaingym_tpu.envs import evcharging

    env, params = evcharging.make_env(site="caltech",
                                      date_period="Summer 2021",
                                      project_action=False)
    n = params.n_stations
    batch, steps = 128, 100
    key = jax.random.PRNGKey(4)
    actions = jnp.ones((steps, batch, n), jnp.float32)
    fused = env.fused_rollout(params, key, batch, steps, actions=actions,
                              interpret=True)
    assert fused.reward.shape == (steps, batch)
    assert np.isfinite(np.asarray(fused.reward)).all()


@pytest.mark.parametrize("site", ["caltech", "jpl"])
def test_fused_policy_kernel_matches_xla_reference(site):
    """Policy-in-kernel EV rollout (interpret mode, prescribed noise,
    projection off) == an op-mirrored XLA reference: obs assembly, the
    bf16 actor MLP, Gaussian sampling, tanh squash, env stepping, and the
    learner-block layout (est/dem/aux/u rows), on BOTH packaged sites.
    The actor math is mirrored (same bf16 cast points, f32 accumulation),
    so everything must agree except rare pilot-quantization boundary
    flips from float-reassociation drift — asserted via quantile bounds
    plus a mean bound."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sustaingym_tpu.envs import evcharging
    from sustaingym_tpu.ops.pallas.ev_rollout import ev_fused_layout

    env, params = evcharging.make_env(site=site,
                                      date_period="Summer 2021",
                                      project_action=False)
    n = params.n_stations
    batch, T, H = 128, 288, 64
    D = 2 + 2 * n + 36                    # flat obs width (site-dependent)
    key = jax.random.PRNGKey(11)
    rng = np.random.default_rng(3)
    noise = jnp.asarray(rng.standard_normal((T, batch, 64)), jnp.float32)
    policy = {
        "trunk1": {"w": jnp.asarray(rng.normal(0, 0.3, (D, H)),
                                    jnp.float32),
                   "b": jnp.asarray(rng.normal(0, 0.1, (H,)), jnp.float32)},
        "trunk2": {"w": jnp.asarray(rng.normal(0, 0.3, (H, H)),
                                    jnp.float32),
                   "b": jnp.asarray(rng.normal(0, 0.1, (H,)), jnp.float32)},
        "mu": {"w": jnp.asarray(rng.normal(0, 0.3, (H, n)), jnp.float32),
               "b": jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32)},
        "log_std": jnp.full((n,), -0.5, jnp.float32),
    }
    out = env.fused_policy_unroll(params, policy, key, batch, T,
                                  w=128, noise=noise, interpret=True)
    spec = ev_fused_layout(n)
    blk = np.asarray(out["obs_blk_k"], np.float32)   # (T, 232, 128)

    # ---- XLA reference, op-mirrored -------------------------------------
    key_init, _ = jax.random.split(key)
    init_keys = jax.random.split(key_init, batch)
    days = jax.vmap(lambda k: jax.random.randint(
        k, (), 0, params.n_days))(init_keys)
    state, ts = jax.vmap(env.reset_at_day, in_axes=(None, 0))(params, days)
    bf = jnp.bfloat16

    def actor(obs_flat):
        ob = obs_flat.astype(bf)
        h = jnp.tanh(jnp.matmul(ob, policy["trunk1"]["w"].astype(bf),
                                preferred_element_type=jnp.float32)
                     + policy["trunk1"]["b"])
        h = jnp.tanh(jnp.matmul(h.astype(bf), policy["trunk2"]["w"].astype(bf),
                                preferred_element_type=jnp.float32)
                     + policy["trunk2"]["b"])
        return (jnp.matmul(h.astype(bf), policy["mu"]["w"].astype(bf),
                           preferred_element_type=jnp.float32)
                + policy["mu"]["b"])

    vstep = jax.jit(jax.vmap(env.step, in_axes=(None, 0, 0, None)))
    sigma = float(np.exp(-0.5))
    rewards, est_ref, dem_ref, u_ref = [], [], [], []
    obs = ts.obs
    for t in range(T):
        flat = jnp.concatenate(
            [obs["timestep"], obs["est_departures"], obs["demands"],
             obs["prev_moer"], obs["forecasted_moer"]], axis=1)
        mu = actor(flat)
        u = mu + sigma * noise[t, :, :n]
        a = jnp.tanh(u) * 0.5 + 0.5
        est_ref.append(np.asarray(obs["est_departures"], np.float32))
        dem_ref.append(np.asarray(obs["demands"], np.float32))
        u_ref.append(np.asarray(u, np.float32))
        state, ts2 = vstep(params, state, a, jax.random.PRNGKey(0))
        rewards.append(np.asarray(ts2.reward))
        obs = ts2.obs

    # learner block rows: est [0:n], dem [64:64+n], aux [128:168],
    # u [168:168+n] — all bf16-stored, lanes = envs
    def kr(lo, k):
        return np.swapaxes(blk[:, lo:lo + k, :], 1, 2)   # (T, B, k)

    est_k, dem_k, u_k = kr(0, n), kr(64, n), kr(spec["u_lo"], n)
    to_bf = lambda x: np.asarray(jnp.asarray(x).astype(bf), np.float32)
    # est_departures are action-independent (trace-driven): exact
    np.testing.assert_array_equal(est_k, to_bf(np.stack(est_ref)))
    # demands/u/rewards: ~1e-6 matmul-reassociation drift occasionally
    # flips a pilot-quantization rounding, after which THAT env's charge
    # trajectory diverges — bound the affected fraction, not the max
    dd = np.abs(dem_k - to_bf(np.stack(dem_ref)))
    assert np.mean(dd > 1e-3) < 0.01, np.mean(dd > 1e-3)
    du = np.abs(u_k - np.stack(u_ref))
    assert np.quantile(du, 0.99) < 0.02, np.quantile(du, 0.99)
    dr = np.abs(np.asarray(out["reward"]) - np.stack(rewards))
    assert np.quantile(dr, 0.99) < 1e-4, np.quantile(dr, 0.99)
    assert dr.mean() < 1e-4, dr.mean()
    # aux rows: timestep + moer channels of the day
    tstep_k = kr(128, 1)[..., 0]
    expect_t = np.broadcast_to((np.arange(T) / 288.0)[:, None], (T, batch))
    np.testing.assert_allclose(tstep_k, to_bf(expect_t), atol=0, rtol=0)
    moer_k = kr(129, 1)[..., 0]
    moer_expect = np.asarray(params.moer)[np.asarray(days)][:, :T, 0].T
    np.testing.assert_array_equal(moer_k, to_bf(moer_expect))


def test_fused_building_policy_kernel_matches_xla_reference():
    """Building policy-in-kernel rollout (interpret mode, prescribed
    noise) == an op-mirrored XLA reference: obs assembly (previous step's
    exogenous channels + occupant power), the bf16 actor, tanh * ac_map
    squash, RC step, rewards, learner-block layout. Building dynamics are
    smooth (no quantization cliffs), so tolerances are tight."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sustaingym_tpu import make
    from sustaingym_tpu.ops.pallas.building_rollout import (
        building_fused_layout)

    env, params = make("building")
    n = params.n
    batch, T, H = 128, int(params.episode_len), 64
    key = jax.random.PRNGKey(5)
    rng = np.random.default_rng(9)
    noise = jnp.asarray(rng.standard_normal((T, batch, 8)), jnp.float32)
    D = n + 4
    policy = {
        "trunk1": {"w": jnp.asarray(rng.normal(0, 0.3, (D, H)),
                                    jnp.float32),
                   "b": jnp.asarray(rng.normal(0, 0.1, (H,)), jnp.float32)},
        "trunk2": {"w": jnp.asarray(rng.normal(0, 0.3, (H, H)),
                                    jnp.float32),
                   "b": jnp.asarray(rng.normal(0, 0.1, (H,)), jnp.float32)},
        "mu": {"w": jnp.asarray(rng.normal(0, 0.3, (H, n)), jnp.float32),
               "b": jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32)},
        "log_std": jnp.full((n,), -0.5, jnp.float32),
    }
    out = env.fused_policy_unroll(params, policy, key, batch, T,
                                  w=128, noise=noise, interpret=True)
    spec = building_fused_layout(n)
    blk = np.asarray(out["obs_blk_k"], np.float32)   # (T, 24, 128)

    # ---- XLA reference, op-mirrored -------------------------------------
    key_init, _ = jax.random.split(key)
    init_keys = jax.random.split(key_init, batch)
    e0 = jax.vmap(lambda k: jax.random.randint(
        k, (), 0, params.length_of_weather - 1))(init_keys)
    state, ts = jax.vmap(env.reset_at_epoch, in_axes=(None, 0))(params, e0)
    bf = jnp.bfloat16
    sigma = float(np.exp(-0.5))
    ac = np.asarray(params.ac_map)

    def actor(obs_flat):
        ob = obs_flat.astype(bf)
        h = jnp.tanh(jnp.matmul(ob, policy["trunk1"]["w"].astype(bf),
                                preferred_element_type=jnp.float32)
                     + policy["trunk1"]["b"])
        h = jnp.tanh(jnp.matmul(h.astype(bf),
                                policy["trunk2"]["w"].astype(bf),
                                preferred_element_type=jnp.float32)
                     + policy["trunk2"]["b"])
        return (jnp.matmul(h.astype(bf), policy["mu"]["w"].astype(bf),
                           preferred_element_type=jnp.float32)
                + policy["mu"]["b"])

    vstep = jax.jit(jax.vmap(env.step, in_axes=(None, 0, 0, None)))
    rewards, obs_ref, u_ref = [], [], []
    obs = ts.obs
    for t in range(T):
        mu = actor(obs)
        u = mu + sigma * noise[t, :, :n]
        a = jnp.tanh(u) * ac[None, :]
        obs_ref.append(np.asarray(obs, np.float32))
        u_ref.append(np.asarray(u, np.float32))
        state, ts2 = vstep(params, state, a, jax.random.PRNGKey(0))
        rewards.append(np.asarray(ts2.reward))
        obs = ts2.obs

    def kr(lo, k):
        return np.swapaxes(blk[:, lo:lo + k, :], 1, 2)   # (T, B, k)

    to_bf = lambda x: np.asarray(jnp.asarray(x).astype(bf), np.float32)
    obs_flat_ref = np.stack(obs_ref)                     # (T, B, n + 4)
    # temps rows 0:n, aux rows 8:12. The dynamics feed the policy, so
    # ~1e-6 matmul-reassociation drift between the in-kernel and XLA
    # actors gets chaotically amplified over hundreds of steps (a value
    # near a bf16 rounding boundary flips, the policy sees a half-ulp obs
    # jump, trajectories separate). Assert EXACTNESS over an early
    # horizon where drift is still at rounding level, and a tight
    # aggregate bound over the full episode.
    E = 32
    x_k = kr(0, n)
    aux_k = kr(8, 4)
    dx = np.abs(x_k - to_bf(obs_flat_ref[..., :n]))
    assert np.quantile(dx[:E], 0.99) < 0.05, np.quantile(dx[:E], 0.99)
    np.testing.assert_allclose(aux_k[:E], to_bf(obs_flat_ref[:E, :, n:]),
                               atol=2e-3, rtol=1e-2)
    du = np.abs(kr(spec["u_lo"], n) - np.stack(u_ref))
    assert np.quantile(du[:E], 0.99) < 0.05, np.quantile(du[:E], 0.99)
    rew_k = np.asarray(out["reward"])
    rew_r = np.stack(rewards)
    dr = np.abs(rew_k - rew_r)
    assert np.quantile(dr[:E], 0.99) < 0.02, np.quantile(dr[:E], 0.99)
    # full-horizon: identical reward statistics (chaos decorrelates the
    # per-step pairing but not the distribution)
    assert abs(rew_k.mean() - rew_r.mean()) < 5e-3, (rew_k.mean(),
                                                     rew_r.mean())
    assert abs(rew_k.std() - rew_r.std()) < 2e-2, (rew_k.std(), rew_r.std())


def test_pallas_pdhg_solve_matches_xla_solver():
    """Whole-solve PDHG kernel (interpret mode) == ops.lp.solve_lp with
    bf16 matmul inputs on the SCED operator: same preconditioned
    iteration, same shared +/- matvec, warm starts included."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sustaingym_tpu import make
    from sustaingym_tpu.ops import lp
    from sustaingym_tpu.ops.pallas.lp_solve import (pack_pdhg_operands,
                                                    pdhg_solve_paired)

    env, params = make("electricitymarket", lp_bf16=True)
    op = params.op
    rng = np.random.default_rng(0)
    B, n, me, ms = 8, op.n, op.me, op.ms
    c = jnp.asarray(rng.uniform(-50, 50, (B, n)), jnp.float32)
    b = jnp.asarray(rng.uniform(100, 2000, (B, me)), jnp.float32)
    h = jnp.asarray(rng.uniform(10, 500, (B, 2 * ms)), jnp.float32)
    ub = jnp.broadcast_to(params.ub, (B, n))
    x0 = jnp.asarray(rng.uniform(0, 1, (B, n)), jnp.float32)
    y0 = jnp.asarray(rng.normal(0, 5, (B, me)), jnp.float32)
    z0 = jnp.asarray(np.abs(rng.normal(0, 1, (B, 2 * ms))), jnp.float32)
    init = lp.LPSolution(x=x0, y=y0, z=z0)
    sol = lp.solve_lp(op, c, b, h, jnp.zeros((B, n)), ub, init=init,
                      iters=50)
    x, y, zp, zm = pdhg_solve_paired(
        pack_pdhg_operands(op), c, b, h[:, :ms], h[:, ms:], ub,
        x0, y0, z0[:, :ms], z0[:, ms:], dims=(n, me, ms), iters=50,
        w=8, interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(sol.x),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(sol.y),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([zp, zm], -1)),
                               np.asarray(sol.z), rtol=1e-4, atol=2e-3)


def test_fused_policy_unroll_halves_lane_group_for_any_128_multiple():
    """Any 128-multiple batch must run (review finding: batches above and
    not a multiple of the lane-width cap crashed instead of halving the
    group down — e.g. 384 with a 1024 cap). Shape-only check in interpret
    mode with prescribed noise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sustaingym_tpu import make

    env, params = make("building")
    n = params.n
    batch, T, H, D = 384, int(params.episode_len), 16, n + 4
    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.standard_normal((T, batch, 8)), jnp.float32)
    policy = {
        "trunk1": {"w": jnp.zeros((D, H), jnp.float32),
                   "b": jnp.zeros((H,), jnp.float32)},
        "trunk2": {"w": jnp.zeros((H, H), jnp.float32),
                   "b": jnp.zeros((H,), jnp.float32)},
        "mu": {"w": jnp.zeros((H, n), jnp.float32),
               "b": jnp.zeros((n,), jnp.float32)},
        "log_std": jnp.full((n,), -0.5, jnp.float32),
    }
    out = env.fused_policy_unroll(params, policy, jax.random.PRNGKey(0),
                                  batch, T, noise=noise, interpret=True)
    assert out["reward"].shape == (T, batch)
    assert out["obs_blk_k"].shape[2] % 128 == 0   # lane width halved to fit
