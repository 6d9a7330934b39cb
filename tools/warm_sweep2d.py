"""Round-5 2-D (alpha, warm-budget) accuracy sweep for the SCED PDHG
solver — the measurement behind the lp_precond_alpha=0.35 /
lp_warm_iters=40 defaults (see envs/electricitymarket/env.py make_params
and tests/test_electricitymarket.py::test_warm_iters_price_accuracy).
Run on CPU; prints mean/max |price - 600-iter reference| per config."""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from sustaingym_tpu.envs import electricitymarket as em

steps = 96
def run_prices(cold, warm, pa):
    env, params = em.make_env(month="2021-05", horizon=4, lp_iters=cold,
                              lp_warm_iters=warm, lp_precond_alpha=pa)
    state, _ = env.reset_at_day(params, 0)
    def run(state):
        def body(state, t):
            a = jnp.concatenate([jnp.full(4, 20.0), jnp.full(4, 60.0)])
            state, ts = env.step(params, state, a, jax.random.PRNGKey(0))
            return state, ts.info["price"]
        return jax.lax.scan(body, state, jnp.arange(steps))[1]
    return np.asarray(jax.jit(run)(state))

ref = run_prices(600, 600, 1.0)
for pa in (0.3, 0.35, 0.4, 0.45):
    for warm in (35, 40, 45, 50):
        p = run_prices(200, warm, pa)
        err = np.abs(p - ref)
        print(f"alpha={pa} warm={warm}: mean|dp|={err.mean():.3f} max={err.max():.2f}", flush=True)
