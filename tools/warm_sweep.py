import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from sustaingym_tpu.envs import electricitymarket as em

steps = 96
prices = {}
for warm in (200, 75, 100, 125):
    env, params = em.make_env(month="2021-05", horizon=4, lp_iters=200,
                              lp_warm_iters=warm)
    state, _ = env.reset_at_day(params, 0)

    def run(state, params=params, env=env):
        def body(state, t):
            a = jnp.concatenate([jnp.full(4, 20.0), jnp.full(4, 60.0)])
            state, ts = env.step(params, state, a, jax.random.PRNGKey(0))
            return state, ts.info["price"]
        return jax.lax.scan(body, state, jnp.arange(steps))[1]

    prices[warm] = np.asarray(jax.jit(run)(state))
for warm in (75, 100, 125):
    err = np.abs(prices[warm] - prices[200])
    print(f"warm={warm}: mean={err.mean():.3f} max={err.max():.3f}")
# also vs a 600-iter flat reference
env, params = em.make_env(month="2021-05", horizon=4, lp_iters=600,
                          lp_warm_iters=600)
state, _ = env.reset_at_day(params, 0)
p600 = np.asarray(jax.jit(lambda s: run(s, params, env))(state))
for warm in (75, 100, 125, 200):
    err = np.abs(prices[warm] - p600)
    print(f"warm={warm} vs flat600: mean={err.mean():.3f} max={err.max():.3f}")
