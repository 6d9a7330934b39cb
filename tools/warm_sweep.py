import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from sustaingym_tpu.envs import electricitymarket as em

steps = 96
prices = {}
CONFIGS = [(200, 100, 1.0, 1.0), (200, 40, 1.0, 0.5),
           (200, 50, 1.0, 0.5), (200, 60, 1.0, 0.5),
           (200, 50, 1.0, 0.3), (200, 50, 1.0, 0.7),
           (150, 50, 1.0, 0.5), (100, 50, 1.0, 0.5)]
for cold, warm, relax, pa in CONFIGS:
    env, params = em.make_env(month="2021-05", horizon=4, lp_iters=cold,
                              lp_warm_iters=warm, lp_relax=relax,
                              lp_precond_alpha=pa)
    state, _ = env.reset_at_day(params, 0)

    def run(state, params=params, env=env):
        def body(state, t):
            a = jnp.concatenate([jnp.full(4, 20.0), jnp.full(4, 60.0)])
            state, ts = env.step(params, state, a, jax.random.PRNGKey(0))
            return state, ts.info["price"]
        return jax.lax.scan(body, state, jnp.arange(steps))[1]

    prices[(warm, relax, pa)] = np.asarray(jax.jit(run)(state))
env, params = em.make_env(month="2021-05", horizon=4, lp_iters=600,
                          lp_warm_iters=600)
state, _ = env.reset_at_day(params, 0)
p600 = np.asarray(jax.jit(lambda s: run(s, params, env))(state))
for k in prices:
    err = np.abs(prices[k] - p600)
    print(f"warm={k[0]} relax={k[1]} alpha={k[2]} vs flat600: mean={err.mean():.3f} max={err.max():.3f}")
