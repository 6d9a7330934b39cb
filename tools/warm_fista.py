"""Does carrying lambda across env steps let FISTA run fewer iterations?

Simulates an episode-like sequence: ub drifts slowly (demands), a is fresh
random each step (random policy — the WORST case for warm starts; a smooth
policy would correlate more). Compares warm-started k-iteration FISTA
against the f64 ground truth per step.
"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
import numpy as np, jax, jax.numpy as jnp
from sustaingym_tpu.envs import evcharging
from sustaingym_tpu.ops import qp
from proj_experiment import ground_truth

spec = evcharging.caltech_site()
op20 = qp.make_dual_soc_projection(spec.constraint_matrix, spec.phase_angles,
                                   spec.magnitudes, iters=20)
C = np.asarray(op20.C, np.float64)
radii = np.asarray(op20.radii, np.float64)
step = np.asarray(op20.step, np.float64)
n, m = spec.num_stations, len(radii)
rng = np.random.default_rng(0)

B, T = 64, 40
# drifting ub: plug/unplug events
ub = np.minimum(1.0, rng.uniform(0, 2, (B, n)))
ub[rng.uniform(size=ub.shape) < 0.3] = 0.0

Cj = jnp.asarray(C, jnp.float32)
rj = jnp.asarray(radii, jnp.float32)
t2 = jnp.repeat(jnp.asarray(step, jnp.float32), 2)
tr = jnp.asarray(step * radii, jnp.float32)


def fista_from(lam0, a, ub, iters):
    lam = lam0
    lam_prev = lam
    tk = jnp.ones(a.shape[:-1], jnp.float32)

    def shrink(w):
        pairs = w.reshape(*w.shape[:-1], m, 2)
        nr = jnp.sqrt(jnp.sum(pairs * pairs, -1) + 1e-12)
        sc = jnp.maximum(0.0, 1.0 - tr / nr)
        return (pairs * sc[..., None]).reshape(w.shape)

    def body(_, carry):
        lam, lam_prev, tk = carry
        tk1 = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk))
        beta = (tk - 1.0) / tk1
        y = lam + beta[..., None] * (lam - lam_prev)
        xbar = jnp.clip(a - y @ Cj, 0.0, ub)
        lam_new = shrink(y + t2 * (xbar @ Cj.T))
        prog = jnp.sum((lam_new - lam) * (lam - lam_prev), -1)
        tk1 = jnp.where(prog < 0.0, 1.0, tk1)
        return (lam_new, lam, tk1)

    lam, _, _ = jax.lax.fori_loop(0, iters, body, (lam, lam_prev, tk))
    return jnp.clip(a - lam @ Cj, 0.0, ub), lam


for iters, warm in ((20, False), (20, True), (12, True), (10, True),
                    (8, True), (12, False), (10, False)):
    lam = jnp.zeros((B, 2 * m), jnp.float32)
    ub_t = ub.copy()
    r2 = np.random.default_rng(7)
    errs = []
    for t in range(T):
        # drift: 5% of stations flip plug state
        flip = r2.uniform(size=(B, n)) < 0.05
        ub_t = np.where(flip, np.where(ub_t > 0, 0.0,
                                       np.minimum(1.0, r2.uniform(0, 2, (B, n)))),
                        ub_t)
        # demands deplete slowly
        ub_t = np.maximum(ub_t - r2.uniform(0, 0.02, (B, n)) * (ub_t > 0), 0)
        a = r2.uniform(0, 1, (B, n))
        x, lam_new = fista_from(lam if warm else jnp.zeros_like(lam),
                                jnp.asarray(a, jnp.float32),
                                jnp.asarray(ub_t, jnp.float32), iters)
        lam = lam_new
        xs = ground_truth(C, radii, a[None].reshape(B, n) * 0 + a,
                          ub_t, iters=4000)
        errs.append(np.abs(np.asarray(x, np.float64) - xs).max())
    errs = np.asarray(errs)
    print(f"iters={iters:2d} warm={warm}: maxerr={errs.max():.5f} "
          f"mean-of-max={errs.mean():.5f}")
