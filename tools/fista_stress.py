"""Stability stress test for overstepped preconditioned dual-FISTA."""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
import numpy as np, jax, jax.numpy as jnp
from sustaingym_tpu.envs import evcharging
from sustaingym_tpu.ops import qp
from proj_experiment import ground_truth
from fista_tune import fista, t_pre, C, radii, n  # caltech objects

rng = np.random.default_rng(42)

# adversarial battery of (a, ub): corners, max pressure, sparse plugging
batt = []
batt.append((np.ones((1, n)), np.ones((1, n))))                 # full blast
batt.append((np.ones((1, n)), np.full((1, n), 0.03)))           # tiny ub
a = np.ones((64, n)); ub = np.zeros((64, n))
for i in range(64):
    idx = rng.choice(n, size=rng.integers(1, n), replace=False)
    ub[i, idx] = 1.0
batt.append((a, ub))                                            # sparse sets
batt.append((rng.uniform(0, 1, (256, n)) ** 0.1,
             np.minimum(1, rng.uniform(0, 2, (256, n)))))       # skewed high
A = np.concatenate([b[0] for b in batt])
UB = np.concatenate([b[1] for b in batt])
xs = ground_truth(C, radii, A, UB, iters=40000)
aj, ubj = jnp.asarray(A, jnp.float32), jnp.asarray(UB, jnp.float32)

for sc in (1.0, 2.0, 3.0):
    for it in (10, 15, 20, 50, 100, 400):
        x = np.asarray(fista(aj, ubj, it, t=t_pre * sc), np.float64)
        err = np.abs(x - xs).max()
        print(f"caltech x{sc} it={it:4d} maxerr={err:.6f}")
    print()

# JPL geometry
spec_j = evcharging.jpl_site()
opj = qp.make_soc_projection(spec_j.constraint_matrix, spec_j.phase_angles,
                             spec_j.magnitudes, iters=30)
Cjp = np.asarray(opj.C, np.float64)
rjp = np.asarray(opj.radii, np.float64)
nj = spec_j.num_stations
mj = len(rjp)
Gj = np.abs(Cjp @ Cjp.T)
tj = 1.0 / Gj.reshape(mj, 2, 2 * mj).sum(-1).max(-1)
sqT = np.sqrt(np.repeat(tj, 2))
print("jpl spectral headroom:", 1.0 / np.linalg.norm(sqT[:, None] * Cjp, 2) ** 2)

Aj = rng.uniform(0, 1, (256, nj))
UBj = np.minimum(1.0, rng.uniform(0, 2, (256, nj)))
UBj[rng.uniform(size=UBj.shape) < 0.3] = 0.0
xsj = ground_truth(Cjp, rjp, Aj, UBj, iters=40000)

import importlib
import fista_tune


def fista_j(a, ub, iters, t, restart=True):
    Cj_, rj_ = jnp.asarray(Cjp, jnp.float32), jnp.asarray(rjp, jnp.float32)
    tt = jnp.asarray(t, jnp.float32)
    lam = jnp.zeros(a.shape[:-1] + (2 * mj,), a.dtype)
    lam_prev, tk = lam, jnp.ones(a.shape[:-1], a.dtype)
    t2 = jnp.repeat(tt, 2)

    def shrink(w):
        pairs = w.reshape(*w.shape[:-1], mj, 2)
        nr = jnp.sqrt(jnp.sum(pairs * pairs, -1) + 1e-12)
        sc = jnp.maximum(0.0, 1.0 - tt * rj_ / nr)
        return (pairs * sc[..., None]).reshape(w.shape)

    def body(_, carry):
        lam, lam_prev, tk = carry
        tk1 = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk))
        beta = (tk - 1.0) / tk1
        y = lam + beta[..., None] * (lam - lam_prev)
        xbar = jnp.clip(a - y @ Cj_, 0.0, ub)
        lam_new = shrink(y + t2 * (xbar @ Cj_.T))
        prog = jnp.sum((lam_new - lam) * (lam - lam_prev), -1)
        tk1 = jnp.where(prog < 0.0, 1.0, tk1)
        return (lam_new, lam, tk1)

    lam, _, _ = jax.lax.fori_loop(0, iters, body, (lam, lam_prev, tk))
    return jnp.clip(a - lam @ Cj_, 0.0, ub)


ajj, ubjj = jnp.asarray(Aj, jnp.float32), jnp.asarray(UBj, jnp.float32)
for sc in (1.0, 2.0, 3.0):
    for it in (10, 15, 20, 100):
        x = np.asarray(fista_j(ajj, ubjj, it, tj * sc), np.float64)
        print(f"jpl x{sc} it={it:4d} maxerr={np.abs(x - xsj).max():.6f}")
