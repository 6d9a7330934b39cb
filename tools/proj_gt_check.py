"""Sanity-check the projection ground truth with scipy SLSQP."""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
import numpy as np
from scipy.optimize import minimize

from sustaingym_tpu.envs import evcharging
from sustaingym_tpu.ops import qp

spec = evcharging.caltech_site()
op = qp.make_soc_projection(
    spec.constraint_matrix, spec.phase_angles, spec.magnitudes, iters=30)
C = np.asarray(op.C, np.float64)
radii = np.asarray(op.radii, np.float64)
n = spec.num_stations

rng = np.random.default_rng(0)
from proj_experiment import ground_truth, dual_fista  # noqa: E402
import jax.numpy as jnp  # noqa: E402

for trial in range(3):
    a = rng.uniform(0, 1, n)
    ub = np.minimum(1.0, rng.uniform(0, 2, n))
    ub[rng.uniform(size=n) < 0.3] = 0.0

    cons = []
    for k in range(len(radii)):
        Ck = C[2 * k:2 * k + 2]
        cons.append({
            "type": "ineq",
            "fun": lambda x, Ck=Ck, r=radii[k]: r ** 2 - np.sum((Ck @ x) ** 2),
            "jac": lambda x, Ck=Ck: -2.0 * Ck.T @ (Ck @ x),
        })
    res = minimize(lambda x: 0.5 * np.sum((x - a) ** 2),
                   np.clip(a, 0, ub), jac=lambda x: x - a,
                   bounds=list(zip(np.zeros(n), ub)), constraints=cons,
                   method="SLSQP", options={"maxiter": 500, "ftol": 1e-12})
    x_gt = ground_truth(C, radii, a[None], ub[None])[0]
    x_admm30 = np.asarray(qp.project(op, jnp.asarray(a, jnp.float32),
                                     jnp.asarray(ub, jnp.float32)))
    L = float(np.linalg.norm(C, 2) ** 2)
    x_f = np.asarray(dual_fista(jnp.asarray(C, jnp.float32),
                                jnp.asarray(radii, jnp.float32), L,
                                jnp.asarray(a, jnp.float32),
                                jnp.asarray(ub, jnp.float32), 50))

    def obj(x):
        return 0.5 * np.sum((x - a) ** 2)

    print(f"trial {trial}: slsqp ok={res.success} f={obj(res.x):.6f} "
          f"f_gt={obj(x_gt):.6f} f_admm30={obj(x_admm30):.6f} "
          f"f_fista50={obj(x_f):.6f}")
    print(f"  |slsqp-gt|={np.abs(res.x - x_gt).max():.6f} "
          f"|slsqp-admm30|={np.abs(res.x - x_admm30).max():.6f} "
          f"|slsqp-fista|={np.abs(res.x - x_f).max():.6f}")
