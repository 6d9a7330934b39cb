print("TOP", flush=True)
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
import numpy as np, jax, jax.numpy as jnp
from sustaingym_tpu.envs import evcharging
from sustaingym_tpu.ops import qp
print("pre-pe", flush=True)
from proj_experiment import ground_truth, dual_fista

print("pre-site", flush=True)
spec = evcharging.caltech_site()
op = qp.make_soc_projection(spec.constraint_matrix, spec.phase_angles,
                            spec.magnitudes, iters=30)
C = np.asarray(op.C, np.float64); radii = np.asarray(op.radii, np.float64)
n = spec.num_stations
rng = np.random.default_rng(0)
B = 64
A = rng.uniform(0, 1, (B, n))
UB = np.minimum(1.0, rng.uniform(0, 2, (B, n)))
UB[rng.uniform(size=UB.shape) < 0.3] = 0.0
t0 = time.time(); xs = ground_truth(C, radii, A, UB, iters=20000)
print("gt", round(time.time() - t0, 1), flush=True)
aj, ubj = jnp.asarray(A, jnp.float32), jnp.asarray(UB, jnp.float32)

x_def = np.asarray(qp.project(op, aj, ubj), np.float64)
print("admm30 DEFAULT prec maxerr:", np.abs(x_def - xs).max(), flush=True)
with jax.default_matmul_precision("float32"):
    x_hi = np.asarray(qp.project(op, aj, ubj), np.float64)
print("admm30 float32 prec maxerr:", np.abs(x_hi - xs).max(), flush=True)

L = float(np.linalg.norm(C, 2) ** 2)
Cj, rj = jnp.asarray(C, jnp.float32), jnp.asarray(radii, jnp.float32)
xf = np.asarray(dual_fista(Cj, rj, L, aj, ubj, 30), np.float64)
print("fista30 DEFAULT prec maxerr:", np.abs(xf - xs).max(), flush=True)
with jax.default_matmul_precision("float32"):
    xf = np.asarray(dual_fista(Cj, rj, L, aj, ubj, 30), np.float64)
print("fista30 float32 prec maxerr:", np.abs(xf - xs).max(), flush=True)
