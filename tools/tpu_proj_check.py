"""On-TPU validation + bench of the dual-FISTA EV projection."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from sustaingym_tpu.envs import evcharging
from sustaingym_tpu.ops import qp
from proj_experiment import ground_truth

spec = evcharging.caltech_site()
op = qp.make_dual_soc_projection(spec.constraint_matrix, spec.phase_angles,
                                 spec.magnitudes, iters=20)
op_admm = qp.make_soc_projection(spec.constraint_matrix, spec.phase_angles,
                                 spec.magnitudes, iters=30)
C = np.asarray(op.C, np.float64); radii = np.asarray(op.radii, np.float64)
n = spec.num_stations
rng = np.random.default_rng(3)
B = 64
A = rng.uniform(0, 1, (B, n))
UB = np.minimum(1.0, rng.uniform(0, 2, (B, n)))
UB[rng.uniform(size=UB.shape) < 0.3] = 0.0
xs = ground_truth(C, radii, A, UB)
aj, ubj = jnp.asarray(A, jnp.float32), jnp.asarray(UB, jnp.float32)
x = np.asarray(jax.jit(lambda a, u: qp.project(op, a, u))(aj, ubj), np.float64)
print("TPU DEFAULT-precision dual-FISTA-20 maxerr:", np.abs(x - xs).max(),
      flush=True)
xa = np.asarray(jax.jit(lambda a, u: qp.project(op_admm, a, u))(aj, ubj),
                np.float64)
print("TPU pinned-f32 ADMM-30 maxerr:", np.abs(xa - xs).max(), flush=True)
