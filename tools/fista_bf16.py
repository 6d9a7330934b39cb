"""Accuracy of the bf16-inner-loop FISTA variant (CPU emulation)."""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
import numpy as np, jax, jax.numpy as jnp
from sustaingym_tpu.envs import evcharging
from sustaingym_tpu.ops import qp
from proj_experiment import ground_truth

spec = evcharging.caltech_site()
op = qp.make_dual_soc_projection(spec.constraint_matrix, spec.phase_angles,
                                 spec.magnitudes, iters=20)
C = np.asarray(op.C, np.float64)
radii = np.asarray(op.radii, np.float64)
step = np.asarray(op.step, np.float64)
n, m = spec.num_stations, len(radii)

Cj = jnp.asarray(C, jnp.float32)
C16 = Cj.astype(jnp.bfloat16)
rj = jnp.asarray(radii, jnp.float32)
t2 = jnp.repeat(jnp.asarray(step, jnp.float32), 2)
tr = jnp.asarray(step * radii, jnp.float32)


def fista16(a, ub, iters, restart=False):
    a16 = a.astype(jnp.bfloat16)
    ub16 = ub.astype(jnp.bfloat16)
    lam = jnp.zeros(a.shape[:-1] + (2 * m,), jnp.float32)
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
        ydot = jax.lax.dot_general(y, Cj,
                                   (((y.ndim - 1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        xbar = jnp.clip(a16 - ydot.astype(jnp.bfloat16),
                        jnp.bfloat16(0), ub16)
        cx = jax.lax.dot_general(xbar, C16.T,
                                 (((xbar.ndim - 1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        lam_new = shrink(y + t2 * cx)
        if restart:
            prog = jnp.sum((lam_new - lam) * (lam - lam_prev), -1)
            tk1 = jnp.where(prog < 0.0, 1.0, tk1)
        return (lam_new, lam, tk1)

    lam, _, _ = jax.lax.fori_loop(0, iters, body, (lam, lam_prev, tk))
    return jnp.clip(a - lam @ Cj, 0.0, ub)


rng = np.random.default_rng(3)
B = 256
A = rng.uniform(0, 1, (B, n))
UB = np.minimum(1.0, rng.uniform(0, 2, (B, n)))
UB[rng.uniform(size=UB.shape) < 0.3] = 0.0
xs = ground_truth(C, radii, A, UB)
aj, ubj = jnp.asarray(A, jnp.float32), jnp.asarray(UB, jnp.float32)
for iters in (15, 18, 20, 25):
    for rs in (False, True):
        x = np.asarray(fista16(aj, ubj, iters, rs), np.float64)
        print(f"bf16 fista it={iters} restart={rs}: "
              f"maxerr={np.abs(x - xs).max():.5f} "
              f"meanerr={np.abs(x - xs).mean():.6f}")

# stress battery at production candidate
batt_a = [np.ones((1, n)), np.ones((1, n))]
batt_u = [np.ones((1, n)), np.full((1, n), 0.03)]
a_sp = np.ones((32, n)); ub_sp = np.zeros((32, n))
for i in range(32):
    idx = rng.choice(n, size=rng.integers(1, n), replace=False)
    ub_sp[i, idx] = 1.0
A2 = np.concatenate(batt_a + [a_sp]); U2 = np.concatenate(batt_u + [ub_sp])
xs2 = ground_truth(C, radii, A2, U2, iters=20000)
for iters in (20, 25):
    for rs in (True, False):
        x = np.asarray(fista16(jnp.asarray(A2, jnp.float32),
                               jnp.asarray(U2, jnp.float32), iters, rs),
                       np.float64)
        print(f"stress bf16 it={iters} restart={rs}: "
              f"maxerr={np.abs(x - xs2).max():.5f}")
