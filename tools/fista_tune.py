"""Tune dual-FISTA variants for the EV projection (accuracy on CPU)."""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
import numpy as np, jax, jax.numpy as jnp
from sustaingym_tpu.envs import evcharging
from sustaingym_tpu.envs.evcharging.env import quantize_pilots
from sustaingym_tpu.ops import qp
from proj_experiment import ground_truth

spec = evcharging.caltech_site()
op = qp.make_soc_projection(spec.constraint_matrix, spec.phase_angles,
                            spec.magnitudes, iters=30)
C = np.asarray(op.C, np.float64); radii = np.asarray(op.radii, np.float64)
n = spec.num_stations
m = len(radii)
L = float(np.linalg.norm(C, 2) ** 2)

rng = np.random.default_rng(0)
B = 512
A = rng.uniform(0, 1, (B, n))
UB = np.minimum(1.0, rng.uniform(0, 2, (B, n)))
UB[rng.uniform(size=UB.shape) < 0.3] = 0.0
xs = ground_truth(C, radii, A, UB, iters=20000)
minp = jnp.asarray(spec.min_pilots, jnp.float32)
q_star = np.asarray(quantize_pilots(jnp.asarray(xs, jnp.float32), minp))
aj, ubj = jnp.asarray(A, jnp.float32), jnp.asarray(UB, jnp.float32)
Cj, rj = jnp.asarray(C, jnp.float32), jnp.asarray(radii, jnp.float32)

# per-cone preconditioner: t_k = 1 / rowsum of |CC^T| over the cone's 2 rows
G = np.abs(C @ C.T)
block_rowsum = G.reshape(m, 2, 2 * m).sum(-1).max(-1)  # (m,)
t_pre = 1.0 / block_rowsum
print("1/L =", 1.0 / L, " t_pre:", t_pre.round(4))


def fista(a, ub, iters, t=None, restart=True):
    """t: (m,) per-cone steps (None -> 1/L global)."""
    tt = jnp.asarray(np.full(m, 1.0 / L) if t is None else t, jnp.float32)
    lam = jnp.zeros(a.shape[:-1] + (2 * m,), a.dtype)
    lam_prev = lam
    tk = jnp.ones(a.shape[:-1], a.dtype)
    t2 = jnp.repeat(tt, 2)

    def shrink(w):
        pairs = w.reshape(*w.shape[:-1], m, 2)
        nr = jnp.sqrt(jnp.sum(pairs * pairs, -1) + 1e-12)
        sc = jnp.maximum(0.0, 1.0 - tt * rj / nr)
        return (pairs * sc[..., None]).reshape(w.shape)

    def body(_, carry):
        lam, lam_prev, tk = carry
        tk1 = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk))
        beta = (tk - 1.0) / tk1
        y = lam + beta[..., None] * (lam - lam_prev)
        xbar = jnp.clip(a - y @ Cj, 0.0, ub)
        lam_new = shrink(y + t2 * (xbar @ Cj.T))
        if restart:
            prog = jnp.sum((lam_new - lam) * (lam - lam_prev), -1)
            tk1 = jnp.where(prog < 0.0, 1.0, tk1)
        return (lam_new, lam, tk1)

    lam, _, _ = jax.lax.fori_loop(0, iters, body, (lam, lam_prev, tk))
    return jnp.clip(a - lam @ Cj, 0.0, ub)


def report(name, x):
    x = np.asarray(x, np.float64)
    err = np.abs(x - xs)
    q = np.asarray(quantize_pilots(jnp.asarray(x, jnp.float32), minp))
    mism = (q != q_star).mean()
    v = (x @ C.T).reshape(B, -1, 2)
    nr = np.sqrt((v ** 2).sum(-1))
    viol = np.maximum(nr - radii, 0).max()
    print(f"{name:46s} maxerr={err.max():.5f} meanerr={err.mean():.6f} "
          f"pilot-mism={mism*100:.3f}% maxviol={viol:.5f}")


for it in (8, 10, 12, 15, 20, 30):
    report(f"fista global it={it}", fista(aj, ubj, it))
for it in (8, 10, 12, 15, 20, 30):
    report(f"fista precond it={it}", fista(aj, ubj, it, t=t_pre))
for it in (8, 10, 12, 15, 20):
    report(f"fista precond norestart it={it}",
           fista(aj, ubj, it, t=t_pre, restart=False))
# overstep: precond times 1.5
for sc in (1.5, 2.0):
    for it in (10, 15, 20):
        report(f"fista precond x{sc} it={it}", fista(aj, ubj, it, t=t_pre * sc))

# exact spectral scaling: largest s with || sqrt(s*T) C ||^2 <= 1
sqT = np.sqrt(np.repeat(t_pre, 2))
sig = np.linalg.norm(sqT[:, None] * C, 2) ** 2
s_max = 1.0 / sig
print(f"\nexact spectral headroom: s_max = {s_max:.3f}")
for it in (10, 12, 15, 20):
    report(f"fista precond x{s_max:.2f} (spectral) it={it}",
           fista(aj, ubj, it, t=t_pre * s_max))
for sc in (2.5, 3.0):
    for it in (10, 15):
        report(f"fista precond x{sc} it={it}", fista(aj, ubj, it, t=t_pre * sc))
