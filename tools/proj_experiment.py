"""Projection-algorithm shootout for the EV action feasibility projection.

Compares, on the real caltech cone geometry:
  - ADMM (production ops/qp.py path) at various iteration budgets
  - ADMM with bf16 matmul inputs (f32 accumulation)
  - dual-FISTA (accelerated proximal gradient on the 2m-dim dual)
against a numpy float64 high-iteration ADMM ground truth.

Metrics: max/mean |x - x*|, post-quantization pilot mismatch rate (the
error that actually reaches rewards), and device wall time per projection
batch at B=16384.

Run: python tools/proj_experiment.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sustaingym_tpu.envs import evcharging
from sustaingym_tpu.envs.evcharging.env import quantize_pilots
from sustaingym_tpu.ops import qp

B_ACC = 512        # accuracy batch
B_SPEED = 16384    # throughput batch
STEPS = 64         # throughput: sequential projections (mimic episode scan)


def ground_truth(C, radii, A, UB, iters=20000, rho=2.0, alpha=1.7):
    """float64 numpy ADMM, huge iteration budget."""
    n = C.shape[1]
    K = np.linalg.inv((1.0 + rho) * np.eye(n) + rho * (C.T @ C))
    x = np.clip(A, 0, UB)
    z0 = x.copy()
    u0 = np.zeros_like(x)
    zc = x @ C.T
    uc = np.zeros_like(zc)
    r2 = radii
    for _ in range(iters):
        rhs = A + rho * (z0 - u0) + rho * ((zc - uc) @ C)
        x = rhs @ K.T
        cx = x @ C.T
        xh = alpha * x + (1 - alpha) * z0
        cxh = alpha * cx + (1 - alpha) * zc
        z0 = np.clip(xh + u0, 0, UB)
        v = (cxh + uc).reshape(len(A), -1, 2)
        nr = np.sqrt((v ** 2).sum(-1) + 1e-12)
        sc = np.minimum(1.0, r2 / nr)
        zc = (v * sc[..., None]).reshape(len(A), -1)
        u0 = u0 + xh - z0
        uc = uc + cxh - zc
    return np.clip(x, 0, UB)


def dual_fista(C, radii, L, a, ub, iters, restart=True):
    """FISTA on the dual: min_l f*(-C'l) + sum r_k ||l_k||."""
    lam = jnp.zeros(a.shape[:-1] + (C.shape[0],), a.dtype)
    lam_prev = lam
    tk = jnp.ones(a.shape[:-1], a.dtype)

    def ball_shrink(w, t):
        pairs = w.reshape(*w.shape[:-1], -1, 2)
        nr = jnp.sqrt(jnp.sum(pairs * pairs, -1) + 1e-12)
        sc = jnp.maximum(0.0, 1.0 - t * radii / nr)
        return (pairs * sc[..., None]).reshape(w.shape)

    invL = 1.0 / L

    def body(_, carry):
        lam, lam_prev, tk = carry
        tk1 = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk))
        beta = (tk - 1.0) / tk1
        y = lam + beta[..., None] * (lam - lam_prev)
        xbar = jnp.clip(a - y @ C, 0.0, ub)
        lam_new = ball_shrink(y + invL * (xbar @ C.T), invL)
        if restart:
            # gradient restart: if the step moved against the momentum
            # direction, reset tk
            prog = jnp.sum((lam_new - lam) * (lam - lam_prev), -1)
            tk1 = jnp.where(prog < 0.0, 1.0, tk1)
        return (lam_new, lam, tk1)

    lam, _, _ = jax.lax.fori_loop(0, iters, body, (lam, lam_prev, tk))
    return jnp.clip(a - lam @ C, 0.0, ub)


def main():
    spec = evcharging.caltech_site()
    op30 = qp.make_soc_projection(
        spec.constraint_matrix, spec.phase_angles, spec.magnitudes, iters=30)
    C = np.asarray(op30.C, np.float64)
    radii = np.asarray(op30.radii, np.float64)
    n = spec.num_stations
    L = float(np.linalg.norm(C, 2) ** 2)
    print(f"n={n} cones={len(radii)} ||C||^2={L:.3f}")

    rng = np.random.default_rng(0)
    A = rng.uniform(0, 1, (B_ACC, n))
    # ub distribution like the env: min(1, demand-derived), many at 0 or 1
    UB = np.minimum(1.0, rng.uniform(0, 2, (B_ACC, n)))
    UB[rng.uniform(size=UB.shape) < 0.3] = 0.0

    xs = ground_truth(C, radii, A, UB)
    minp = jnp.asarray(spec.min_pilots, jnp.float32)
    q_star = np.asarray(quantize_pilots(jnp.asarray(xs, jnp.float32), minp))

    aj = jnp.asarray(A, jnp.float32)
    ubj = jnp.asarray(UB, jnp.float32)

    def report(name, x):
        x = np.asarray(x, np.float64)
        err = np.abs(x - xs)
        q = np.asarray(quantize_pilots(jnp.asarray(x, jnp.float32), minp))
        mism = (q != q_star).mean()
        # feasibility
        v = (x @ C.T).reshape(B_ACC, -1, 2)
        nr = np.sqrt((v ** 2).sum(-1))
        viol = np.maximum(nr - radii, 0).max()
        print(f"{name:42s} maxerr={err.max():.5f} meanerr={err.mean():.6f} "
              f"pilot-mism={mism*100:.3f}% maxviol={viol:.5f}")

    for iters in (10, 15, 20, 30, 50):
        op = qp.make_soc_projection(
            spec.constraint_matrix, spec.phase_angles, spec.magnitudes,
            iters=iters)
        report(f"admm a=1.7 rho=2 it={iters}", qp.project(op, aj, ubj))

    # rho sweep at 15/20 iters
    for rho in (1.0, 3.0, 5.0, 8.0):
        for iters in (15, 20):
            op = qp.make_soc_projection(
                spec.constraint_matrix, spec.phase_angles, spec.magnitudes,
                iters=iters, rho=rho)
            report(f"admm a=1.7 rho={rho} it={iters}",
                   qp.project(op, aj, ubj))

    for iters in (20, 30, 50, 80):
        report(f"fista it={iters} restart",
               dual_fista(jnp.asarray(C, jnp.float32),
                          jnp.asarray(radii, jnp.float32),
                          L, aj, ubj, iters))
        report(f"fista it={iters} norestart",
               dual_fista(jnp.asarray(C, jnp.float32),
                          jnp.asarray(radii, jnp.float32),
                          L, aj, ubj, iters, restart=False))

    # --- throughput on device -------------------------------------------
    print("\nthroughput (B=%d, %d sequential projections):" % (B_SPEED, STEPS))
    a_big = jnp.asarray(rng.uniform(0, 1, (B_SPEED, n)), jnp.float32)
    ub_big = jnp.asarray(np.minimum(1.0, rng.uniform(0, 2, (B_SPEED, n))),
                         jnp.float32)

    def timeit(name, fn):
        f = jax.jit(fn)
        f(a_big).block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            f(a_big).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        per = best / (B_SPEED * STEPS)
        print(f"{name:42s} {best*1e3:8.2f} ms  {per*1e9:7.1f} ns/env-proj "
              f"({B_SPEED*STEPS/best/1e6:.1f}M proj/s)")

    for iters in (15, 30):
        op = qp.make_soc_projection(
            spec.constraint_matrix, spec.phase_angles, spec.magnitudes,
            iters=iters)

        def admm_seq(a, op=op):
            def body(x, _):
                x = qp.project(op, x, ub_big)
                return x, ()
            x, _ = jax.lax.scan(body, a, None, length=STEPS)
            return x

        timeit(f"admm it={iters}", admm_seq)

    Cj = jnp.asarray(C, jnp.float32)
    rj = jnp.asarray(radii, jnp.float32)
    for iters in (15, 30):
        def fista_seq(a, iters=iters):
            def body(x, _):
                x = dual_fista(Cj, rj, L, x, ub_big, iters)
                return x, ()
            x, _ = jax.lax.scan(body, a, None, length=STEPS)
            return x

        timeit(f"fista it={iters}", fista_seq)


if __name__ == "__main__":
    main()
