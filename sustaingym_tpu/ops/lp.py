"""Batched fixed-iteration LP solver (PDHG / Chambolle-Pock) with duals.

Built for the ElectricityMarketEnv SCED clearing solve
(docs spec: /root/reference/docs/electricitymarketenv.md:3,18 — every 5-min
step the market operator solves a multi-timestep security-constrained
economic dispatch and the clearing PRICE is the dual of the power-balance
constraint). Interior-point/simplex solvers are control-flow-heavy and
host-bound; PDHG is pure matvecs with a deterministic iteration count, so
thousands of market instances clear in lockstep on the MXU
(BASELINE.json config: "batch 4096").

Problem form:
    minimize    c' x
    subject to  A x = b          (duals y -> prices)
                G x <= h         (duals z >= 0)
                lb <= x <= ub

Iteration (with over-relaxation \bar{x} and diagonal step sizes):
    x+ = clip(x - tau * (c + A' y + G' z), lb, ub)
    y+ = y + sigma_A * (A (2 x+ - x) - b)
    z+ = max(0, z + sigma_G * (G (2 x+ - x) - h))
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.struct import dataclass, static_field

__all__ = ["LPOperator", "make_lp_operator", "solve_lp", "LPSolution"]


@dataclass
class LPOperator:
    """Static problem structure with host-precomputed step sizes."""
    A: jax.Array        # (me, n)
    G: jax.Array        # (mi, n)
    tau: jax.Array      # (n,) primal step
    sigma_a: jax.Array  # (me,) dual step (equalities)
    sigma_g: jax.Array  # (mi,) dual step (inequalities)
    n: int = static_field()
    me: int = static_field()
    mi: int = static_field()
    iters: int = static_field(default=400)


class LPSolution(NamedTuple):
    x: jax.Array   # primal
    y: jax.Array   # equality duals (prices)
    z: jax.Array   # inequality duals


def make_lp_operator(A: np.ndarray, G: np.ndarray, iters: int = 400,
                     dtype=jnp.float32) -> LPOperator:
    """Builds the operator with diagonal (Pock-Chambolle) preconditioning:
    tau_j = 1 / sum_i |K_ij|, sigma_i = 1 / sum_j |K_ij|."""
    A = np.atleast_2d(np.asarray(A, np.float64))
    G = np.atleast_2d(np.asarray(G, np.float64))
    K = np.vstack([A, G])
    col = np.abs(K).sum(axis=0)
    tau = 1.0 / np.maximum(col, 1e-6)
    row_a = np.abs(A).sum(axis=1)
    row_g = np.abs(G).sum(axis=1)
    sigma_a = 1.0 / np.maximum(row_a, 1e-6)
    sigma_g = 1.0 / np.maximum(row_g, 1e-6)
    return LPOperator(
        A=jnp.asarray(A, dtype), G=jnp.asarray(G, dtype),
        tau=jnp.asarray(tau, dtype), sigma_a=jnp.asarray(sigma_a, dtype),
        sigma_g=jnp.asarray(sigma_g, dtype),
        n=A.shape[1], me=A.shape[0], mi=G.shape[0], iters=int(iters))


def solve_lp(op: LPOperator, c: jax.Array, b: jax.Array, h: jax.Array,
             lb: jax.Array, ub: jax.Array,
             init: LPSolution | None = None) -> LPSolution:
    """Solves one LP (or a batch: all args broadcast over leading dims).

    ``init`` warm-starts the primal/dual iterates — for sequences of
    slowly-varying problems (receding-horizon SCED: each 5-min step shifts
    the horizon one interval) this cuts the iterations needed for a given
    tolerance several-fold.
    """
    if init is None:
        x = jnp.clip(jnp.zeros_like(c), lb, ub)
        y = jnp.zeros_like(b)
        z = jnp.zeros_like(h)
    else:
        x = jnp.clip(init.x, lb, ub)
        y = init.y
        z = jnp.maximum(init.z, 0.0)

    def body(_, carry):
        x, y, z = carry
        grad = c + y @ op.A + z @ op.G
        x_new = jnp.clip(x - op.tau * grad, lb, ub)
        x_bar = 2.0 * x_new - x
        y = y + op.sigma_a * (x_bar @ op.A.T - b)
        z = jnp.maximum(0.0, z + op.sigma_g * (x_bar @ op.G.T - h))
        return (x_new, y, z)

    x, y, z = jax.lax.fori_loop(0, op.iters, body, (x, y, z))
    return LPSolution(x=x, y=y, z=z)
