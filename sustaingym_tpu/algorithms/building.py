"""Building MPC controller.

Mirrors /root/reference/sustaingym/algorithms/building/mpc_controller.py
(:9 MPCAgent physics model, :122 data-driven variant): minimize
beta * ||(x_1 - target) o ac|| + (1-beta) * 24 * ||u|| over the predicted
RC dynamics with box-constrained actions. The reference's ECOS_BB solve
becomes a fixed-iteration projected-gradient descent with jax autodiff —
smooth convex objective, box projection, fully vmappable across env
instances.

Note: the reference MPCAgent reads ``env.B_d``, which BuildingEnv never
defines (it has ``BD_d``) — a latent reference bug (SURVEY.md §0); this
implementation uses the discrete-time ``BD_d`` throughout.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..envs.building.env import (BuildingParams, SCALING_FACTOR,
                                 calc_occupower)
from .base import BaseAlgorithm


def mpc_action(params: BuildingParams, x0: jax.Array, epoch: jax.Array,
               beta: float | None = None, pnorm: float = 2.0,
               planning_steps: int = 1, iters: int = 300,
               lr: float = 0.05) -> jax.Array:
    """Plans ``planning_steps`` ahead, returns the first action (n,)."""
    n = params.n
    dtype = params.A_d.dtype
    if beta is None:
        beta = float(params.error_rate)
    q_rate = (1.0 - beta) * SCALING_FACTOR

    avg = jnp.sum(x0) / n
    meta = params.metabolism[epoch]
    ghi = params.ghi[epoch]
    if params.data_driven:
        # identified-dynamics input layout (n+7 BD_d columns):
        # [avg^2, avg, meta^2, meta, ground, out, u(n), ghi] — the reference
        # MPCAgent_DataDriven holds avg/meta at their x0 values over the
        # whole planning horizon (mpc_controller.py:191-205); mirrored here
        exo = jnp.stack([avg * avg, avg, meta * meta, meta,
                         params.ground_temp[epoch], params.out_temp[epoch]])
    else:
        # physics layout (n+4 columns): [occupower, ground, out, u(n), ghi]
        occ = calc_occupower(avg, meta)
        exo = jnp.stack([occ, params.ground_temp[epoch],
                         params.out_temp[epoch]])

    def predict(x, u):
        y = jnp.concatenate([exo, u, ghi[None]])
        return params.A_d @ x + params.BD_d @ y

    def objective(us):
        def body(carry, u):
            x = carry
            x1 = predict(x, u)
            err = (x1 - params.target) * params.ac_map
            cost = (beta * jnp.linalg.norm(err + 1e-12, pnorm)
                    + q_rate * jnp.linalg.norm(u + 1e-12, pnorm))
            return x1, cost

        _, costs = jax.lax.scan(body, x0, us)
        return jnp.sum(costs)

    grad_fn = jax.grad(objective)
    lo = -params.ac_map
    hi = params.ac_map

    def pgd(_, us):
        g = grad_fn(us)
        return jnp.clip(us - lr * g, lo[None, :], hi[None, :])

    us0 = jnp.zeros((planning_steps, n), dtype)
    us = jax.lax.fori_loop(0, iters, pgd, us0)
    return us[0]


class MPCAgent(BaseAlgorithm):
    """Imperative wrapper over :func:`mpc_action` for the gym adapter."""

    def __init__(self, env, beta: float | None = None, pnorm: float = 2.0,
                 planning_steps: int = 1, iters: int = 300):
        super().__init__(env)
        self.params: BuildingParams = env.params
        self._fn = jax.jit(lambda x0, epoch: mpc_action(
            self.params, x0, epoch, beta=beta, pnorm=pnorm,
            planning_steps=planning_steps, iters=iters))

    def get_action(self, observation):
        state = self.env._state
        return np.asarray(self._fn(state.x, state.epoch))
