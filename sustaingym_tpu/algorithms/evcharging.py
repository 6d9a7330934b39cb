"""EV-charging baselines: greedy, random, MPC, offline-optimal.

Mirrors /root/reference/sustaingym/algorithms/evcharging/baselines.py
(:22 Greedy, :38 Random, :54 MPC, :130 OfflineOptimal) with the cvxpy+MOSEK
solves replaced by batched fixed-iteration kernels:

- MPC: a per-step LP over the lookahead window (profit - carbon objective,
  demand + network constraints) solved by the PDHG kernel (ops/lp.py). The
  complex-magnitude network constraint is outer-approximated by J tangent
  cuts per constraint — cos(pi/J) tight (<2% at J=16), absorbed by pilot
  quantization exactly like the reference's solver tolerance;
- OfflineOptimal: the full-horizon (288-step) LP with true arrivals /
  departures, solved once per episode by a structured PDHG that exploits
  the per-timestep block structure (no dense (T n) x (T n) systems).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import Box
from ..envs.evcharging.env import (A_PERS_TO_KWH, ACTION_SCALE_FACTOR,
                                   CARBON_COST_FACTOR, MAX_TIMESTEP,
                                   PROFIT_FACTOR, EVParams)
from ..ops import lp
from .base import BaseAlgorithm

MAX_ACTION = 1.0
D_MAX_ACTION = 4  # discrete action wrapper maximum (baselines.py:19)


class GreedyAlgorithm(BaseAlgorithm):
    """Max pilot wherever demand is nonzero (baselines.py:22-35)."""

    def __init__(self, env):
        super().__init__(env)
        import gymnasium
        self.continuous = isinstance(env.action_space, gymnasium.spaces.Box)
        self.max_action = MAX_ACTION if self.continuous else D_MAX_ACTION

    def get_action(self, observation):
        return np.where(observation["demands"] > 0, self.max_action, 0
                        ).astype(np.float32)


class RandomAlgorithm(BaseAlgorithm):
    """Uniform-random pilots (baselines.py:38-51)."""

    def __init__(self, env):
        super().__init__(env)
        import gymnasium
        self.continuous = isinstance(env.action_space, gymnasium.spaces.Box)
        self.rng = np.random.default_rng()

    def get_action(self, observation):
        n = observation["demands"].shape[-1]
        if self.continuous:
            return self.rng.random(n).astype(np.float32)
        return self.rng.choice(D_MAX_ACTION + 1, size=n).astype(np.float32)


def _tangent_rows(params: EVParams, n_tangents: int) -> tuple[np.ndarray, np.ndarray]:
    """Polyhedral outer approximation of ||C_k x|| <= r_k: for angles
    theta_j, cos(theta_j) Re_k x + sin(theta_j) Im_k x <= r_k."""
    re = np.asarray(params.constraint_re)
    im = np.asarray(params.constraint_im)
    r = np.asarray(params.magnitudes) / ACTION_SCALE_FACTOR
    rows, rhs = [], []
    for j in range(n_tangents):
        th = 2 * np.pi * j / n_tangents
        rows.append(np.cos(th) * re + np.sin(th) * im)
        rhs.append(r)
    return np.vstack(rows), np.concatenate(rhs)


class MPC(BaseAlgorithm):
    """Lookahead LP: maximize profit - carbon over the next L steps
    (baselines.py:54-127)."""

    def __init__(self, env, lookahead: int = 12, n_tangents: int = 16,
                 lp_iters: int = 600):
        super().__init__(env)
        params: EVParams = env.params
        self.params = params
        self.L = lookahead
        assert lookahead <= params.moer_forecast_steps
        n = params.n_stations
        tan, tan_rhs = _tangent_rows(params, n_tangents)
        m_tan = tan.shape[0]

        # variable layout: x[t * n + i], t = 0..L-1
        G_rows = []
        # demand coupling: sum_t x[i, t] <= demand_i / (A_PERS * 32)
        dem = np.tile(np.eye(n), (1, lookahead))
        G_rows.append(dem)
        # network tangents per timestep
        for t in range(lookahead):
            blk = np.zeros((m_tan, n * lookahead))
            blk[:, t * n:(t + 1) * n] = tan
            G_rows.append(blk)
        G = np.vstack(G_rows)
        self._tan_rhs = np.tile(tan_rhs, lookahead)
        A = np.zeros((0, n * lookahead))
        self.op = lp.make_lp_operator(A, G, iters=lp_iters)
        self.n = n

        scale = ACTION_SCALE_FACTOR

        @jax.jit
        def solve(demands, moers, est_dep):
            # mask: charge allowed until estimated departure
            # (baselines.py:116-124)
            cur = jnp.where(demands > 0,
                            jnp.maximum(1.0, est_dep), 0.0)
            tgrid = jnp.arange(lookahead)[:, None]
            mask = (tgrid < cur[None, :]).astype(jnp.float32)  # (L, n)
            c = scale * (CARBON_COST_FACTOR * moers[:, None]
                         - PROFIT_FACTOR) * jnp.ones((lookahead, n), jnp.float32)
            c = (c * mask).reshape(-1)
            # LP argmin is invariant to positive scaling of c; normalize so
            # PDHG's objective step is commensurate with the unit-scale
            # constraint projections
            c = c / (jnp.max(jnp.abs(c)) + 1e-12)
            ub = mask.reshape(-1)
            h = jnp.concatenate([
                demands / A_PERS_TO_KWH / scale,
                jnp.asarray(self._tan_rhs, jnp.float32)])
            sol = lp.solve_lp(self.op, c, jnp.zeros((0,), jnp.float32), h,
                              jnp.zeros_like(ub), ub)
            return sol.x.reshape(lookahead, n)[0]

        self._solve = solve

    def get_action(self, observation):
        return np.asarray(self._solve(
            jnp.asarray(observation["demands"]),
            jnp.asarray(observation["forecasted_moer"][:self.L]),
            jnp.asarray(observation["est_departures"])))


def offline_optimal_schedule(params: EVParams, day: int,
                             n_tangents: int = 16, iters: int = 3000
                             ) -> np.ndarray:
    """Solves the full-horizon LP with true arrivals/departures
    (baselines.py:130-223) via structured PDHG; returns (288, n) pilots in
    [0, 1]."""
    n = params.n_stations
    T = MAX_TIMESTEP
    ev = np.asarray(params.ev_data)[day]
    st = np.asarray(params.ev_station)[day]
    mask_ev = np.asarray(params.ev_mask)[day]
    max_evs = ev.shape[0]

    # per-session charge windows (arrival..departure-1) and one-hot stations
    tgrid = np.arange(T)[None, :]
    win = ((tgrid >= ev[:, 0:1]) & (tgrid < ev[:, 1:2])
           & mask_ev[:, None]).astype(np.float32)       # (max_evs, T)
    S = np.zeros((max_evs, n), np.float32)
    S[np.arange(max_evs), st] = mask_ev.astype(np.float32)
    q = ev[:, 3] * mask_ev / A_PERS_TO_KWH / ACTION_SCALE_FACTOR  # A-periods

    # station-time availability mask (union of session windows per station)
    xmask = np.einsum("et,ei->ti", win, S)
    xmask = np.minimum(xmask, 1.0).astype(np.float32)   # (T, n)

    tan, tan_rhs = _tangent_rows(params, n_tangents)    # (mJ, n), (mJ,)
    moer = np.asarray(params.moer)[day, 1:T + 1, 0]
    c = (ACTION_SCALE_FACTOR
         * (CARBON_COST_FACTOR * moer[:, None] - PROFIT_FACTOR)
         * np.ones((T, n), np.float32))
    c = c / (np.max(np.abs(c)) + 1e-12)

    # PDHG steps (row/col-sum preconditioning over the structured operator)
    col_sum = np.abs(tan).sum(axis=0)[None, :] + np.einsum("et,ei->ti", win, S)
    tau = 1.0 / np.maximum(col_sum, 1e-6)
    sig_tan = 1.0 / np.maximum(np.abs(tan).sum(axis=1), 1e-6)
    sig_dem = 1.0 / np.maximum((win.sum(1) * S.sum(1)), 1e-6)

    tan_j = jnp.asarray(tan, jnp.float32)
    win_j = jnp.asarray(win, jnp.float32)
    S_j = jnp.asarray(S, jnp.float32)
    c_j = jnp.asarray(c, jnp.float32)
    ub = jnp.asarray(xmask, jnp.float32)
    tau_j = jnp.asarray(tau, jnp.float32)
    sig_tan_j = jnp.asarray(sig_tan, jnp.float32)
    sig_dem_j = jnp.asarray(sig_dem, jnp.float32)
    tan_rhs_j = jnp.asarray(tan_rhs, jnp.float32)
    q_j = jnp.asarray(q, jnp.float32)

    @jax.jit
    def solve():
        x = jnp.zeros((T, n), jnp.float32)
        z = jnp.zeros((T, tan_j.shape[0]), jnp.float32)   # tangent duals
        w = jnp.zeros((max_evs,), jnp.float32)            # demand duals

        def body(_, carry):
            x, z, w = carry
            # adjoints: z (T,mJ) @ tan (mJ,n) + sessions
            grad = c_j + z @ tan_j + (win_j * w[:, None]).T @ S_j
            x_new = jnp.clip(x - tau_j * grad, 0.0, ub)
            xb = 2 * x_new - x
            z = jnp.maximum(0.0, z + sig_tan_j *
                            (xb @ tan_j.T - tan_rhs_j[None, :]))
            # sess_e = sum_t win[e,t] * x[t, station_e]
            sess = jnp.sum((xb @ S_j.T).T * win_j, axis=1)
            w = jnp.maximum(0.0, w + sig_dem_j * (sess - q_j))
            return (x_new, z, w)

        x, z, w = jax.lax.fori_loop(0, iters, body, (x, z, w))
        return x

    return np.asarray(solve())


class OfflineOptimal(BaseAlgorithm):
    """Replays the precomputed full-horizon optimal schedule."""

    def __init__(self, env, n_tangents: int = 16, iters: int = 3000):
        super().__init__(env)
        self.n_tangents = n_tangents
        self.iters = iters
        self._traj: np.ndarray | None = None
        self._t = 0

    def reset(self) -> None:
        day = int(np.asarray(self.env._state.day))
        self._traj = offline_optimal_schedule(
            self.env.params, day, self.n_tangents, self.iters)
        self._t = 0

    def get_action(self, observation):
        a = self._traj[min(self._t, MAX_TIMESTEP - 1)]
        self._t += 1
        return a
