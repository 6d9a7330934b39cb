"""Data-driven BuildingEnv dynamics identification.

Mirrors BuildingEnv.train (/root/reference/sustaingym/envs/building/
env.py:436-490): fit next-state = [A_d | BD_d] @ [X; Y] by non-negative
least squares (no intercept) over observed (state, action) trajectories,
where Y = [avg^2, avg, meta^2, meta, ground, out, a/maxpower, ghi].
Returns a new ``BuildingParams`` with the identified matrices and
``data_driven=True`` so the jittable step uses the extended input layout.
"""
from __future__ import annotations

import numpy as np

from .env import BuildingParams


def fit_data_driven(params: BuildingParams, states: np.ndarray,
                    actions: np.ndarray, start_epoch: int = 0
                    ) -> BuildingParams:
    """Identifies A_d/BD_d from a trajectory.

    Args:
        params: physics-model params (source of exogenous series).
        states: (T+1, n) zone-temperature trajectory.
        actions: (T, n) applied HVAC powers IN WATTS (the reference stores
            ``action * maxpower`` in its actionlist, env.py:299).
        start_epoch: epoch of states[0] in the weather arrays.
    """
    import jax.numpy as jnp
    from sklearn import linear_model

    n = params.n
    out_temp = np.asarray(params.out_temp)
    ground = np.asarray(params.ground_temp)
    ghi = np.asarray(params.ghi)
    meta_arr = np.asarray(params.metabolism)

    xs, ys = [], []
    for i in range(len(states) - 1):
        x = np.asarray(states[i], dtype=np.float64)
        e = start_epoch + i
        avg = x.sum() / n
        meta = meta_arr[e]
        y = np.concatenate([
            [avg ** 2, avg, meta ** 2, meta, ground[e], out_temp[e]],
            np.asarray(actions[i]) / params.max_power,
            [ghi[e]],
        ])
        xs.append(np.concatenate([x, y]))
        ys.append(np.asarray(states[i + 1], dtype=np.float64))

    model = linear_model.LinearRegression(fit_intercept=False, positive=True)
    beta = model.fit(np.asarray(xs), np.asarray(ys)).coef_

    dtype = params.A_d.dtype
    return params.replace(
        A_d=jnp.asarray(beta[:, :n], dtype),
        BD_d=jnp.asarray(beta[:, n:], dtype),
        data_driven=True)
