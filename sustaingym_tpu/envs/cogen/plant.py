"""Combined-cycle plant surrogate: 18 inputs -> 29 outputs, pure JAX.

The reference CogenEnv evaluates an ONNX MLP surrogate of a 3x(GT+HRSG) +
steam-turbine cogeneration plant (/root/reference/sustaingym/envs/cogen/
env.py:294-305). The snapshot ships only the signature
(data/cogen/onnx_model/model.json) — ``model.onnx`` itself is absent — so no
implementation of the true network exists anywhere. This module provides a
from-scratch, physics-informed surrogate with the exact 18->29 signature,
fully differentiable and jit/vmap-friendly:

- gas-turbine fuel flow from a quadratic heat-rate curve with ambient
  temperature derate, evaporative-cooler (EVC) wet-bulb correction and
  power-augmentation (PAC) uplift;
- HRSG steam capability linear in GT load, duct burners supplying steam
  above the unfired capability at additional fuel;
- ambient-dependent operating envelopes (the min/max outputs consumed by
  the dynamic-constraint-violation kernel, env.py:232-274);
- auxiliary-load, net-power and process-steam balances.

Input/output indices and bounds follow model.json exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---- input indices (model.json "inputs") ---------------------------------
TAMB, PAMB, RHAMB = 0, 1, 2
GT_PAC = (3, 6, 9)
GT_EVC = (4, 7, 10)
GT_PWR = (5, 8, 11)
HR_PROC = (12, 13, 14)
ST_PWR, IPPROC_M, CT_NRBAYS = 15, 16, 17

# ---- input bounds (model.json) -------------------------------------------
GT_PWR_LO = np.array([41.640958739408575, 41.4901380260007, 46.46162639456023])
GT_PWR_HI = np.array([168.26699084133313, 168.41364372684487, 172.43912889854244])
HR_LO = np.array([403.158098976746, 396.6747280218317, 438.9994717062812])
HR_HI = np.array([819.5712701252007, 817.3514297249753, 870.265011732758])
ST_LO, ST_HI = 25.653593808895327, 83.53805140752395
IP_LO, IP_HI = -1218.227252306133, -318.0558547331499

# ---- output bounds used for clipping envelopes (model.json "outputs") ----
GT_FUEL_MAX = np.array([76.69372527575013, 76.5767979002884, 74.85078517549726])
DB_FUEL_MAX = 18.302679412053344
PWR_MIN_BOUNDS = (np.array([51.226136, 51.154142, 53.382063]),
                  np.array([159.372284, 159.385700, 163.718997]))
PWR_MAX_BOUNDS = (np.array([104.556475, 104.663273, 106.848688]),
                  np.array([168.765869, 168.816834, 172.422358]))
STEAM_MIN_BOUNDS = (np.array([297.682785, 297.101498, 328.001105]),
                    np.array([496.926494, 494.038342, 533.750224]))
STEAM_MAX_BOUNDS = (np.array([548.318195, 550.350075, 594.735073]),
                    np.array([849.448828, 850.610284, 894.579579]))

T_ISO = 59.0  # deg F


def _effective_temp(tamb: jax.Array, rh: jax.Array, evc: jax.Array) -> jax.Array:
    """Compressor-inlet temperature after optional evaporative cooling.

    Wet-bulb depression approximated from relative humidity; the cooler
    recovers ~85% of the depression when switched on.
    """
    depression = 0.35 * jnp.maximum(tamb - 32.0, 0.0) * (1.0 - rh)
    return tamb - 0.85 * evc * depression


def plant_model(x: jax.Array) -> jax.Array:
    """Evaluates the plant surrogate.

    Args:
        x: shape [18], inputs in model.json order (same packing as
           /root/reference/sustaingym/envs/cogen/env.py:294-302).

    Returns:
        y: shape [29], outputs in model.json order.
    """
    x = jnp.asarray(x)
    dtype = x.dtype
    tamb, pamb, rh = x[TAMB], x[PAMB], x[RHAMB]
    pac = jnp.stack([x[i] for i in GT_PAC])
    evc = jnp.stack([x[i] for i in GT_EVC])
    pwr = jnp.stack([x[i] for i in GT_PWR])
    hr_steam = jnp.stack([x[i] for i in HR_PROC])
    st_pwr = x[ST_PWR]
    ipproc = x[IPPROC_M]
    nbays = x[CT_NRBAYS]

    gt_pwr_hi = jnp.asarray(GT_PWR_HI, dtype)
    teff = _effective_temp(tamb, rh, evc)                       # (3,)
    hot = jnp.maximum(teff - T_ISO, 0.0)
    cold = jnp.maximum(T_ISO - teff, 0.0)
    pressure_gain = (pamb / 14.6) ** 0.3

    # --- operating envelopes -------------------------------------------
    pwr_max = gt_pwr_hi * (1.0 - 0.0042 * hot + 0.0006 * cold) \
        * (1.0 + 0.035 * pac) * pressure_gain
    pwr_max = jnp.clip(pwr_max, jnp.asarray(PWR_MAX_BOUNDS[0], dtype),
                       jnp.asarray(PWR_MAX_BOUNDS[1], dtype))
    tnorm = jnp.clip((teff - 32.0) / 83.0, 0.0, 1.0)
    pwr_min_lo = jnp.asarray(PWR_MIN_BOUNDS[0], dtype)
    pwr_min_hi = jnp.asarray(PWR_MIN_BOUNDS[1], dtype)
    pwr_min = pwr_min_lo + (pwr_min_hi - pwr_min_lo) * 0.45 * tnorm ** 1.5

    # --- gas-turbine fuel ----------------------------------------------
    load = pwr / gt_pwr_hi
    amb_fuel = 1.0 + 0.0015 * hot - 0.0004 * cold
    gt_fuel = jnp.asarray(GT_FUEL_MAX, dtype) * amb_fuel \
        * (1.0 + 0.02 * pac) * (0.08 + 0.82 * load + 0.10 * load ** 2)
    gt_fuel = jnp.clip(gt_fuel, 0.0, jnp.asarray(GT_FUEL_MAX, dtype))

    # --- HRSG steam capability and duct burners -------------------------
    hr_lo = jnp.asarray(HR_LO, dtype)
    unfired = hr_lo * 1.02 + (jnp.asarray(HR_HI, dtype) * 0.82 - hr_lo) * load
    db_steam = jnp.maximum(hr_steam - unfired, 0.0)
    db_span = jnp.asarray(HR_HI, dtype) - unfired + 1e-6
    db_fuel = jnp.clip(DB_FUEL_MAX * db_steam / db_span, 0.0, DB_FUEL_MAX)

    steam_min = jnp.clip(0.72 * unfired,
                         jnp.asarray(STEAM_MIN_BOUNDS[0], dtype),
                         jnp.asarray(STEAM_MIN_BOUNDS[1], dtype))
    steam_max = jnp.clip(unfired + 0.22 * jnp.asarray(HR_HI, dtype),
                         jnp.asarray(STEAM_MAX_BOUNDS[0], dtype),
                         jnp.asarray(STEAM_MAX_BOUNDS[1], dtype))

    # --- steam-turbine envelope -----------------------------------------
    hr_total = jnp.sum(hr_steam)
    st_max = jnp.clip(0.09 * hr_total + 0.05 * (-ipproc) - 40.0
                      + 1.5 * (nbays - 6.0), 0.0, 193.2981069908212)
    st_min = jnp.clip(0.03 * hr_total - 20.0, 25.603735384829225,
                      251.5737866469593)

    # --- IP process-steam letdown envelope ------------------------------
    ip_ldwn_min = jnp.clip(-0.17 * hr_total + 12.0,
                           -1901.360063349245, -317.85686602279907)
    ip_ldwn_max = jnp.clip(-0.18 * hr_total,
                           -469.4936696089783, -317.82291691135345)

    # --- balances --------------------------------------------------------
    gt_hr_fuel = gt_fuel + db_fuel
    plant_fuel = jnp.sum(gt_hr_fuel)
    aux = jnp.clip(2.0 + 0.02 * (jnp.sum(pwr) + st_pwr) + 0.35 * nbays
                   + 0.5 * jnp.sum(pac),
                   1.2668176093005532, 22.42884599132708)
    net_pwr = jnp.sum(pwr) + st_pwr - aux
    proc_steam = hr_total + ipproc

    return jnp.concatenate([
        gt_fuel,                                   # 0-2   GTi_NG_M
        db_fuel,                                   # 3-5   HRi_DBNG_M
        gt_hr_fuel,                                # 6-8   GTi_HRi_NG_M
        jnp.stack([pwr_min[0], pwr_max[0],         # 9-14  gti pwr min/max
                   pwr_min[1], pwr_max[1],
                   pwr_min[2], pwr_max[2]]),
        jnp.stack([steam_min[0], steam_max[0],     # 15-20 hri steam min/max
                   steam_min[1], steam_max[1],
                   steam_min[2], steam_max[2]]),
        jnp.stack([plant_fuel,                     # 21    PLANT_NG_M
                   ip_ldwn_min, ip_ldwn_max,       # 22-23
                   st_min, st_max,                 # 24-25
                   aux, net_pwr, proc_steam]),     # 26-28
    ])


plant_model_batched = jax.vmap(plant_model)
