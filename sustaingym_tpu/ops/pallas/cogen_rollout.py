"""Fused Pallas TPU kernel: whole CogenEnv episode days in VMEM.

Same architecture as building_rollout.py (batch in the W-lane axis, ``il``
independent env groups interleaved to hide recurrence latency); the step
body unrolls envs/cogen/plant.py's physics surrogate over the three gas
turbines as (1, W) row operations — all plant constants are compile-time
Python floats, so no operand traffic. Per step: a 16-row uniform action
draw (Box components, Bernoulli switches, integer bays), the plant
balance/envelope rows, the 16-element dynamic-constraint violation, and
the reward terms of CogenEnv._step_core.

Layouts (f32; W lanes = envs):
  consts: (40, W) rows [0:16]=action low, [16:32]=high, [32]=ramp_penalty,
          [33]=supply_imbalance_penalty, [34]=cv_penalty
  prev0:  (nb, il, 16, W) reset prev_action rows (jax.random stream)
  wx:     (nb, il, day_rows, 8, W) ambient rows
          [TAMB, PAMB, RHAMB, Target_Power, Target_Steam, 0, 0, 0]
          (prices are observation-only)
  acts:   (nb, il, steps, 16, W) prescribed actions (RNG mode: dummy)
  out:    (nb, il, steps, 32, W) rows [0:15]=action, [16]=reward,
          [17:20]=fuel_costs, [20:24]=ramp_costs, [24:28]=dyn_cv_costs,
          [28]=non_delivery, [29]=net_power, [30]=proc_steam
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...envs.cogen import plant as P
from .building_rollout import _uniform01

__all__ = ["fused_cogen_segment"]

_ACT_ROWS = 16
_OUT_ROWS = 32
_BIN = (1, 2, 5, 6, 9, 10)
_BAYS = 14
_PWR = (0, 4, 8, 12)
_T_ISO = 59.0
_ST_MAX_CLIP = 193.2981069908212
_ST_MIN_LO, _ST_MIN_HI = 25.603735384829225, 251.5737866469593
_IPLD_MIN = (-1901.360063349245, -317.85686602279907)
_IPLD_MAX = (-469.4936696089783, -317.82291691135345)
_AUX_LO, _AUX_HI = 1.2668176093005532, 22.42884599132708


def _relu(v):
    return jnp.maximum(v, 0.0)


def _kernel(seed_ref, const_ref, prev_ref, wx_ref, act_ref, out_ref, *,
            steps: int, il: int, w: int, use_rng: bool):
    if use_rng:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    low = const_ref[0:_ACT_ROWS]
    high = const_ref[_ACT_ROWS:2 * _ACT_ROWS]
    ramp_pen = const_ref[32:33]
    imb_pen = const_ref[33:34]
    cv_pen = const_ref[34:35]

    def one(t, prev, g):
        amb = wx_ref[0, g, t]                  # (8, W)
        tamb, pamb, rh = amb[0:1], amb[1:2], amb[2:3]
        tgt_pwr, tgt_steam = amb[3:4], amb[4:5]

        if use_rng:
            u = _uniform01((_ACT_ROWS, w))
            a = low + u * (high - low)
            # switches ~ Bernoulli(1/2); bays ~ uniform int 1..12
            a_bin = jnp.where(u < 0.5, 0.0, 1.0)
            a_bay = jnp.floor(u * 12.0) + 1.0
            row = jax.lax.broadcasted_iota(jnp.int32, (_ACT_ROWS, w), 0)
            is_bin = ((row == _BIN[0]) | (row == _BIN[1]) | (row == _BIN[2])
                      | (row == _BIN[3]) | (row == _BIN[4])
                      | (row == _BIN[5]))
            a = jnp.where(is_bin, a_bin, a)
            a = jnp.where(row == _BAYS, a_bay, a)
        else:
            a = act_ref[0, g, t]

        def r(i):
            return a[i:i + 1]

        pwr = [r(0), r(4), r(8)]
        pac = [r(1), r(5), r(9)]
        evc = [r(2), r(6), r(10)]
        hr_steam = [r(3), r(7), r(11)]
        st_pwr = r(12)
        ipproc = r(13)
        nbays = r(14)

        pressure_gain = (pamb / 14.6) ** 0.3
        gt_fuel = []
        db_fuel = []
        pwr_min = []
        pwr_max = []
        steam_min = []
        steam_max = []
        for i in range(3):
            depression = 0.35 * _relu(tamb - 32.0) * (1.0 - rh)
            teff = tamb - 0.85 * evc[i] * depression
            hot = _relu(teff - _T_ISO)
            cold = _relu(_T_ISO - teff)
            pmax = float(P.GT_PWR_HI[i]) * (1.0 - 0.0042 * hot
                                            + 0.0006 * cold) \
                * (1.0 + 0.035 * pac[i]) * pressure_gain
            pmax = jnp.clip(pmax, float(P.PWR_MAX_BOUNDS[0][i]),
                            float(P.PWR_MAX_BOUNDS[1][i]))
            tnorm = jnp.clip((teff - 32.0) / 83.0, 0.0, 1.0)
            plo = float(P.PWR_MIN_BOUNDS[0][i])
            phi = float(P.PWR_MIN_BOUNDS[1][i])
            pmin = plo + (phi - plo) * 0.45 * tnorm ** 1.5
            load = pwr[i] / float(P.GT_PWR_HI[i])
            amb_fuel = 1.0 + 0.0015 * hot - 0.0004 * cold
            gf = float(P.GT_FUEL_MAX[i]) * amb_fuel * (1.0 + 0.02 * pac[i]) \
                * (0.08 + 0.82 * load + 0.10 * load ** 2)
            gf = jnp.clip(gf, 0.0, float(P.GT_FUEL_MAX[i]))
            hr_lo = float(P.HR_LO[i])
            hr_hi = float(P.HR_HI[i])
            unfired = hr_lo * 1.02 + (hr_hi * 0.82 - hr_lo) * load
            db_sp = hr_hi - unfired + 1e-6
            dbf = jnp.clip(float(P.DB_FUEL_MAX)
                           * _relu(hr_steam[i] - unfired) / db_sp,
                           0.0, float(P.DB_FUEL_MAX))
            smin = jnp.clip(0.72 * unfired, float(P.STEAM_MIN_BOUNDS[0][i]),
                            float(P.STEAM_MIN_BOUNDS[1][i]))
            smax = jnp.clip(unfired + 0.22 * hr_hi,
                            float(P.STEAM_MAX_BOUNDS[0][i]),
                            float(P.STEAM_MAX_BOUNDS[1][i]))
            gt_fuel.append(gf)
            db_fuel.append(dbf)
            pwr_min.append(pmin)
            pwr_max.append(pmax)
            steam_min.append(smin)
            steam_max.append(smax)

        hr_total = hr_steam[0] + hr_steam[1] + hr_steam[2]
        st_max = jnp.clip(0.09 * hr_total + 0.05 * (-ipproc) - 40.0
                          + 1.5 * (nbays - 6.0), 0.0, _ST_MAX_CLIP)
        st_min = jnp.clip(0.03 * hr_total - 20.0, _ST_MIN_LO, _ST_MIN_HI)
        ipld_min = jnp.clip(-0.17 * hr_total + 12.0, *_IPLD_MIN)
        ipld_max = jnp.clip(-0.18 * hr_total, *_IPLD_MAX)
        plant_fuel = (gt_fuel[0] + db_fuel[0] + gt_fuel[1] + db_fuel[1]
                      + gt_fuel[2] + db_fuel[2])
        pwr_sum = pwr[0] + pwr[1] + pwr[2]
        pac_sum = pac[0] + pac[1] + pac[2]
        aux = jnp.clip(2.0 + 0.02 * (pwr_sum + st_pwr) + 0.35 * nbays
                       + 0.5 * pac_sum, _AUX_LO, _AUX_HI)
        net_pwr = pwr_sum + st_pwr - aux
        proc_steam = hr_total + ipproc

        # dynamic-constraint violations, grouped GT1/GT2/GT3/ST
        # (envs/cogen/env.py dyn_constraint_violation)
        cv = []
        for i in range(3):
            cv.append(_relu(pwr_min[i] - pwr[i]) + _relu(pwr[i] - pwr_max[i])
                      + _relu(steam_min[i] - hr_steam[i])
                      + _relu(hr_steam[i] - steam_max[i]))
        cv.append(_relu(st_min - st_pwr) + _relu(st_pwr - st_max)
                  + _relu(ipproc - ipld_min) + _relu(ipproc - ipld_max))
        cv_costs = [cv_pen * c for c in cv]
        total_cv = cv_costs[0] + cv_costs[1] + cv_costs[2] + cv_costs[3]

        ramp = [ramp_pen * jnp.abs(a[i:i + 1] - prev[i:i + 1]) for i in _PWR]
        total_ramp = ramp[0] + ramp[1] + ramp[2] + ramp[3]

        steam_pen = _relu(tgt_steam - proc_steam)
        energy_pen = _relu(tgt_pwr - net_pwr)
        non_delivery = imb_pen * (steam_pen + energy_pen)
        reward = -(plant_fuel + total_ramp + non_delivery + total_cv)

        out_ref[0, g, t, 0:_ACT_ROWS] = a
        out_ref[0, g, t, 16:17] = reward
        out_ref[0, g, t, 17:18] = gt_fuel[0] + db_fuel[0]
        out_ref[0, g, t, 18:19] = gt_fuel[1] + db_fuel[1]
        out_ref[0, g, t, 19:20] = gt_fuel[2] + db_fuel[2]
        out_ref[0, g, t, 20:21] = ramp[0]
        out_ref[0, g, t, 21:22] = ramp[1]
        out_ref[0, g, t, 22:23] = ramp[2]
        out_ref[0, g, t, 23:24] = ramp[3]
        out_ref[0, g, t, 24:25] = cv_costs[0]
        out_ref[0, g, t, 25:26] = cv_costs[1]
        out_ref[0, g, t, 26:27] = cv_costs[2]
        out_ref[0, g, t, 27:28] = cv_costs[3]
        out_ref[0, g, t, 28:29] = non_delivery
        out_ref[0, g, t, 29:30] = net_pwr
        out_ref[0, g, t, 30:31] = proc_steam
        out_ref[0, g, t, 31:32] = jnp.zeros((1, w), jnp.float32)
        return a

    def body(t, prevs):
        return tuple(one(t, prevs[g], g) for g in range(il))

    jax.lax.fori_loop(
        0, steps, body,
        tuple(prev_ref[0, g] for g in range(il)))


@functools.partial(
    jax.jit, static_argnames=("steps", "il", "w", "use_rng", "interpret"))
def fused_cogen_segment(consts: jax.Array, prev0: jax.Array, wx: jax.Array,
                        acts: jax.Array, seed: jax.Array, steps: int,
                        il: int, w: int, use_rng: bool,
                        interpret: bool = False) -> jax.Array:
    """One lockstep day segment for nb * il * w envs; see module layouts."""
    nb = wx.shape[0]
    day_rows = wx.shape[2]
    if use_rng:
        act_spec = pl.BlockSpec((1, 1, 1, _ACT_ROWS, w),
                                lambda i: (0, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        act_spec = pl.BlockSpec((1, il, steps, _ACT_ROWS, w),
                                lambda i: (i, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, steps=steps, il=il, w=w, use_rng=use_rng),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((40, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, il, _ACT_ROWS, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, il, day_rows, 8, w), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            act_spec,
        ],
        out_specs=pl.BlockSpec((1, il, steps, _OUT_ROWS, w),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, il, steps, _OUT_ROWS, w),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=nb * il * steps * 400 * w,
            transcendentals=nb * il * steps * 4 * w,
            bytes_accessed=nb * il * steps * w * 4 * (_OUT_ROWS + 8)),
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), consts, prev0, wx, acts)
