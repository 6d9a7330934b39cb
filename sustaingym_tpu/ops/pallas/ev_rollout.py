"""Fully-fused Pallas TPU kernel: whole EVChargingEnv episodes in VMEM.

The XLA lockstep path tops out at ~22.5M env-steps/s with projection (36.8M
without) at batch 16384 on one v5 chip: each of the ~25 elementwise ops per
scan step round-trips its (B, 54) operands through HBM (~175 MB per scan
step), and the 288-step dependence chain leaves the units idle between
launches. This kernel runs entire 288-step episodes inside one pallas_call —
batch in the lane axis (W=128 envs per group), stations in sublanes (54
padded to 64) — with the station state (plugged/departure/demand) resident
in VMEM for the whole episode.

Per step per group the work is exactly EVChargingEnv._step_row's math
(envs/evcharging/env.py): optional 30-iteration over-relaxed ADMM projection
(ops/qp.py project(): three (64,64)x(64,W) MXU matmuls per iteration plus
box/second-order-cone proximal steps), EVSE pilot quantization, the
unplug/arrival event updates, the two-stage battery model, and the
profit − carbon − excess reward with the 8-cone constraint-current
magnitudes.

Cone rows are (re, im)-interleaved exactly like ops/qp.py's operator; the
per-cone pair reductions use sublane rolls (pltpu.roll axis=0) instead of
reshapes, which Mosaic handles without relayouts.

Measured (batch 16384 x 288 steps, one v5 chip, 2026-08-20):
- projection OFF: 89.4M env-steps/s (XLA scan: 36.8M) — the event/battery/
  reward chain runs entirely in VMEM;
- projection ON: 10.0M (XLA scan: 22.5M with the then-default ADMM; 47M+
  after round 3's dual-FISTA switch) — the per-group (64,64)x(64,128)
  ADMM matmuls pad 54 stations to 64 sublanes and use a quarter of the
  128x128 MXU, whereas XLA batches the identical matmuls over the full env
  batch at near-full tiles. EVChargingEnv.fused_rollout therefore routes
  projected configs to the XLA lockstep path by default; the in-kernel
  projection implements the legacy ADMM operator only (parity tests pin
  it via proj_method='admm').

Action sources (mirroring building_rollout):
- prescribed actions (input block) — the parity tests drive this mode
  against the XLA path;
- in-kernel RNG (pltpu.prng_random_bits): same U[0, 1) per-station
  distribution as ``random_policy`` on a counter-based stream — the
  maximum-throughput simulation mode (EVChargingEnv.fused_rollout). The
  simulation tier returns rewards + info only (obs = {}): per-step obs
  reconstruction would triple the output bytes for a consumer that is, by
  construction, not reading them.

Layouts (f32; W lanes = envs, sublanes = stations/cones):
  k_op:   (64, 64)  ADMM K operator (inv((1+rho)I + rho C^T C), padded)
  ct_op:  (64, 64)  rho * C^T (columns 0:16 valid)
  c_op:   (16, 64)  interleaved [Re; Im] cone rows
  consts: (96, W)   rows [0:64]=min_pilots, [64:80]=cone radii (pair rows),
                    [80:96]=cone magnitudes (amps, pair rows)
  wx:     (nb, steps, 136, W) rows [0:64]=plug_dep, [64:128]=plug_req,
                    [128]=moer(t+1)[0]
  acts:   (nb, steps, 64, W) prescribed actions (RNG mode: (1,1,1,W) dummy)
  out:    (nb, steps, 8, W) rows [0]=reward, [1]=profit, [2]=carbon_cost,
                    [3]=excess_charge
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ev_segment", "build_ev_operators"]

_SROWS = 64     # padded station rows
_CROWS = 16     # interleaved (re, im) cone rows (2 * 8 constraints)
_WX_ROWS = 136  # plug_dep(64) | plug_req(64) | moer0(1) | pad
_OUT_ROWS = 8

# mirrors envs/evcharging/env.py constants
_VOLTAGE = 208.0
_PERIOD_MIN = 5.0
_A_PERS_TO_KWH = (1.0 / 60.0) * (_VOLTAGE / 1000.0) * _PERIOD_MIN
_PROFIT_FACTOR = _A_PERS_TO_KWH * (0.15 * 0.20)
_VIOLATION_FACTOR = _A_PERS_TO_KWH * 0.001
_CARBON_COST_FACTOR = _A_PERS_TO_KWH * (30.85 / 1000.0)
_BATTERY_CAPACITY = 100.0
_BATTERY_MAX_POWER = 100.0
_TRANSITION_SOC = 0.8
_ACTION_SCALE = 32.0


def _uniform01(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    mant = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    one = jnp.uint32(0x3F800000)
    return pltpu.bitcast(mant | one, jnp.float32) - 1.0


def build_ev_operators(params, w: int = 128):
    """Packs the projection/constraint operators and per-station constants
    into the kernel's layouts (host-side, once per params)."""
    proj = params.proj
    n = params.n_stations
    m2 = int(proj.C.shape[0])
    assert m2 <= _CROWS, m2

    # K/rho exist only on the ADMM operator; the dual (FISTA) operator is
    # not implemented in-kernel, so projected dual configs never reach this
    # path (env.fused_rollout guards) and the zero K/CT blocks are unused
    admm = hasattr(proj, "K")
    k_op = np.zeros((_SROWS, _SROWS), np.float32)
    ct_op = np.zeros((_SROWS, _SROWS), np.float32)
    if admm:
        k_op[:n, :n] = np.asarray(proj.K)
        ct_op[:n, :m2] = float(proj.rho) * np.asarray(proj.C).T
    c_op = np.zeros((_CROWS, _SROWS), np.float32)
    c_op[:m2, :n] = np.asarray(proj.C)

    consts = np.zeros((96, w), np.float32)
    consts[0:n] = np.asarray(params.min_pilots)[:, None]
    radii = np.asarray(proj.radii)
    mags = np.asarray(params.magnitudes)
    for k in range(m2 // 2):
        consts[64 + 2 * k] = consts[64 + 2 * k + 1] = radii[k]
        consts[80 + 2 * k] = consts[80 + 2 * k + 1] = mags[k]
    return (jnp.asarray(k_op), jnp.asarray(ct_op), jnp.asarray(c_op),
            jnp.asarray(consts))


def _pair_sum(s):
    """rows 2k of the result hold s[2k] + s[2k+1] (cone pair reduction).
    pltpu.roll needs a non-negative shift: -1 mod _CROWS."""
    return s + pltpu.roll(s, shift=_CROWS - 1, axis=0)


def _spread_even(x, even):
    """broadcasts even-row values onto their odd pair rows."""
    xe = jnp.where(even, x, 0.0)
    return xe + pltpu.roll(xe, shift=1, axis=0)


def _kernel(seed_ref, k_ref, ct_ref, c_ref, const_ref, wx_ref, act_ref,
            out_ref, plugged, dep, demand, zpad, *, steps: int, n: int,
            w: int, iters: int, rho: float, alpha: float, project: bool,
            use_rng: bool):
    if use_rng:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    minp = const_ref[0:_SROWS]
    radii = const_ref[64:64 + _CROWS]
    mags = const_ref[80:80 + _CROWS]
    even = jax.lax.broadcasted_iota(jnp.int32, (_CROWS, w), 0) % 2 == 0

    # station state lives in VMEM scratch for the whole episode
    plugged[...] = jnp.zeros((_SROWS, w), jnp.float32)
    dep[...] = jnp.zeros((_SROWS, w), jnp.float32)
    demand[...] = jnp.zeros((_SROWS, w), jnp.float32)
    zpad[...] = jnp.zeros((_SROWS, w), jnp.float32)

    inv_ub = 1.0 / (_A_PERS_TO_KWH * _ACTION_SCALE)

    def admm(a, ub):
        x = jnp.clip(a, 0.0, ub)
        z0 = x
        u0 = jnp.zeros_like(x)
        zc = jnp.dot(c_ref[:], x, preferred_element_type=jnp.float32)
        uc = jnp.zeros_like(zc)

        def body(_, carry):
            x, z0, u0, zc, uc = carry
            zpad[0:_CROWS] = zc - uc
            rhs = (a + rho * (z0 - u0)
                   + jnp.dot(ct_ref[:], zpad[...],
                             preferred_element_type=jnp.float32))
            x = jnp.dot(k_ref[:], rhs, preferred_element_type=jnp.float32)
            cx = jnp.dot(c_ref[:], x, preferred_element_type=jnp.float32)
            xh = alpha * x + (1.0 - alpha) * z0
            cxh = alpha * cx + (1.0 - alpha) * zc
            z0 = jnp.clip(xh + u0, 0.0, ub)
            v = cxh + uc
            s = _pair_sum(v * v)
            norm = jnp.sqrt(s + 1e-12)
            scale = _spread_even(jnp.minimum(1.0, radii / norm), even)
            zc = v * scale
            u0 = u0 + xh - z0
            uc = uc + cxh - zc
            return (x, z0, u0, zc, uc)

        x, z0, u0, zc, uc = jax.lax.fori_loop(
            0, iters, body, (x, z0, u0, zc, uc))
        return jnp.clip(x, 0.0, ub)

    def body(t, _):
        wrow = wx_ref[0, t]                       # (136, W)
        plug_dep = wrow[0:_SROWS]
        plug_req = wrow[64:64 + _SROWS]
        moer0 = wrow[128:129]

        if use_rng:
            a = _uniform01((_SROWS, w))
        else:
            a = jnp.clip(act_ref[0, t], 0.0, 1.0)

        pl_now = plugged[...]
        dem_now = demand[...]
        if project:
            ub = jnp.minimum(1.0, pl_now * dem_now * inv_ub)
            a = admm(a, ub)

        # pilot quantization (env.py:366-378)
        amps = a * _ACTION_SCALE
        cc = jnp.where(amps >= 6.0, jnp.round(amps), 0.0)
        av = jnp.round(amps / 8.0) * 8.0
        pilots = jnp.where(minp == 6.0, cc, av)

        # events: unplug at departure, then arrivals overwrite the slot
        t_f = jnp.float32(t)
        pl_new = jnp.where(dep[...] == t_f, 0.0, pl_now)
        arrive = plug_dep > 0.0
        pl_new = jnp.where(arrive, 1.0, pl_new)
        dep[...] = jnp.where(arrive, plug_dep, dep[...])
        dem = jnp.where(arrive, plug_req, dem_now)

        # two-stage battery (env.py battery_charge)
        pilot_kw = pilots * (_VOLTAGE / 1000.0)
        soc = 1.0 - dem / _BATTERY_CAPACITY
        taper = _BATTERY_MAX_POWER * (1.0 - soc) / (1.0 - _TRANSITION_SOC)
        cap_kw = jnp.where(soc < _TRANSITION_SOC, _BATTERY_MAX_POWER, taper)
        power = jnp.minimum(pilot_kw, cap_kw)
        power = jnp.minimum(power, dem * (60.0 / _PERIOD_MIN))
        power = jnp.where(pl_new > 0.0, jnp.maximum(power, 0.0), 0.0)
        energy = power * (_PERIOD_MIN / 60.0)
        rates = power * (1000.0 / _VOLTAGE)
        plugged[...] = pl_new
        demand[...] = dem - energy

        # reward (env.py:431-464)
        total_rate = jnp.sum(rates, axis=0, keepdims=True)
        agg = jnp.dot(c_ref[:], pilots, preferred_element_type=jnp.float32)
        mag = jnp.sqrt(_pair_sum(agg * agg))
        exc = jnp.where(even, jnp.maximum(mag - mags, 0.0), 0.0)
        excess = jnp.sum(exc, axis=0, keepdims=True)
        profit = _PROFIT_FACTOR * total_rate
        carbon = _CARBON_COST_FACTOR * total_rate * moer0
        excess_charge = _VIOLATION_FACTOR * excess
        out_ref[0, t, 0:1] = profit - carbon - excess_charge
        out_ref[0, t, 1:2] = profit
        out_ref[0, t, 2:3] = carbon
        out_ref[0, t, 3:4] = excess_charge
        out_ref[0, t, 4:] = jnp.zeros((_OUT_ROWS - 4, w), jnp.float32)
        return 0

    jax.lax.fori_loop(0, steps, body, 0)


@functools.partial(
    jax.jit, static_argnames=("steps", "n", "w", "iters", "rho", "alpha",
                              "project", "use_rng", "interpret"))
def fused_ev_segment(k_op, ct_op, c_op, consts, wx, acts, seed,
                     steps: int, n: int, w: int, iters: int, rho: float,
                     alpha: float, project: bool, use_rng: bool,
                     interpret: bool = False) -> jax.Array:
    """Runs one lockstep episode segment for nb * w envs; see module
    layouts. Returns (nb, steps, 8, w) reward/info rows."""
    nb = wx.shape[0]
    if use_rng:
        act_spec = pl.BlockSpec((1, 1, 1, w), lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        act_spec = pl.BlockSpec((1, steps, _SROWS, w),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, steps=steps, n=n, w=w, iters=iters,
                          rho=rho, alpha=alpha, project=project,
                          use_rng=use_rng),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_SROWS, _SROWS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SROWS, _SROWS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CROWS, _SROWS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((96, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, steps, _WX_ROWS, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            act_spec,
        ],
        out_specs=pl.BlockSpec((1, steps, _OUT_ROWS, w),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, steps, _OUT_ROWS, w),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((_SROWS, w), jnp.float32)
                        for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=nb * steps * w * (
                (iters * 3 * 2 * _SROWS * _SROWS if project else 0)
                + 2 * _CROWS * _SROWS + 200),
            transcendentals=nb * steps * w * (iters + 2),
            bytes_accessed=nb * steps * w * 4 * (_WX_ROWS + _OUT_ROWS)),
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), k_op, ct_op, c_op, consts,
      wx, acts)
