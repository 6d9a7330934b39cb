"""Fused Pallas TPU kernel: whole DataCenterEnv episode segments in VMEM.

Same architecture as building_rollout.py (batch in lanes, ``il``
independent env groups interleaved to hide the recurrence latency), but
the dynamics are the VCC fluid queue (envs/datacenter/env.py._step_exog):
per step a handful of VPU rows — min/max queue update, carbon cost, and
the daily delay penalty on 24-hour boundaries.

Layouts (f32; W lanes = envs):
  wx:  (nb, il, steps, 2, W) exogenous rows [arrivals, moer]
  out: (nb, il, steps, 8, W) rows [0]=a, [1]=executed, [2]=queue,
       [3]=reward, [4]=carbon_cost, [5]=delay_penalty
Actions are drawn U(0, 1) from the on-core PRNG (the env's Box(0,1,(1,))
space); a prescribed-actions mode (input block (nb, il, steps, 1, W))
backs the parity tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .building_rollout import _uniform01

__all__ = ["fused_dc_segment"]

_OUT_ROWS = 8
HOURS_PER_DAY = 24
CAPACITY = 1.0
DELAY_FACTOR = 0.97


def _kernel(seed_ref, wx_ref, act_ref, out_ref, *, steps: int, il: int,
            w: int, use_rng: bool):
    if use_rng:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    def one(t, carry, g):
        queue, day_vcc, day_arr = carry
        row = wx_ref[0, g, t]                  # (2, W)
        arrivals = row[0:1]
        m_t = row[1:2]
        if use_rng:
            a = _uniform01((1, w))
        else:
            a = jnp.clip(act_ref[0, g, t], 0.0, 1.0)
        backlog = queue + arrivals
        executed = jnp.minimum(backlog, a * CAPACITY)
        queue = backlog - executed
        carbon = executed * m_t
        day_vcc = day_vcc + a
        day_arr = day_arr + arrivals
        boundary = ((t + 1) % HOURS_PER_DAY) == 0
        delay = jnp.where(
            boundary,
            jnp.maximum(0.0, DELAY_FACTOR * day_arr - CAPACITY * day_vcc),
            0.0)
        reward = -(carbon + delay)
        day_vcc = jnp.where(boundary, 0.0, day_vcc)
        day_arr = jnp.where(boundary, 0.0, day_arr)
        out_ref[0, g, t, 0:1] = a
        out_ref[0, g, t, 1:2] = executed
        out_ref[0, g, t, 2:3] = queue
        out_ref[0, g, t, 3:4] = reward
        out_ref[0, g, t, 4:5] = carbon
        out_ref[0, g, t, 5:6] = delay
        out_ref[0, g, t, 6:] = jnp.zeros((_OUT_ROWS - 6, w), jnp.float32)
        return (queue, day_vcc, day_arr)

    zero = jnp.zeros((1, w), jnp.float32)

    def body(t, carries):
        return tuple(one(t, carries[g], g) for g in range(il))

    jax.lax.fori_loop(0, steps, body,
                      tuple((zero, zero, zero) for _ in range(il)))


@functools.partial(
    jax.jit, static_argnames=("steps", "il", "w", "use_rng", "interpret"))
def fused_dc_segment(wx: jax.Array, acts: jax.Array, seed: jax.Array,
                     steps: int, il: int, w: int, use_rng: bool,
                     interpret: bool = False) -> jax.Array:
    """One lockstep segment (episode start, zero queue) for nb*il*w envs."""
    nb = wx.shape[0]
    if use_rng:
        act_spec = pl.BlockSpec((1, 1, 1, 1, w), lambda i: (0, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        act_spec = pl.BlockSpec((1, il, steps, 1, w),
                                lambda i: (i, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, steps=steps, il=il, w=w, use_rng=use_rng),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, il, steps, 2, w), lambda i: (i, 0, 0, 0, 0),
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
            flops=nb * il * steps * 30 * w, transcendentals=0,
            bytes_accessed=nb * il * steps * w * 4 * (_OUT_ROWS + 2)),
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), wx, acts)
