"""Fully-fused Pallas TPU kernel: whole BuildingEnv episode segments in VMEM.

The XLA lockstep path (BuildingEnv.batch_unroll) bottoms out at ~455M
env-steps/s on v5e: each scan iteration is a handful of small fused kernels
whose (B, 6)-shaped operands round-trip HBM, and the 288-step dependence
chain leaves the units idle. This kernel runs entire episode segments
inside one pallas_call — batch in the lane axis, zones in sublanes, the
segment's exogenous rows (prefetched by episode_slice_gather) resident in
VMEM. Two levers hide the recurrence latency:

- lane width ``W`` (envs vectorized per op), and
- ``IL`` independent env GROUPS whose timesteps interleave in one loop
  body, giving the scalar/vector/MXU pipelines independent work.

Measured on v5e at batch 65536 x 288 steps: IL=8, W=128 -> 568M
env-steps/s including the prefetch (vs 455M for the XLA path); the
remaining bound is the episode-slice prefetch itself.

Per step per group the work is: uniform action draw (on-core PRNG or a
prescribed input block), the occupant-heat polynomial, one
(8,32)x(32,W) MXU matmul for the fused RC update [A_d | BD_d] @ [x; y],
and the p=2 reward rows — exactly BuildingEnv._step_exog's math
(continuous actions, physics mode).

Action sources:
- prescribed actions (input block): comparable step-for-step to the XLA
  path — the parity tests drive this mode;
- in-kernel RNG (pltpu.prng_random_bits): same U(-ac, ac) distribution as
  ``random_policy`` but a counter-based stream — the maximum-throughput
  simulation mode (BuildingEnv.fused_rollout).

Layouts (f32; W lanes = envs, 8 sublanes = padded zones):
  m:      (8, 32) fused operator; columns
          [x(0:8) | occ(8) | ground(9) | out(10) | a(11:19) | ghi(19) | 0pad]
  consts: (32, W) rows [0:8]=ac_map, [8:16]=target, [16]=q_rate, [17]=beta
  wx:     (nb, IL, steps, 4, W) exogenous [out, ground, ghi, meta]
  acts:   (nb, IL, steps, 8, W) prescribed actions (RNG mode: zeros)
  out:    (nb, IL, steps, 16, W) rows [0:8]=x_new, [8]=occ, [9]=reward,
          [10]=comfort_cost, [11]=power_cost
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_building_segment", "build_operator"]

_ZROWS = 8
_KDIM = 32
_OUT_ROWS = 16

# occupant sensible-heat polynomial (envs/building/env.py OCCU_COEF)
_C = (6.461927, 0.946892, 0.0000255737, 0.0627909, 0.0000589172,
      0.19855, 0.000940018, 0.00000149532)


def _occupower(avg, meta):
    t2 = avg * avg
    meta2 = meta * meta
    return (_C[0] + _C[1] * meta + _C[2] * meta2
            - (_C[3] * avg) * meta + (_C[4] * avg) * meta2
            - (_C[5] * t2) + (_C[6] * t2) * meta - (_C[7] * t2) * meta2)


def _uniform01(shape):
    """[0,1) floats from the on-core PRNG (mantissa-fill bitcast trick)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    mant = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    one = jnp.uint32(0x3F800000)
    return pltpu.bitcast(mant | one, jnp.float32) - 1.0


def build_operator(params) -> jax.Array:
    """Packs [A_d | BD_d] into the kernel's (8, 32) operator (host-side)."""
    import numpy as np
    n = params.n
    m = np.zeros((_ZROWS, _KDIM), np.float32)
    m[:n, :n] = np.asarray(params.A_d)
    bd = np.asarray(params.BD_d)
    m[:n, 8] = bd[:, 0]
    m[:n, 9] = bd[:, 1]
    m[:n, 10] = bd[:, 2]
    m[:n, 11:11 + n] = bd[:, 3:3 + n]
    m[:n, 19] = bd[:, 3 + n]
    return jnp.asarray(m)


def _kernel(seed_ref, m_ref, const_ref, wx_ref, act_ref, out_ref, *zs,
            steps: int, n: int, il: int, w: int, use_rng: bool):
    if use_rng:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    ac = const_ref[0:_ZROWS]              # rows >= n are zero
    target = const_ref[_ZROWS:2 * _ZROWS]
    q_rate = const_ref[16:17]
    beta = const_ref[17:18]
    for z in zs:
        z[20:] = jnp.zeros((_KDIM - 20, w), jnp.float32)

    def one(t, x, g, z_ref):
        wrow = wx_ref[0, g, t]            # (4, W)
        if use_rng:
            a = (2.0 * _uniform01((_ZROWS, w)) - 1.0) * ac
        else:
            a = act_ref[0, g, t]
        avg = jnp.sum(x[:n], axis=0, keepdims=True) / float(n)
        occ = _occupower(avg, wrow[3:4])
        z_ref[0:_ZROWS] = x
        z_ref[8:9] = occ
        z_ref[9:10] = wrow[1:2]           # ground
        z_ref[10:11] = wrow[0:1]          # out
        z_ref[11:19] = a
        z_ref[19:20] = wrow[2:3]          # ghi
        x_new = jnp.dot(m_ref[:], z_ref[:],
                        preferred_element_type=jnp.float32)
        power = jnp.sqrt(jnp.sum((a * a)[:n], axis=0, keepdims=True))
        # reward error uses ac_map VALUES (env.py: (x - target) * ac_map)
        diff = (x_new - target) * ac
        comfort = jnp.sqrt(jnp.sum((diff * diff)[:n], axis=0, keepdims=True))
        power_cost = power * q_rate
        comfort_cost = comfort * beta
        out_ref[0, g, t, 0:_ZROWS] = x_new
        out_ref[0, g, t, 8:9] = occ
        out_ref[0, g, t, 9:10] = -(power_cost + comfort_cost)
        out_ref[0, g, t, 10:11] = comfort_cost
        out_ref[0, g, t, 11:12] = power_cost
        out_ref[0, g, t, 12:] = jnp.zeros((_OUT_ROWS - 12, w), jnp.float32)
        return x_new

    def body(t, xs):
        return tuple(one(t, xs[g], g, zs[g]) for g in range(il))

    jax.lax.fori_loop(0, steps, body,
                      tuple(target * 1.0 for _ in range(il)))


@functools.partial(
    jax.jit, static_argnames=("steps", "n", "il", "w", "use_rng", "interpret"))
def fused_building_segment(m: jax.Array, consts: jax.Array, wx: jax.Array,
                           acts: jax.Array, seed: jax.Array, steps: int,
                           n: int, il: int, w: int, use_rng: bool,
                           interpret: bool = False) -> jax.Array:
    """Runs one lockstep segment for nb * il * w envs; see module layouts.

    RNG mode ignores ``acts``: pass a (1, 1, 1, 8, w) zeros array — the
    kernel never reads it and the degenerate block costs one 4 KB DMA.
    """
    nb = wx.shape[0]
    if use_rng:
        act_spec = pl.BlockSpec((1, 1, 1, _ZROWS, w),
                                lambda i: (0, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        act_spec = pl.BlockSpec((1, il, steps, _ZROWS, w),
                                lambda i: (i, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, steps=steps, n=n, il=il, w=w,
                          use_rng=use_rng),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ZROWS, _KDIM), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_KDIM, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, il, steps, 4, w), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            act_spec,
        ],
        out_specs=pl.BlockSpec((1, il, steps, _OUT_ROWS, w),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, il, steps, _OUT_ROWS, w),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((_KDIM, w), jnp.float32)
                        for _ in range(il)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=nb * il * steps * (2 * _ZROWS * _KDIM + 80) * w,
            transcendentals=nb * il * steps * 2 * w,
            bytes_accessed=nb * il * steps * w * 4 * (_OUT_ROWS + 12)),
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), m, consts, wx, acts)


# ---------------------------------------------------------------------------
# Policy-in-kernel variant (round-5): the PPO actor MLP runs INSIDE the
# episode kernel, mirroring ops/pallas/ev_rollout.py's policy mode — obs
# assembly, bf16 trunk matmuls on the MXU, Box-Muller Gaussian sampling,
# the tanh * ac_map squash (default_act_transform for the Box(-ac, ac)
# action space), and the RC env step fuse into one pallas_call per lane
# group. The learner consumes the output block VERBATIM in the kernel's
# (block, feature-rows, lanes) layout (parallel.ppo fused path).
#
# Learner block rows (bf16): [0:8]=x obs | [8]=out | [9]=ground |
# [10]=ghi | [11]=occupower/1000 | [12:16]=0 | [16:24]=u. The first 16
# rows ARE the kernel obs layout; building_fused_layout maps them to the
# canonical flat obs [temps(n), out, ground, ghi, occ/1000].
#
# The obs the policy sees at step t is the PREVIOUS step's emitted obs
# (x_t plus step t-1's exogenous channels and occupant power, matching
# BuildingEnv._step_exog's obs ordering); at t=0 it is the reset obs
# (exog row 0, occ of the target temps).

_OBS_ROWS_P = 16
_LRN_ROWS_P = 24
_LRN_U0_P = 16
_POUT_ROWS = 8


def building_fused_layout(n: int) -> dict:
    """Static learner-block description for parallel.ppo (same contract
    as ev_rollout.ev_fused_layout)."""
    import numpy as np
    row_map = np.full(_OBS_ROWS_P, -1, dtype=np.int64)
    row_map[0:n] = np.arange(n)          # zone temps
    row_map[8] = n                       # out_temp
    row_map[9] = n + 1                   # ground_temp
    row_map[10] = n + 2                  # ghi
    row_map[11] = n + 3                  # occupower / 1000
    return {"width": _LRN_ROWS_P, "obs_cols": _OBS_ROWS_P,
            "u_lo": _LRN_U0_P, "w1_row_map": row_map}


def pack_building_policy_weights(policy: dict, n: int,
                                 dtype=jnp.bfloat16):
    """Re-lays a parallel.ppo policy pytree into the kernel operand
    shapes (jit-friendly). Returns (w1k, w2k, wmk, pb, pm)."""
    w1 = policy["trunk1"]["w"]                   # (n + 4, H)
    H = w1.shape[1]
    w1t = w1.T.astype(jnp.float32)               # (H, n + 4)
    pad_z = jnp.zeros((H, 8 - n), jnp.float32)
    w1k = jnp.concatenate(
        [w1t[:, :n], pad_z, w1t[:, n:n + 4],
         jnp.zeros((H, 4), jnp.float32)], axis=1).astype(dtype)  # (H, 16)
    w2k = policy["trunk2"]["w"].T.astype(dtype)  # (H, H)
    wm = policy["mu"]["w"].T.astype(jnp.float32)
    wmk = jnp.zeros((8, H), jnp.float32).at[:n].set(wm).astype(dtype)
    pb = jnp.zeros((H, 128), jnp.float32)
    pb = pb.at[:, 0].set(policy["trunk1"]["b"].astype(jnp.float32))
    pb = pb.at[:, 1].set(policy["trunk2"]["b"].astype(jnp.float32))
    pm = jnp.zeros((8, 128), jnp.float32)
    pm = pm.at[:n, 0].set(policy["mu"]["b"].astype(jnp.float32))
    pm = pm.at[:n, 1].set(jnp.exp(policy["log_std"].astype(jnp.float32)))
    return w1k, w2k, wmk, pb, pm


# Box-Muller normal draws: shared with the EV policy kernel
from .ev_rollout import _normal_bits  # noqa: E402


def _policy_kernel(seed_ref, m_ref, const_ref, w1_ref, w2_ref, wm_ref,
                   pb_ref, pm_ref, wx_ref, noise_ref, out_ref, lrn_ref,
                   xs, prev, z_ref, *, chunk: int, n_chunks: int, n: int,
                   w: int, use_rng: bool):
    j = pl.program_id(1)
    if use_rng:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * n_chunks + j)

    ac = const_ref[0:_ZROWS]
    target = const_ref[_ZROWS:2 * _ZROWS]
    q_rate = const_ref[16:17]
    beta = const_ref[17:18]
    b1 = pb_ref[:, 0:1]
    b2 = pb_ref[:, 1:2]
    b_mu = pm_ref[:, 0:1]
    sigma = pm_ref[:, 1:2]

    @pl.when(j == 0)
    def _init():
        xs[...] = target * 1.0
        wrow0 = wx_ref[0, 0, 0]              # (4, w): exog row of step 0
        avg0 = jnp.sum(target[:n], axis=0, keepdims=True) / float(n)
        occ0 = _occupower(avg0, wrow0[3:4])
        prev[0:3] = wrow0[0:3]               # out, ground, ghi
        prev[3:4] = occ0
        prev[4:] = jnp.zeros((4, w), jnp.float32)
        z_ref[20:] = jnp.zeros((_KDIM - 20, w), jnp.float32)

    def body(t, _):
        wrow = wx_ref[0, 0, t]               # (4, w)
        x = xs[...]

        # ---- obs (previous step's emitted obs) -------------------------
        obs_m = jnp.concatenate([
            x,                                # rows 0:8 (pad rows are 0)
            prev[0:3],                        # out, ground, ghi
            prev[3:4] * (1.0 / 1000.0),       # occ / 1000
            jnp.zeros((4, w), jnp.float32),
        ], axis=0)                            # (16, w)

        # ---- actor MLP (bf16 MXU, f32 accumulation) --------------------
        obs_bf = obs_m.astype(jnp.bfloat16)
        h = jnp.tanh(jnp.dot(w1_ref[:], obs_bf,
                             preferred_element_type=jnp.float32) + b1)
        h = jnp.tanh(jnp.dot(w2_ref[:], h.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32) + b2)
        mu = jnp.dot(wm_ref[:], h.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + b_mu  # (8, w)
        if use_rng:
            noise = _normal_bits((_ZROWS, w))
        else:
            noise = noise_ref[0, 0, t]
        u = mu + sigma * noise
        a = jnp.tanh(u) * ac                  # default_act_transform

        lrn_ref[0, 0, t, 0:_OBS_ROWS_P] = obs_m.astype(jnp.bfloat16)
        lrn_ref[0, 0, t, _LRN_U0_P:_LRN_ROWS_P] = u.astype(jnp.bfloat16)

        # ---- env step (same math as the simulation kernel) -------------
        avg = jnp.sum(x[:n], axis=0, keepdims=True) / float(n)
        occ = _occupower(avg, wrow[3:4])
        z_ref[0:_ZROWS] = x
        z_ref[8:9] = occ
        z_ref[9:10] = wrow[1:2]
        z_ref[10:11] = wrow[0:1]
        z_ref[11:19] = a
        z_ref[19:20] = wrow[2:3]
        x_new = jnp.dot(m_ref[:], z_ref[:],
                        preferred_element_type=jnp.float32)
        power = jnp.sqrt(jnp.sum((a * a)[:n], axis=0, keepdims=True))
        diff = (x_new - target) * ac
        comfort = jnp.sqrt(jnp.sum((diff * diff)[:n], axis=0,
                                   keepdims=True))
        power_cost = power * q_rate
        comfort_cost = comfort * beta
        out_ref[0, 0, t, 0:1] = -(power_cost + comfort_cost)
        out_ref[0, 0, t, 1:2] = comfort_cost
        out_ref[0, 0, t, 2:3] = power_cost
        out_ref[0, 0, t, 3:] = jnp.zeros((_POUT_ROWS - 3, w), jnp.float32)

        xs[...] = x_new
        prev[0:3] = wrow[0:3]
        prev[3:4] = occ
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(
    jax.jit, static_argnames=("steps", "n", "w", "use_rng", "interpret"))
def fused_building_policy_segment(m, consts, w1k, w2k, wmk, pb, pm, wx,
                                  noise, seed, steps: int, n: int, w: int,
                                  use_rng: bool, interpret: bool = False):
    """One lockstep episode segment with the actor in-kernel. Returns
    (rewards (nb, steps, 8, w) f32 rows [0]=reward [1]=comfort_cost
    [2]=power_cost, learner block (nb, steps, 24, w) bf16). ``wx`` is
    (nb, steps, 4, w) exogenous rows [out, ground, ghi, meta]."""
    nb = wx.shape[0]
    per_step = (4 * 4 + _LRN_ROWS_P * 2 + _POUT_ROWS * 4 + _ZROWS * 4) * w
    chunk_max = max(1, min(96, (81 * 1024 * 1024) // (per_step * 2)))
    chunk = max(d for d in range(1, chunk_max + 1) if steps % d == 0)
    n_chunks = steps // chunk
    wx = wx.reshape(nb, n_chunks, chunk, 4, w)
    if use_rng:
        noise_spec = pl.BlockSpec((1, 1, 1, 1, w),
                                  lambda i, j: (0, 0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        noise = noise.reshape(1, 1, 1, 1, w)
    else:
        noise_spec = pl.BlockSpec((1, 1, chunk, _ZROWS, w),
                                  lambda i, j: (i, j, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        noise = noise.reshape(nb, n_chunks, chunk, _ZROWS, w)
    H = w1k.shape[0]
    out, lrn = pl.pallas_call(
        functools.partial(_policy_kernel, chunk=chunk, n_chunks=n_chunks,
                          n=n, w=w, use_rng=use_rng),
        grid=(nb, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ZROWS, _KDIM), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_KDIM, w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _OBS_ROWS_P), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ZROWS, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ZROWS, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, 4, w), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            noise_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, 1, chunk, _POUT_ROWS, w),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, _LRN_ROWS_P, w),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, n_chunks, chunk, _POUT_ROWS, w),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nb, n_chunks, chunk, _LRN_ROWS_P, w),
                                 jnp.bfloat16),
        ),
        scratch_shapes=[pltpu.VMEM((_ZROWS, w), jnp.float32),
                        pltpu.VMEM((_ZROWS, w), jnp.float32),
                        pltpu.VMEM((_KDIM, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=nb * steps * w * (2 * H * (_OBS_ROWS_P + H + 8)
                                    + 2 * _ZROWS * _KDIM + 120),
            transcendentals=nb * steps * w * (2 * H + 16),
            bytes_accessed=nb * steps * w * (
                4 * 4 + _POUT_ROWS * 4 + _LRN_ROWS_P * 2)),
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), m, consts, w1k, w2k, wmk,
      pb, pm, wx, noise)
    return (out.reshape(nb, steps, _POUT_ROWS, w),
            lrn.reshape(nb, steps, _LRN_ROWS_P, w))
