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
(envs/evcharging/env.py): optional feasibility projection (default:
15-iteration preconditioned dual-FISTA with gradient restart, mirroring
ops/qp._project_dual; legacy 30-iteration over-relaxed ADMM kept for its
parity tests), EVSE pilot quantization, the unplug/arrival event updates,
the two-stage battery model, and the profit − carbon − excess reward with
the per-cone constraint-current magnitudes.

Cone rows use a SPLIT layout — rows [0:16] real, [16:32] imaginary parts
of up to 16 cones (covers caltech's 8 AND JPL's 9) — so per-cone pair
reductions are 8-aligned sublane slices, not rolls.

Measured (batch 16384 x 288 steps, one v5 chip, round 4, w=2048):
- projection OFF: 98.2M env-steps/s (XLA scan: 43.7M);
- projection ON (dual-FISTA-15): 62M — beats the XLA lockstep path's 50M.
  Round 3's ADMM kernel lost this matchup 10M-vs-47M at w=128: the 15-30
  serialized projection iterations per step are a pure latency chain at
  narrow lane groups. WIDE groups (w=2048, the wx table streamed through
  VMEM in 36-step chunks over a 2D (group, chunk) grid) turn the chain
  throughput-bound: 20M (w=128) -> 31M (256) -> 47M (512) -> 62M (2048),
  with 4096 regressing (54.9M, VMEM pressure).

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
  ct_op:  (64, 32)  C^T in split-cone column order (rho-scaled for ADMM)
  c_op:   (32, 64)  split cone rows [Re 0:16 | Im 16:32]
  consts: (128, W)  rows [0:64]=min_pilots, [64:80]=cone radii,
                    [80:96]=cone magnitudes (amps), [96:112]=FISTA steps
  wx:     (nb, steps, 136, W) rows [0:64]=plug_dep, [64:128]=plug_req,
                    [128]=moer(t+1)[0] — streamed in 36-step chunks
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

__all__ = ["fused_ev_segment", "build_ev_operators",
           "fused_ev_policy_segment", "pack_policy_weights"]

_SROWS = 64     # padded station rows
_CROWS = 32     # cone rows, SPLIT halves: [0:16]=Re, [16:32]=Im (up to 16
                # constraints — caltech's 8 and JPL's 9 both fit; round 3's
                # 16-row interleaved layout excluded JPL and needed sublane
                # rolls for every pair reduction, which the split layout
                # replaces with 8-aligned sublane slices)
_HC = 16        # half (per-cone) rows
_WX_ROWS = 136  # plug_dep(64) | plug_req(64) | moer0(1) | pad
_OUT_ROWS = 8
_CONST_ROWS = 128  # min_pilots(64) | radii(16) | mags(16) | fista steps(16)

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

    m = m2 // 2
    assert m <= _HC, m
    # ops/qp.py stores C with (re, im)-interleaved rows; the kernel splits
    # them into half blocks (rows [0:16]=Re, [16:32]=Im) so every per-cone
    # pair reduction is an 8-aligned sublane slice instead of a roll
    C = np.asarray(proj.C, np.float64)
    C_split = np.zeros((_CROWS, n))
    C_split[:m] = C[0::2]
    C_split[_HC:_HC + m] = C[1::2]

    # ADMM carries (K, rho-scaled C^T); the dual-FISTA operator carries
    # per-cone steps instead (ct_op = plain C^T, k_op unused/zero)
    admm = hasattr(proj, "K")
    k_op = np.zeros((_SROWS, _SROWS), np.float32)
    ct_op = np.zeros((_SROWS, _CROWS), np.float32)
    scale = float(proj.rho) if admm else 1.0
    if admm:
        k_op[:n, :n] = np.asarray(proj.K)
    ct_op[:n, :] = scale * C_split.T
    c_op = np.zeros((_CROWS, _SROWS), np.float32)
    c_op[:, :n] = C_split

    consts = np.zeros((_CONST_ROWS, w), np.float32)
    consts[0:n] = np.asarray(params.min_pilots)[:, None]
    consts[64:64 + m] = np.asarray(proj.radii)[:, None]
    consts[80:80 + m] = np.asarray(params.magnitudes)[:, None]
    if not admm:
        consts[96:96 + m] = np.asarray(proj.step)[:, None]
    return (jnp.asarray(k_op), jnp.asarray(ct_op), jnp.asarray(c_op),
            jnp.asarray(consts))


def _cone_norm_sq(v):
    """(16, w) per-cone squared magnitudes of a split-layout (32, w) cone
    vector: row k holds Re_k^2 + Im_k^2 (8-aligned sublane slices — no
    rolls)."""
    return v[0:_HC] * v[0:_HC] + v[_HC:_CROWS] * v[_HC:_CROWS]


def _both(x):
    """(32, w) from (16, w): the per-cone value applied to both the Re and
    Im half rows."""
    return jnp.concatenate([x, x], axis=0)


def _kernel(seed_ref, k_ref, ct_ref, c_ref, const_ref, slab_ref, oh_ref,
            act_ref, out_ref, plugged, dep, demand, *, chunk: int,
            n_chunks: int, n: int, w: int, iters: int, rho: float,
            alpha: float, project: bool, proj_method: str, restart: bool,
            use_rng: bool):
    # 2D grid (group, step-chunk): the wx table streams through VMEM in
    # chunk-sized blocks so the lane width can grow past what a whole
    # 288-step block allows (w=512 needs 80MB/block unchunked); the station
    # state persists in scratch across a group's chunks (the chunk axis is
    # innermost, so chunks of one group run consecutively)
    j = pl.program_id(1)
    if use_rng:
        # a distinct stream per (group, chunk): the PRNG state need not
        # survive grid steps, and the RNG tier's draws are documented as a
        # counter-based stream (not the jax.random bits)
        pltpu.prng_seed(seed_ref[0]
                        + pl.program_id(0) * n_chunks + j)

    minp = const_ref[0:_SROWS]
    radii = const_ref[64:64 + _HC]
    mags = const_ref[80:80 + _HC]
    fsteps16 = const_ref[96:96 + _HC]
    fsteps = jnp.concatenate([fsteps16, fsteps16], axis=0)   # (32, w)

    # station state lives in VMEM scratch for the whole episode; re-init
    # only on each group's FIRST chunk
    @pl.when(j == 0)
    def _init():
        plugged[...] = jnp.zeros((_SROWS, w), jnp.float32)
        dep[...] = jnp.zeros((_SROWS, w), jnp.float32)
        demand[...] = jnp.zeros((_SROWS, w), jnp.float32)

    inv_ub = 1.0 / (_A_PERS_TO_KWH * _ACTION_SCALE)

    def admm(a, ub):
        x = jnp.clip(a, 0.0, ub)
        z0 = x
        u0 = jnp.zeros_like(x)
        zc = jnp.dot(c_ref[:], x, preferred_element_type=jnp.float32)
        uc = jnp.zeros_like(zc)

        def body(_, carry):
            x, z0, u0, zc, uc = carry
            rhs = (a + rho * (z0 - u0)
                   + jnp.dot(ct_ref[:], zc - uc,
                             preferred_element_type=jnp.float32))
            x = jnp.dot(k_ref[:], rhs, preferred_element_type=jnp.float32)
            cx = jnp.dot(c_ref[:], x, preferred_element_type=jnp.float32)
            xh = alpha * x + (1.0 - alpha) * z0
            cxh = alpha * cx + (1.0 - alpha) * zc
            z0 = jnp.clip(xh + u0, 0.0, ub)
            v = cxh + uc
            norm = jnp.sqrt(_cone_norm_sq(v) + 1e-12)
            zc = v * _both(jnp.minimum(1.0, radii / norm))
            u0 = u0 + xh - z0
            uc = uc + cxh - zc
            return (x, z0, u0, zc, uc)

        x, z0, u0, zc, uc = jax.lax.fori_loop(
            0, iters, body, (x, z0, u0, zc, uc))
        return jnp.clip(x, 0.0, ub)

    def fista(a, ub):
        """Preconditioned dual-FISTA with gradient restart — the in-kernel
        mirror of ops/qp._project_dual (f32 throughout: the VMEM-resident
        chain has no HBM re-reads, so the XLA path's bf16 inner-loop
        storage trick is unnecessary here)."""
        tr = fsteps16 * radii                                 # (16, w)
        # carry inits come from VMEM reads, not jnp.zeros/ones splats:
        # Mosaic requires the loop-carried layouts to match the body's
        # outputs, and splat (replicated) inits trip an "Invalid relayout"
        # on the (32, w) / (1, w) carries
        lam0 = _both(minp[0:_HC]) * 0.0

        def body(_, carry):
            lam, lam_prev, tk = carry
            tk1 = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk))
            beta = (tk - 1.0) / tk1                       # (1, w)
            y = lam + beta * (lam - lam_prev)             # (_CROWS, w)
            ydot = jnp.dot(ct_ref[:], y,
                           preferred_element_type=jnp.float32)
            xbar = jnp.clip(a - ydot, 0.0, ub)
            cx = jnp.dot(c_ref[:], xbar,
                         preferred_element_type=jnp.float32)
            v = y + fsteps * cx
            nr = jnp.sqrt(_cone_norm_sq(v) + 1e-12)
            lam_new = v * _both(jnp.maximum(0.0, 1.0 - tr / nr))
            if restart:
                # gradient restart (O'Donoghue & Candes) — padded rows are
                # zero in every lam iterate, so the row sum is exact
                prog = jnp.sum((lam_new - lam) * (lam - lam_prev),
                               axis=0, keepdims=True)
                tk1 = jnp.where(prog < 0.0, 1.0, tk1)
            return (lam_new, lam, tk1)

        tk0 = minp[0:1] * 0.0 + 1.0
        lam, _, _ = jax.lax.fori_loop(
            0, iters, body, (lam0, lam0, tk0))
        ydot = jnp.dot(ct_ref[:], lam,
                       preferred_element_type=jnp.float32)
        return jnp.clip(a - ydot, 0.0, ub)

    def body(t, _):
        # in-kernel day select (round 5, shared with the policy kernel):
        # ONE onehot MXU matmul against the streamed day slab replaces
        # the host-side per-env (B, T, 136) gather + transpose (2.6GB
        # materialized per 16384x288 rollout, ~20% of the tier). HIGHEST
        # precision keeps every selected f32 value exact (each output is
        # a single 1.0 * v product)
        wrow = jnp.dot(slab_ref[0, t], oh_ref[0],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (136, W)
        plug_dep = wrow[0:_SROWS]
        plug_req = wrow[64:64 + _SROWS]
        moer0 = wrow[128:129]

        if use_rng:
            a = _uniform01((_SROWS, w))
        else:
            a = jnp.clip(act_ref[0, 0, t], 0.0, 1.0)

        pl_now = plugged[...]
        dem_now = demand[...]
        if project:
            ub = jnp.minimum(1.0, pl_now * dem_now * inv_ub)
            a = fista(a, ub) if proj_method == "dual" else admm(a, ub)

        # pilot quantization (env.py:366-378)
        amps = a * _ACTION_SCALE
        cc = jnp.where(amps >= 6.0, jnp.round(amps), 0.0)
        av = jnp.round(amps / 8.0) * 8.0
        pilots = jnp.where(minp == 6.0, cc, av)

        # events: unplug at departure, then arrivals overwrite the slot
        # (departures are stored as ABSOLUTE timesteps — compare globally)
        t_f = jnp.float32(j * chunk + t)
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
        mag = jnp.sqrt(_cone_norm_sq(agg))                  # (16, w)
        # padded cone rows (beyond the site's m constraints) must stay
        # EXACTLY zero in the excess sum: their c_op rows and mags are 0,
        # so mag - mags is 0 today, but mask explicitly (real cones have
        # mags > 0 — both packaged sites) so an epsilon added to the norm
        # later cannot leak a constant positive bias into every reward
        excess = jnp.sum(jnp.where(mags > 0.0,
                                   jnp.maximum(mag - mags, 0.0), 0.0),
                         axis=0, keepdims=True)
        profit = _PROFIT_FACTOR * total_rate
        carbon = _CARBON_COST_FACTOR * total_rate * moer0
        excess_charge = _VIOLATION_FACTOR * excess
        out_ref[0, 0, t, 0:1] = profit - carbon - excess_charge
        out_ref[0, 0, t, 1:2] = profit
        out_ref[0, 0, t, 2:3] = carbon
        out_ref[0, 0, t, 3:4] = excess_charge
        out_ref[0, 0, t, 4:] = jnp.zeros((_OUT_ROWS - 4, w), jnp.float32)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(
    jax.jit, static_argnames=("steps", "n", "w", "iters", "rho", "alpha",
                              "project", "proj_method", "restart",
                              "use_rng", "interpret"))
def fused_ev_segment(k_op, ct_op, c_op, consts, slab, onehot, acts, seed,
                     steps: int, n: int, w: int, iters: int, rho: float,
                     alpha: float, project: bool, proj_method: str,
                     restart: bool, use_rng: bool,
                     interpret: bool = False) -> jax.Array:
    """Runs one lockstep episode segment for nb * w envs; see module
    layouts. Returns (nb, steps, 8, w) reward/info rows.

    ``slab`` is the (steps, 136, Dp) day table (wx rows, day axis last,
    padded to a 128 multiple); ``onehot`` is (nb, Dp, w) selecting each
    lane env's episode day — rows are gathered IN-KERNEL with one MXU
    matmul per step (round 5; was a host-side per-env gather+transpose).
    The slab/acts/out blocks stream through VMEM in step CHUNKS over a 2D
    (group, chunk) grid; the station state persists in scratch across a
    group's chunks."""
    nb = onehot.shape[0]
    Dp = slab.shape[2]
    per_step = Dp * _WX_ROWS * 4 + _OUT_ROWS * 4 * w
    chunk_max = max(1, min(36, (81 * 1024 * 1024) // (per_step * 2)))
    chunk = max(d for d in range(1, chunk_max + 1) if steps % d == 0)
    n_chunks = steps // chunk
    slab = slab.reshape(n_chunks, chunk, _WX_ROWS, Dp)
    if use_rng:
        act_spec = pl.BlockSpec((1, 1, 1, 1, w), lambda i, j: (0, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        acts = acts.reshape(1, 1, 1, 1, w)
    else:
        act_spec = pl.BlockSpec((1, 1, chunk, _SROWS, w),
                                lambda i, j: (i, j, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        acts = acts.reshape(nb, n_chunks, chunk, _SROWS, w)
    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, n_chunks=n_chunks, n=n,
                          w=w, iters=iters, rho=rho, alpha=alpha,
                          project=project, proj_method=proj_method,
                          restart=restart, use_rng=use_rng),
        grid=(nb, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_SROWS, _SROWS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SROWS, _CROWS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CROWS, _SROWS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CONST_ROWS, w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, _WX_ROWS, Dp),
                         lambda i, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            act_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, _OUT_ROWS, w),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, n_chunks, chunk, _OUT_ROWS, w),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((_SROWS, w), jnp.float32)
                        for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=nb * steps * w * (
                (iters * 2 * 2 * _SROWS * (_SROWS if proj_method != "dual"
                                           else _CROWS) if project else 0)
                + 2 * _CROWS * _SROWS + 200),
            transcendentals=nb * steps * w * (iters + 2),
            bytes_accessed=nb * steps * w * 4 * (_WX_ROWS + _OUT_ROWS)),
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), k_op, ct_op, c_op, consts,
      slab, onehot, acts)
    return out.reshape(nb, steps, _OUT_ROWS, w)


# ---------------------------------------------------------------------------
# Policy-in-kernel variant: the PPO actor's MLP runs INSIDE the episode
# kernel (round-4 verdict item 1), so whole on-policy rollouts — obs
# assembly, 2-layer tanh actor, Gaussian sampling, dual-FISTA projection,
# env step — fuse into one pallas_call per lane group. The learner gets
# back exactly what PPO's episodic reconstruction needs: the per-step obs
# the policy saw (bf16, the dynamic halves only — est/demands; the
# moer/timestep channels are per-(day, t) and reassembled outside from the
# moer pack) and the pre-squash Gaussian draws u; (logp, value) are then
# scored OUTSIDE in one batched pass over the stored obs, so every PPO
# ratio is exactly 1 at epoch 0 by construction (the lr=0 invariant of
# tests/test_ppo.py::test_episodic_fast_path_reconstruction_exact).
#
# The actor matmuls run as 1-pass bf16 MXU ops (weights are shipped bf16):
# in-kernel mu only shapes BEHAVIOR — the learner's logp/value use the
# outside bf16-obs/f32-weight computation, so kernel-vs-XLA mu drift is
# exploration noise, not a correctness term.
#
# Policy-mode layouts (f32 unless noted; W lanes = envs):
#   wx:   (nb, steps, 240, W) rows [0:64]=plug_dep | [64:128]=plug_req |
#         [128:192]=plug_est | [192:229]=moer[t, 0:37] | [229]=moer[t+1, 0]
#   obs matrix (VMEM, built per step): (168, W) rows [0:64]=est_departures |
#         [64:128]=demands | [128]=timestep | [129]=prev_moer |
#         [130:166]=forecast | [166:168]=0   (W1's rows are permuted to this
#         layout by pack_policy_weights)
#   w1k:  (H, 168) bf16; w2k: (H, H) bf16; wmk: (64, H) bf16
#   pb:   (H, 128) f32 col 0 = b1, col 1 = b2
#   pm:   (64, 128) f32 col 0 = b_mu, col 1 = exp(log_std) (padded rows 0)
#   outs: rewards (nb, steps, 8, W) f32 rows as the simulation kernel;
#         learner block (nb, steps, 192, W) bf16 rows [0:64]=est obs |
#         [64:128]=demand obs | [128:192]=u

_WXP_ROWS = 240
_OBS_ROWS = 168
# learner block: [0:64]=est | [64:128]=dem | [128:168]=aux (timestep,
# prev_moer, forecast36, pad2) | [168:232]=u — the first 168 rows ARE the
# kernel obs layout, so the learner scores/updates on this block directly
# (a row-permuted trunk1 view; parallel.ppo builds it per minibatch) and
# the rollout needs ONE output transpose instead of per-field
# transposes + a flat-layout concat (measured 88ms -> the per-field
# version lost to the XLA rollout's 74ms on post-processing alone)
_LRN_ROWS = 232
_LRN_U0 = 168


def ev_fused_layout(n: int) -> dict:
    """Static description of the learner block for parallel.ppo: obs
    column count, the u column range, and the map from kernel obs rows to
    canonical flat-obs indices (-1 = structural zero padding) used to
    build the permuted trunk1 view."""
    row_map = np.full(_OBS_ROWS, -1, dtype=np.int64)
    row_map[0:n] = 1 + np.arange(n)                 # est_departures
    row_map[64:64 + n] = 1 + n + np.arange(n)       # demands
    row_map[128] = 0                                # timestep
    row_map[129] = 1 + 2 * n                        # prev_moer
    row_map[130:166] = 2 + 2 * n + np.arange(36)    # forecast
    return {"width": _LRN_ROWS, "obs_cols": _OBS_ROWS,
            "u_lo": _LRN_U0, "w1_row_map": row_map}


def pack_policy_weights(policy: dict, n: int, dtype=jnp.bfloat16):
    """Re-lays a parallel.ppo policy pytree into the kernel's operand
    shapes (jit-friendly — runs inside the train step each iteration).
    Returns (w1k, w2k, wmk, pb, pm)."""
    w1 = policy["trunk1"]["w"]                    # (146, H) flat-obs rows
    H = w1.shape[1]
    w1t = w1.T.astype(jnp.float32)                # (H, 146)
    z = jnp.zeros((H, 1), jnp.float32)
    # flat obs layout (envs/evcharging/env.py observation_space order):
    # [0]=timestep | [1:1+n]=est | [1+n:1+2n]=demands | [1+2n]=prev_moer |
    # [2+2n : 38+2n]=forecast  -> permute into the kernel obs rows above
    est = w1t[:, 1:1 + n]
    dem = w1t[:, 1 + n:1 + 2 * n]
    pmo = w1t[:, 1 + 2 * n:2 + 2 * n]
    fc = w1t[:, 2 + 2 * n:38 + 2 * n]
    pad_st = jnp.zeros((H, 64 - n), jnp.float32)
    w1k = jnp.concatenate(
        [est, pad_st, dem, pad_st, w1t[:, 0:1], pmo, fc, z, z],
        axis=1).astype(dtype)                     # (H, 168)
    w2k = policy["trunk2"]["w"].T.astype(dtype)   # (H, H)
    wm = policy["mu"]["w"].T.astype(jnp.float32)  # (n_act=n, H)
    wmk = jnp.zeros((64, H), jnp.float32).at[:n].set(wm).astype(dtype)
    pb = jnp.zeros((H, 128), jnp.float32)
    pb = pb.at[:, 0].set(policy["trunk1"]["b"].astype(jnp.float32))
    pb = pb.at[:, 1].set(policy["trunk2"]["b"].astype(jnp.float32))
    pm = jnp.zeros((64, 128), jnp.float32)
    pm = pm.at[:n, 0].set(policy["mu"]["b"].astype(jnp.float32))
    pm = pm.at[:n, 1].set(jnp.exp(policy["log_std"].astype(jnp.float32)))
    return w1k, w2k, wmk, pb, pm


def _normal_bits(shape):
    """Standard-normal draws from the on-core PRNG via Box–Muller."""
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    r = jnp.sqrt(-2.0 * jnp.log1p(-u1))      # 1-u1 in (0, 1] — no log(0)
    return r * jnp.cos((2.0 * np.pi) * u2)


def _policy_kernel(seed_ref, ct_ref, c_ref, const_ref, w1_ref, w2_ref,
                   wm_ref, pb_ref, pm_ref, slab_ref, oh_ref, noise_ref,
                   out_ref, lrn_ref, plugged, dep, est, demand, *,
                   chunk: int, n_chunks: int, n: int, w: int, iters: int,
                   project: bool, restart: bool, use_rng: bool):
    j = pl.program_id(1)
    if use_rng:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * n_chunks + j)

    minp = const_ref[0:_SROWS]
    radii = const_ref[64:64 + _HC]
    mags = const_ref[80:80 + _HC]
    fsteps16 = const_ref[96:96 + _HC]
    fsteps = jnp.concatenate([fsteps16, fsteps16], axis=0)

    @pl.when(j == 0)
    def _init():
        plugged[...] = jnp.zeros((_SROWS, w), jnp.float32)
        dep[...] = jnp.zeros((_SROWS, w), jnp.float32)
        est[...] = jnp.zeros((_SROWS, w), jnp.float32)
        demand[...] = jnp.zeros((_SROWS, w), jnp.float32)

    inv_ub = 1.0 / (_A_PERS_TO_KWH * _ACTION_SCALE)
    b1 = pb_ref[:, 0:1]
    b2 = pb_ref[:, 1:2]
    b_mu = pm_ref[:, 0:1]
    sigma = pm_ref[:, 1:2]
    inv288 = 1.0 / 288.0

    def fista(a, ub):
        # identical to the simulation kernel's dual-FISTA (see _kernel)
        tr = fsteps16 * radii
        lam0 = _both(minp[0:_HC]) * 0.0

        def body(_, carry):
            lam, lam_prev, tk = carry
            tk1 = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk))
            beta = (tk - 1.0) / tk1
            y = lam + beta * (lam - lam_prev)
            ydot = jnp.dot(ct_ref[:], y,
                           preferred_element_type=jnp.float32)
            xbar = jnp.clip(a - ydot, 0.0, ub)
            cx = jnp.dot(c_ref[:], xbar,
                         preferred_element_type=jnp.float32)
            v = y + fsteps * cx
            nr = jnp.sqrt(_cone_norm_sq(v) + 1e-12)
            lam_new = v * _both(jnp.maximum(0.0, 1.0 - tr / nr))
            if restart:
                prog = jnp.sum((lam_new - lam) * (lam - lam_prev),
                               axis=0, keepdims=True)
                tk1 = jnp.where(prog < 0.0, 1.0, tk1)
            return (lam_new, lam, tk1)

        tk0 = minp[0:1] * 0.0 + 1.0
        lam, _, _ = jax.lax.fori_loop(0, iters, body, (lam0, lam0, tk0))
        ydot = jnp.dot(ct_ref[:], lam,
                       preferred_element_type=jnp.float32)
        return jnp.clip(a - ydot, 0.0, ub)

    def body(t, _):
        # in-kernel day select: ONE onehot matmul replaces the host-side
        # per-env (B, T, 240) table gather + transpose (2.3GB materialized
        # + layout-shuffled per rollout at 8192x288 — measured ~2/3 of the
        # kernel's own runtime in surrounding fusions). Each output
        # element is a single 1.0 * v product; HIGHEST precision keeps the
        # f32 values exact (integer-valued rows) / <=1 ulp (full-mantissa
        # rows) instead of bf16-truncating them
        wrow = jnp.dot(slab_ref[0, t], oh_ref[0],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (240, W)
        plug_dep = wrow[0:64]
        plug_req = wrow[64:128]
        plug_est = wrow[128:192]
        moer_t = wrow[192:229]                    # obs channels
        moer_next0 = wrow[229:230]                # reward carbon channel

        t_f = jnp.float32(j * chunk + t)
        pl_now = plugged[...]
        dem_now = demand[...]

        # ---- obs the policy sees at this step (pre-event state) --------
        est_obs = jnp.where(pl_now > 0.0, est[...] - t_f, 0.0)
        dem_obs = jnp.where(pl_now > 0.0, dem_now, 0.0)
        tstep_row = moer_next0 * 0.0 + t_f * inv288      # (1, w)
        aux = jnp.concatenate(
            [tstep_row, moer_t, jnp.zeros((2, w), jnp.float32)], axis=0)
        obs_m = jnp.concatenate([est_obs, dem_obs, aux], axis=0)  # (168, w)

        # ---- actor MLP on the MXU (1-pass bf16) ------------------------
        obs_bf = obs_m.astype(jnp.bfloat16)
        h = jnp.tanh(jnp.dot(w1_ref[:], obs_bf,
                             preferred_element_type=jnp.float32) + b1)
        h = jnp.tanh(jnp.dot(w2_ref[:], h.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32) + b2)
        mu = jnp.dot(wm_ref[:], h.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + b_mu  # (64, w)
        if use_rng:
            noise = _normal_bits((_SROWS, w))
        else:
            noise = noise_ref[0, 0, t]
        u = mu + sigma * noise
        a = jnp.tanh(u) * 0.5 + 0.5               # default_act_transform

        # ---- learner block out (bf16): obs rows + aux rows + u ---------
        lrn_ref[0, 0, t, 0:64] = est_obs.astype(jnp.bfloat16)
        lrn_ref[0, 0, t, 64:128] = dem_obs.astype(jnp.bfloat16)
        lrn_ref[0, 0, t, 128:168] = aux.astype(jnp.bfloat16)
        lrn_ref[0, 0, t, 168:232] = u.astype(jnp.bfloat16)

        # ---- env step (same math as the simulation kernel) -------------
        if project:
            ub = jnp.minimum(1.0, pl_now * dem_now * inv_ub)
            a = fista(a, ub)
        else:
            a = jnp.clip(a, 0.0, 1.0)

        amps = a * _ACTION_SCALE
        cc = jnp.where(amps >= 6.0, jnp.round(amps), 0.0)
        av = jnp.round(amps / 8.0) * 8.0
        pilots = jnp.where(minp == 6.0, cc, av)

        pl_new = jnp.where(dep[...] == t_f, 0.0, pl_now)
        arrive = plug_dep > 0.0
        pl_new = jnp.where(arrive, 1.0, pl_new)
        dep[...] = jnp.where(arrive, plug_dep, dep[...])
        est[...] = jnp.where(arrive, plug_est, est[...])
        dem = jnp.where(arrive, plug_req, dem_now)

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

        total_rate = jnp.sum(rates, axis=0, keepdims=True)
        agg = jnp.dot(c_ref[:], pilots, preferred_element_type=jnp.float32)
        mag = jnp.sqrt(_cone_norm_sq(agg))
        excess = jnp.sum(jnp.where(mags > 0.0,
                                   jnp.maximum(mag - mags, 0.0), 0.0),
                         axis=0, keepdims=True)
        profit = _PROFIT_FACTOR * total_rate
        carbon = _CARBON_COST_FACTOR * total_rate * moer_next0
        excess_charge = _VIOLATION_FACTOR * excess
        out_ref[0, 0, t, 0:1] = profit - carbon - excess_charge
        out_ref[0, 0, t, 1:2] = profit
        out_ref[0, 0, t, 2:3] = carbon
        out_ref[0, 0, t, 3:4] = excess_charge
        out_ref[0, 0, t, 4:] = jnp.zeros((_OUT_ROWS - 4, w), jnp.float32)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(
    jax.jit, static_argnames=("steps", "n", "w", "iters", "project",
                              "restart", "use_rng", "interpret"))
def fused_ev_policy_segment(ct_op, c_op, consts, w1k, w2k, wmk, pb, pm,
                            slab, onehot, noise, seed, steps: int, n: int,
                            w: int, iters: int, project: bool,
                            restart: bool, use_rng: bool,
                            interpret: bool = False):
    """One lockstep episode segment with the actor in-kernel. Returns
    (rewards (nb, steps, 8, w) f32, learner block (nb, steps, 232, w)
    bf16). ``slab`` is the (steps, 240, Dp) day table (policy-mode wx
    rows, day axis last, padded to a 128 multiple); ``onehot`` is
    (nb, Dp, w) selecting each lane env's episode day — the kernel
    gathers day rows with one MXU matmul per step instead of streaming
    per-env tables (which materialized + transposed 2.3GB per rollout at
    8192x288). See the policy-mode layout block above."""
    nb = onehot.shape[0]
    Dp = slab.shape[2]
    # double-buffered per-step streaming bytes: slab f32 + learner bf16
    # out + reward rows
    per_step = Dp * _WXP_ROWS * 4 + (_LRN_ROWS * 2 + _OUT_ROWS * 4) * w
    chunk_max = max(1, min(48, (81 * 1024 * 1024) // (per_step * 2)))
    chunk = max(d for d in range(1, chunk_max + 1) if steps % d == 0)
    n_chunks = steps // chunk
    slab = slab.reshape(n_chunks, chunk, _WXP_ROWS, Dp)
    if use_rng:
        noise_spec = pl.BlockSpec((1, 1, 1, 1, w),
                                  lambda i, j: (0, 0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        noise = noise.reshape(1, 1, 1, 1, w)
    else:
        noise_spec = pl.BlockSpec((1, 1, chunk, _SROWS, w),
                                  lambda i, j: (i, j, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        noise = noise.reshape(nb, n_chunks, chunk, _SROWS, w)
    H = w1k.shape[0]
    out, lrn = pl.pallas_call(
        functools.partial(_policy_kernel, chunk=chunk, n_chunks=n_chunks,
                          n=n, w=w, iters=iters, project=project,
                          restart=restart, use_rng=use_rng),
        grid=(nb, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_SROWS, _CROWS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CROWS, _SROWS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CONST_ROWS, w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _OBS_ROWS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, _WXP_ROWS, Dp),
                         lambda i, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            noise_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, 1, chunk, _OUT_ROWS, w),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, _LRN_ROWS, w),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, n_chunks, chunk, _OUT_ROWS, w),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nb, n_chunks, chunk, _LRN_ROWS, w),
                                 jnp.bfloat16),
        ),
        scratch_shapes=[pltpu.VMEM((_SROWS, w), jnp.float32)
                        for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=nb * steps * w * (
                2 * H * (_OBS_ROWS + H + 64)
                + (iters * 2 * 2 * _SROWS * _CROWS if project else 0)
                + 2 * _CROWS * _SROWS + 200),
            transcendentals=nb * steps * w * (2 * H + 64 + iters + 2),
            bytes_accessed=nb * steps * w * (
                _WXP_ROWS * 4 + _OUT_ROWS * 4 + _LRN_ROWS * 2)),
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), ct_op, c_op, consts,
      w1k, w2k, wmk, pb, pm, slab, onehot, noise)
    return (out.reshape(nb, steps, _OUT_ROWS, w),
            lrn.reshape(nb, steps, _LRN_ROWS, w))
