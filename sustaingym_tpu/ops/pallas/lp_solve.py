"""Pallas TPU kernel: the whole fixed-iteration PDHG solve in one launch.

The XLA ``ops.lp.solve_lp`` loop runs ~12 small kernels per iteration
(two (156, 140)-scale matmuls + elementwise updates); at the SCED market's
shapes that is launch/fusion-overhead-bound — ~10% of the bf16 MXU rate,
and the market env tops out at ~5.9M env-steps/s with the solve taking
~90% of the step (round-5 profile). This kernel runs ALL iterations of
the solve inside one pallas_call per lane group: iterates live in
registers/VMEM, the four matvecs per iteration are (rows, vars) x
(vars, w) MXU ops over w lane envs, and the only HBM traffic is the
per-call problem data (c, b, h, bounds, warm starts) and the solution.

Matches ``ops.lp.solve_lp`` on operators with a paired S block and no
residual G rows (the SCED form): same preconditioned iteration, same
shared +/- matvec, bf16 matmul inputs with f32 accumulation (the
``matmul_dtype=bfloat16`` XLA path's numerics — parity-tested in
tests/test_ops_pallas.py).

Layouts (W lanes = envs; sublanes = variables/rows, padded to 8):
  a_op  (MEp, Np)   st rows of A;     at_op (Np, MEp)
  s_op  (MSp, Np)   paired rows;      st_op (Np, MSp)
  steps (Np|MEp|MSp, 128) f32 col 0 = tau / sigma_a / sigma_s
  per-group blocks: c/ub/x0 (Np, w), b/y0 (MEp, w),
                    hp/hm/zp0/zm0 (MSp, w)
  outputs: x (Np, w), y (MEp, w), zp/zm (MSp, w)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pdhg_solve_paired", "pack_pdhg_operands"]


def _pad8(k: int) -> int:
    return -(-k // 8) * 8


def pack_pdhg_operands(op) -> dict:
    """Host-side packing of an ops.lp.LPOperator (me equalities + paired
    S block, mg == 0) into the kernel's padded operand layouts."""
    assert op.mg == 0, "kernel covers the paired SCED form only"
    n, me, ms = op.n, op.me, op.ms
    Np, MEp, MSp = _pad8(n), _pad8(me), _pad8(ms)
    A = np.zeros((MEp, Np), np.float32)
    A[:me, :n] = np.asarray(op.A)
    S = np.zeros((MSp, Np), np.float32)
    S[:ms, :n] = np.asarray(op.S)
    steps_x = np.zeros((Np, 128), np.float32)
    steps_x[:n, 0] = np.asarray(op.tau)
    steps_y = np.zeros((MEp, 128), np.float32)
    steps_y[:me, 0] = np.asarray(op.sigma_a)
    steps_z = np.zeros((MSp, 128), np.float32)
    steps_z[:ms, 0] = np.asarray(op.sigma_s)
    return {
        "a_op": jnp.asarray(A), "at_op": jnp.asarray(A.T.copy()),
        "s_op": jnp.asarray(S), "st_op": jnp.asarray(S.T.copy()),
        "steps_x": jnp.asarray(steps_x), "steps_y": jnp.asarray(steps_y),
        "steps_z": jnp.asarray(steps_z),
    }


def _kernel(a_ref, at_ref, s_ref, st_ref, sx_ref, sy_ref, sz_ref,
            c_ref, b_ref, hp_ref, hm_ref, ub_ref, x0_ref, y0_ref,
            zp0_ref, zm0_ref, x_out, y_out, zp_out, zm_out, *,
            iters: int, w: int):
    tau = sx_ref[:, 0:1]
    sig_a = sy_ref[:, 0:1]
    sig_s = sz_ref[:, 0:1]
    c = c_ref[0]
    b = b_ref[0]
    hp = hp_ref[0]
    hm = hm_ref[0]
    ub = ub_ref[0]
    bf = jnp.bfloat16

    def mm(mat, v):
        return jnp.dot(mat.astype(bf), v.astype(bf),
                       preferred_element_type=jnp.float32)

    def body(_, carry):
        x, y, zp, zm = carry
        grad = (c + mm(at_ref[:], y) + mm(st_ref[:], zp - zm))
        x_new = jnp.clip(x - tau * grad, 0.0, ub)
        x_bar = 2.0 * x_new - x
        y_new = y + sig_a * (mm(a_ref[:], x_bar) - b)
        s = mm(s_ref[:], x_bar)
        zp_new = jnp.maximum(0.0, zp + sig_s * (s - hp))
        zm_new = jnp.maximum(0.0, zm + sig_s * (-s - hm))
        return (x_new, y_new, zp_new, zm_new)

    x0 = jnp.clip(x0_ref[0], 0.0, ub)
    z0p = jnp.maximum(zp0_ref[0], 0.0)
    z0m = jnp.maximum(zm0_ref[0], 0.0)
    x, y, zp, zm = jax.lax.fori_loop(
        0, iters, body, (x0, y0_ref[0], z0p, z0m))
    x_out[0] = x
    y_out[0] = y
    zp_out[0] = zp
    zm_out[0] = zm


@functools.partial(jax.jit, static_argnames=("dims", "iters", "w",
                                             "interpret"))
def pdhg_solve_paired(ops: dict, c, b, hp, hm, ub, x0, y0, zp0, zm0,
                      dims: tuple, iters: int, w: int = 512,
                      interpret: bool = False):
    """Batched paired-form PDHG solve, whole iteration loop in-kernel.

    ``dims`` is the static (n, me, ms) of the operator. Per-env arrays
    come in ENV-MAJOR (B, rows) layout and are transposed here to the
    kernel's (rows, lanes) layout (cheap: the largest is (B, 160) f32);
    ``ub`` may instead be pre-transposed to the kernel's (nb, Np, w)
    layout (it is step-invariant in the market unroll — hoist the
    transpose out of the per-step call). Returns (x, y, zp, zm)
    env-major.
    """
    n, me, ms = dims
    Np, MEp, MSp = _pad8(n), _pad8(me), _pad8(ms)
    B = c.shape[0]
    assert B % w == 0, (B, w)
    nb = B // w

    def to_k(v, rows_p):
        out = jnp.zeros((B, rows_p), jnp.float32).at[:, :v.shape[1]].set(v)
        return jnp.transpose(out.reshape(nb, w, rows_p), (0, 2, 1))

    def from_k(v, rows):
        return jnp.transpose(v, (0, 2, 1)).reshape(B, -1)[:, :rows]

    ub_k = ub if ub.ndim == 3 else to_k(ub, Np)
    args = [to_k(c, Np), to_k(b, MEp), to_k(hp, MSp), to_k(hm, MSp),
            ub_k, to_k(x0, Np), to_k(y0, MEp), to_k(zp0, MSp),
            to_k(zm0, MSp)]

    grp = lambda i: (i, 0, 0)
    fix = lambda i: (0, 0)
    vspec = lambda rows: pl.BlockSpec((1, rows, w), grp,
                                      memory_space=pltpu.VMEM)
    mspec = lambda r, k: pl.BlockSpec((r, k), fix, memory_space=pltpu.VMEM)
    x, y, zp, zm = pl.pallas_call(
        functools.partial(_kernel, iters=iters, w=w),
        grid=(nb,),
        in_specs=[
            mspec(MEp, Np), mspec(Np, MEp), mspec(MSp, Np), mspec(Np, MSp),
            mspec(Np, 128), mspec(MEp, 128), mspec(MSp, 128),
            vspec(Np), vspec(MEp), vspec(MSp), vspec(MSp), vspec(Np),
            vspec(Np), vspec(MEp), vspec(MSp), vspec(MSp),
        ],
        out_specs=(vspec(Np), vspec(MEp), vspec(MSp), vspec(MSp)),
        out_shape=(
            jax.ShapeDtypeStruct((nb, Np, w), jnp.float32),
            jax.ShapeDtypeStruct((nb, MEp, w), jnp.float32),
            jax.ShapeDtypeStruct((nb, MSp, w), jnp.float32),
            jax.ShapeDtypeStruct((nb, MSp, w), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=nb * w * iters * 4 * 2 * Np * MSp,
            transcendentals=0,
            bytes_accessed=nb * w * 4 * (4 * Np + 3 * MEp + 6 * MSp)),
        interpret=interpret,
    )(ops["a_op"], ops["at_op"], ops["s_op"], ops["st_op"],
      ops["steps_x"], ops["steps_y"], ops["steps_z"], *args)
    return (from_k(x, n), from_k(y, me), from_k(zp, ms), from_k(zm, ms))
