"""Runtime sanity checking for env kernels via ``jax.experimental.checkify``.

The reference has no sanitizers — its envs are single-threaded Python, so a
NaN or out-of-range value surfaces as an ordinary exception (SURVEY.md §5).
Inside ``jit``/``vmap``/``scan`` nothing surfaces: a NaN silently poisons the
whole batch. This module is the rebuild's replacement: wrap any functional
env in the checked helpers during development and every reset/step is
augmented with checkify assertions that

* obs / reward are finite,
* reward breakdowns in ``info`` are finite,
* terminated/truncated are genuine booleans,
* (optionally) obs lie inside the env's declared observation-space bounds.

The wrappers stay jittable — errors are threaded functionally through
checkify and raised on the host with ``Error.throw()`` — and compose with
``vmap``/``scan``. Production paths never pay for this; the checks exist only
when you opt in (mirroring how the reference's ``verbose`` flag gates its
printing, /root/reference/sustaingym/envs/evcharging/env.py:116-129).

Typical use::

    env, params = make("building")
    (state, ts), err = checked_reset(env)(params, key)
    err.throw()                       # raises if the kernel produced NaNs

or, the one-call batch smoke test::

    validate_batch_rollout(env, params, jax.random.PRNGKey(0))
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..core.env import FunctionalEnv, TimeStep
from ..core.spaces import Box, DictSpace

__all__ = ["check_timestep", "checked_reset", "checked_step",
           "validate_batch_rollout"]

_CHECKS = checkify.user_checks | checkify.float_checks


def check_timestep(ts: TimeStep, obs_space: Any = None) -> None:
    """checkify assertions over one TimeStep (call under jit/vmap/scan)."""
    flat_obs, _ = jax.tree.flatten(ts.obs)
    for i, leaf in enumerate(flat_obs):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            checkify.check(jnp.all(jnp.isfinite(leaf)),
                           f"non-finite value in obs leaf {i}")
    checkify.check(jnp.all(jnp.isfinite(ts.reward)), "non-finite reward")
    for name, val in sorted(ts.info.items()):
        val = jnp.asarray(val)
        if jnp.issubdtype(val.dtype, jnp.floating):
            checkify.check(jnp.all(jnp.isfinite(val)),
                           f"non-finite info[{name}]")
    for flag in (ts.terminated, ts.truncated):
        flag = jnp.asarray(flag)
        checkify.check(jnp.all((flag == 0) | (flag == 1)),
                       "terminated/truncated not boolean")
    if obs_space is not None:
        _check_bounds(ts.obs, obs_space, "obs")


def _check_bounds(obs: Any, space: Any, label: str) -> None:
    """Recursive bounds check: Box leaves against their declared ranges,
    DictSpace entries walked by key. Structured spaces the walk cannot
    interpret raise rather than silently skipping (a requested bounds check
    must never be a no-op)."""
    if isinstance(space, DictSpace):
        for name, sub in space.spaces.items():
            _check_bounds(obs[name], sub, f"{label}[{name}]")
        return
    if isinstance(space, Box):
        x = jnp.asarray(obs)
        lo = jnp.asarray(space.low, x.dtype)
        hi = jnp.asarray(space.high, x.dtype)
        # one part in 1e-5 of slack for float32 rounding at the bounds
        slack = 1e-5 * (1.0 + jnp.abs(lo) + jnp.abs(hi))
        checkify.check(
            jnp.all((x >= lo - slack) & (x <= hi + slack)),
            f"{label} outside declared observation-space bounds")
        return
    if hasattr(space, "nvec"):        # MultiDiscrete
        x = jnp.asarray(obs)
        checkify.check(
            jnp.all((x >= 0) & (x < jnp.asarray(space.nvec, x.dtype))),
            f"{label} outside MultiDiscrete range")
        return
    if hasattr(space, "n"):           # Discrete
        x = jnp.asarray(obs)
        checkify.check(
            jnp.all((x >= space.start) & (x < space.start + space.n)),
            f"{label} outside Discrete range")
        return
    raise TypeError(
        f"check_bounds requested but space type {type(space).__name__} "
        f"for {label} is unsupported")


def checked_reset(env: FunctionalEnv, check_bounds: bool = False
                  ) -> Callable:
    """Returns ``reset(params, key) -> ((state, ts), Error)``."""

    def reset(params, key):
        state, ts = env.reset(params, key)
        space = env.observation_space(params) if check_bounds else None
        check_timestep(ts, space)
        return state, ts

    def run(params, key):
        err, out = checkify.checkify(reset, errors=_CHECKS)(params, key)
        return out, err

    return run


def checked_step(env: FunctionalEnv, check_bounds: bool = False
                 ) -> Callable:
    """Returns ``step(params, state, action, key) -> ((state, ts), Error)``."""

    def step(params, state, action, key):
        new_state, ts = env.step(params, state, action, key)
        space = env.observation_space(params) if check_bounds else None
        check_timestep(ts, space)
        return new_state, ts

    def run(params, state, action, key):
        err, out = checkify.checkify(step, errors=_CHECKS)(
            params, state, action, key)
        return out, err

    return run


def validate_batch_rollout(env: FunctionalEnv, params: Any, key: jax.Array,
                           batch: int = 32, steps: int = 16,
                           check_bounds: bool = False) -> None:
    """Rolls a random-action batch through the env with all checks armed and
    raises on the first NaN / div-by-zero / bounds violation.

    The whole program (vmapped reset, ``lax.scan`` of vmapped autoreset
    steps, every TimeStep checked) is checkified as one unit, so checkify
    owns the error plumbing through vmap and scan.
    """
    from ..core.rollout import random_policy
    from ..core.env import autoreset_step

    policy = random_policy(env, params, batch)
    step = autoreset_step(env)
    space = env.observation_space(params) if check_bounds else None

    def rollout(key):
        kr, ks = jax.random.split(key)

        def reset_one(k):
            state, ts = env.reset(params, k)
            check_timestep(ts, space)
            return state, ts

        state, ts = jax.vmap(reset_one)(jax.random.split(kr, batch))

        def body(carry, k):
            state, obs = carry
            ka, kk = jax.random.split(k)
            action = policy(None, obs, ka)

            def step_one(s, a, k1):
                new_s, ts = step(params, s, a, k1)
                check_timestep(ts, space)
                return new_s, ts

            state, ts = jax.vmap(step_one)(
                state, action, jax.random.split(kk, batch))
            return (state, ts.obs), ts.reward

        (state, _), rewards = jax.lax.scan(
            body, (state, ts.obs), jax.random.split(ks, steps))
        return rewards.sum()

    err, total = jax.jit(checkify.checkify(rollout, errors=_CHECKS))(key)
    jax.block_until_ready(total)
    err.throw()
