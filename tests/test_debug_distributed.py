"""Tests for the auxiliary subsystems: checkify debug checks (SURVEY.md §5
"race detection / sanitizers") and the multi-host seed contract
(SURVEY.md §7 hard part 5)."""
from __future__ import annotations

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sustaingym_tpu import make
from sustaingym_tpu.core.env import FunctionalEnv, TimeStep
from sustaingym_tpu.core.spaces import Box
from sustaingym_tpu.parallel import host_env_keys, host_fold
from sustaingym_tpu.utils.debug import (check_timestep, checked_reset,
                                        checked_step, validate_batch_rollout)


# ---------------------------------------------------------------- checkify

class _NaNEnv(FunctionalEnv):
    """Minimal env that emits a NaN reward after step 3."""

    name = "nan-test"

    def reset(self, params, key):
        obs = jnp.zeros(2, jnp.float32)
        return jnp.int32(0), TimeStep(obs=obs, reward=jnp.float32(0),
                                      terminated=jnp.bool_(False),
                                      truncated=jnp.bool_(False), info={})

    def step(self, params, state, action, key):
        t = state + 1
        reward = jnp.where(t > 3, jnp.float32(jnp.nan), jnp.float32(1.0))
        ts = TimeStep(obs=jnp.zeros(2, jnp.float32), reward=reward,
                      terminated=jnp.bool_(False), truncated=jnp.bool_(False),
                      info={})
        return t, ts

    def observation_space(self, params):
        return Box(-1.0, 1.0, (2,))

    def action_space(self, params):
        return Box(-1.0, 1.0, (1,))


def test_checked_step_flags_nan_reward():
    env = _NaNEnv()
    key = jax.random.PRNGKey(0)
    state, _ = env.reset(None, key)
    step = jax.jit(checked_step(env))
    action = jnp.zeros(1, jnp.float32)
    for _ in range(3):
        (state, ts), err = step(None, state, action, key)
        err.throw()  # clean steps pass
    (state, ts), err = step(None, state, action, key)
    with pytest.raises(Exception, match="non-finite reward"):
        err.throw()


def test_validate_batch_rollout_raises_on_nan():
    with pytest.raises(Exception, match="non-finite reward"):
        validate_batch_rollout(_NaNEnv(), None, jax.random.PRNGKey(0),
                               batch=4, steps=8)


def test_checked_reset_clean_on_real_envs():
    for name in ("building", "cogen", "datacenter"):
        env, params = make(name)
        (state, ts), err = jax.jit(checked_reset(env))(
            params, jax.random.PRNGKey(0))
        err.throw()


def test_validate_batch_rollout_clean_on_building():
    env, params = make("building")
    validate_batch_rollout(env, params, jax.random.PRNGKey(0),
                           batch=8, steps=8)


def test_check_timestep_bounds():
    ts = TimeStep(obs=jnp.full(2, 5.0, jnp.float32), reward=jnp.float32(0),
                  terminated=jnp.bool_(False), truncated=jnp.bool_(False),
                  info={})
    from jax.experimental import checkify

    def f():
        check_timestep(ts, Box(-1.0, 1.0, (2,)))
        return jnp.float32(0)

    err, _ = checkify.checkify(f, errors=checkify.user_checks)()
    with pytest.raises(Exception, match="outside declared"):
        err.throw()


# ------------------------------------------------------- multi-host seeding

def test_host_fold_independent_of_host_count():
    key = jax.random.PRNGKey(42)
    # host h's stream depends only on (key, h) — never on process_count
    k0 = host_fold(key, process_index=0)
    k3 = host_fold(key, process_index=3)
    assert not np.array_equal(np.asarray(k0), np.asarray(k3))
    assert np.array_equal(np.asarray(k0),
                          np.asarray(jax.random.fold_in(key, 0)))


def test_host_env_keys_partition_matches_single_host():
    """The union of all hosts' env keys == the single-host global split,
    in order, with no overlap (disjoint trace slices, SURVEY §7 HP5)."""
    key = jax.random.PRNGKey(7)
    global_batch, n_hosts = 32, 4
    single = np.asarray(jax.random.split(key, global_batch))
    shards = [np.asarray(host_env_keys(key, global_batch, process_index=h,
                                       process_count=n_hosts))
              for h in range(n_hosts)]
    assert all(s.shape[0] == global_batch // n_hosts for s in shards)
    assert np.array_equal(np.concatenate(shards, axis=0), single)
    flat = np.concatenate(shards, axis=0)
    assert len({tuple(row) for row in flat}) == global_batch  # no overlap


def test_host_env_keys_divisibility_guard():
    # ValueError, not assert: must survive `python -O`
    with pytest.raises(ValueError):
        host_env_keys(jax.random.PRNGKey(0), 10, process_index=0,
                      process_count=4)


# ---------------------------------------------------------------------------
# True multi-PROCESS jax.distributed run (SURVEY §4: "multi-host tests
# runnable on CPU via jax.distributed")
# ---------------------------------------------------------------------------

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_distributed_worker.py")


def _run_worker(rank: int, nprocs: int, port: int) -> subprocess.Popen:
    env = dict(os.environ)
    # clean slate: the pytest process carries an 8-virtual-device XLA_FLAGS
    # that must not leak into the workers (each worker sizes its own devices)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen(
        [sys.executable, _WORKER, "--rank", str(rank),
         "--nprocs", str(nprocs), "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)


def _metrics_from(proc: subprocess.Popen, timeout: float = 280.0) -> dict:
    out, _ = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, out
    for line in out.splitlines():
        if line.startswith("METRICS "):
            return json.loads(line[len("METRICS "):])
    raise AssertionError(f"no METRICS line in worker output:\n{out}")


def test_multiprocess_jax_distributed_matches_single_process():
    """Spawns a REAL 2-process jax.distributed group (explicit coordinator,
    1 CPU device per process), runs 3 fused PPO train steps on the global
    2-device mesh, and asserts the metrics equal a single-process run of the
    same global batch — the seed contract (distributed.py:94-109) and the
    SPMD program are process-count-invariant."""
    port = 29000 + os.getpid() % 1000
    procs = [_run_worker(r, 2, port) for r in range(2)]
    multi = [_metrics_from(p) for p in procs]
    assert all(m.pop("process_count") == 2 for m in multi)
    # both processes report the same (psum-replicated) metrics
    assert multi[0] == multi[1]

    single_proc = _run_worker(0, 1, port)
    single = _metrics_from(single_proc)
    assert single.pop("process_count") == 1
    for k in single:
        np.testing.assert_allclose(multi[0][k], single[k], rtol=1e-6,
                                   err_msg=k)
