"""DataCenterEnv — carbon-aware job scheduling via virtual capacity curves.

Implemented FROM THE DOC SPEC (/root/reference/docs/datacenterenv.md; the
reference's sustaingym/envs/data_center.py:12-36 is an unimplemented stub):

- hourly steps, one episode per calendar month (fixed 28 days = 672 steps
  for static shapes);
- the agent sets the VCC a(t) in [0,1] — the fraction of datacenter
  capacity C the scheduler may allocate next hour;
- jobs arrive as job-hours (a deterministic Google-cluster-like trace with
  diurnal/weekday structure — the real May-2019 cluster sample is not
  packaged anywhere in the reference) and run FIFO up to the active VCC;
- reward (doc eq., negated into a proper reward):
      r(t) = -( d_t * m_t
                + 1[t % 24 == 0] * max(0, 0.97 w_t - C * sum_{h=1..24} a(t-h)) )
  where d_t is the executed load, m_t the MOER, and w_t the job-hours
  enqueued over the just-finished day (the penalty discourages delaying
  work by more than ~a day);
- obs (27,): [a(t-1), d_t, n_jobs_waiting, 24h MOER forecast]. MOER comes
  from the packaged SGIP data (hourly subsample); the 24-h "forecast" is
  the true future trajectory (the packaged forecasts only reach 3 h).
- distribution shift = episode month (2019-05 .. 2021-08 packaged range).
"""
from __future__ import annotations

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np

from ...core import (Box, FunctionalEnv, TimeStep, dataclass, static_field)

HOURS_PER_DAY = 24
EPISODE_DAYS = 28
EPISODE_LEN = HOURS_PER_DAY * EPISODE_DAYS  # 672
FORECAST_H = 24
CAPACITY = 1.0            # normalized datacenter capacity C
DELAY_FACTOR = 0.97       # doc: 0.97 w_t
AVG_JOB_SIZE = 0.02       # job-hours per job (for the n-jobs-waiting obs)

MONTH_RANGE_START = (2019, 5)
MONTH_RANGE_END = (2021, 8)


@dataclass
class DCParams:
    arrivals: jax.Array   # (n_months, 672) job-hours arriving per hour
    moer: jax.Array       # (n_months, 672 + 24) hourly MOER kg/kWh
    n_months: int = static_field()


@dataclass
class DCState:
    month: jax.Array       # int32 episode index
    t: jax.Array           # int32 hour within episode
    queue: jax.Array       # backlog job-hours
    prev_a: jax.Array      # previous VCC
    running: jax.Array     # executed load last hour (d_t)
    day_vcc_sum: jax.Array   # sum of VCC over current day
    day_arrivals: jax.Array  # job-hours enqueued over current day


def _months() -> list[tuple[int, int]]:
    out = []
    y, m = MONTH_RANGE_START
    while (y, m) <= MONTH_RANGE_END:
        out.append((y, m))
        m += 1
        if m > 12:
            y, m = y + 1, 1
    return out


def _synthesize_arrivals(n_months: int, seed: int = 11) -> np.ndarray:
    """Deterministic cluster-trace-like arrivals: business-hours diurnal
    peak, weekday/weekend split, heavy-tailed bursts. Mean utilization
    ~0.55 C."""
    rng = np.random.default_rng(seed)
    out = np.empty((n_months, EPISODE_LEN))
    for mth in range(n_months):
        hours = np.arange(EPISODE_LEN)
        hod = hours % 24
        dow = (hours // 24) % 7
        diurnal = 0.35 + 0.3 * np.exp(-0.5 * ((hod - 14.5) / 3.5) ** 2)
        weekday = np.where(dow < 5, 1.0, 0.72)
        bursts = rng.pareto(3.0, EPISODE_LEN) * 0.05
        noise = rng.normal(scale=0.03, size=EPISODE_LEN)
        out[mth] = np.clip(diurnal * weekday + bursts + noise, 0.02, 1.5)
    return out


def make_params(dtype=jnp.float32) -> DCParams:
    from ...data.ev_etl import build_moer_pack

    months = _months()
    moer_rows = []
    for (y, m) in months:
        first = dt.date(y, m, 1)
        last = first + dt.timedelta(days=EPISODE_DAYS + 1)
        pack = build_moer_pack((first.isoformat(), last.isoformat()))
        hourly = pack[:, ::12, 0][:, :HOURS_PER_DAY]  # (days, 24)
        flat = hourly.reshape(-1)[:EPISODE_LEN + FORECAST_H]
        moer_rows.append(flat)
    moer = np.stack(moer_rows)
    arrivals = _synthesize_arrivals(len(months))
    return DCParams(
        arrivals=jnp.asarray(arrivals, dtype),
        moer=jnp.asarray(moer, dtype),
        n_months=len(months))


class DataCenterEnv(FunctionalEnv[DCParams, DCState]):
    name = "datacenter"

    @staticmethod
    def month_from_seed(params: DCParams, seed: int) -> int:
        return seed % params.n_months

    def reset(self, params: DCParams, key: jax.Array
              ) -> tuple[DCState, TimeStep]:
        month = jax.random.randint(key, (), 0, params.n_months)
        return self.reset_at_month(params, month)

    def reset_at_month(self, params: DCParams, month
                       ) -> tuple[DCState, TimeStep]:
        dtype = params.moer.dtype
        z = jnp.zeros((), dtype)
        state = DCState(
            month=jnp.asarray(month, jnp.int32),
            t=jnp.zeros((), jnp.int32),
            queue=z, prev_a=jnp.ones((), dtype), running=z,
            day_vcc_sum=z, day_arrivals=z)
        ts = TimeStep(obs=self._obs(params, state), reward=z,
                      terminated=jnp.zeros((), bool),
                      truncated=jnp.zeros((), bool),
                      info={"carbon_cost": z, "delay_penalty": z,
                            "queue": z, "executed": z})
        return state, ts

    def step(self, params: DCParams, state: DCState, action: jax.Array,
             key: jax.Array) -> tuple[DCState, TimeStep]:
        del key
        dtype = params.moer.dtype
        a = jnp.clip(jnp.reshape(jnp.asarray(action, dtype), ()), 0.0, 1.0)

        t = state.t
        arrivals = params.arrivals[state.month, t]
        backlog = state.queue + arrivals
        cap = a * CAPACITY
        executed = jnp.minimum(backlog, cap)
        queue = backlog - executed

        m_t = params.moer[state.month, t]
        carbon_cost = executed * m_t

        day_vcc_sum = state.day_vcc_sum + a
        day_arrivals = state.day_arrivals + arrivals
        t_next = t + 1
        day_boundary = (t_next % HOURS_PER_DAY) == 0
        delay_penalty = jnp.where(
            day_boundary,
            jnp.maximum(0.0, DELAY_FACTOR * day_arrivals
                        - CAPACITY * day_vcc_sum),
            0.0)
        reward = -(carbon_cost + delay_penalty)

        new_state = DCState(
            month=state.month, t=t_next, queue=queue, prev_a=a,
            running=executed,
            day_vcc_sum=jnp.where(day_boundary, 0.0, day_vcc_sum),
            day_arrivals=jnp.where(day_boundary, 0.0, day_arrivals))
        ts = TimeStep(
            obs=self._obs(params, new_state),
            reward=reward,
            terminated=t_next >= EPISODE_LEN,
            truncated=jnp.zeros((), bool),
            info={"carbon_cost": carbon_cost,
                  "delay_penalty": delay_penalty,
                  "queue": queue, "executed": executed})
        return new_state, ts

    def _obs(self, params: DCParams, state: DCState) -> jax.Array:
        """(27,) = [a(t-1), d_t, n_waiting, moer forecast 24h]
        (docs/datacenterenv.md:8)."""
        fc = jax.lax.dynamic_slice(params.moer[state.month],
                                   (state.t,), (FORECAST_H,))
        n_waiting = state.queue / AVG_JOB_SIZE
        return jnp.concatenate([
            state.prev_a[None], state.running[None], n_waiting[None], fc,
        ]).astype(params.moer.dtype)

    def observation_space(self, params: DCParams) -> Box:
        low = np.concatenate([[0, 0, 0], np.zeros(FORECAST_H)])
        high = np.concatenate([[1, CAPACITY, 1e5], np.ones(FORECAST_H)])
        return Box(low, high)

    def action_space(self, params: DCParams) -> Box:
        return Box(0.0, 1.0, (1,))
