"""GMM-based artificial EV-session generation.

Mirrors the reference's GMMsTraceGenerator + train_gmm_model
(/root/reference/sustaingym/envs/evcharging/event_generation.py:331-515,
train_gmm_model.py:51-237): a 30-component, 4-feature Gaussian mixture over
(arrival, departure, estimated-departure, requested-energy), rejection
sampling with oversampling, empirical per-day session counts, and
usage-weighted station assignment.

Sampling runs ONCE on host with sklearn (the packaged reference GMM pickles
load directly), producing a bank of sampled days compiled into the same
dense trace-pack arrays the jittable env consumes — episode resets then
index into the bank (SURVEY.md §7 design rule 4: host-precomputed traces
for RNG parity).
"""
from __future__ import annotations

import os
import pickle

import numpy as np

from .ev_etl import MAX_EVS, PERIOD_MIN, _parse_range
from .paths import packed_path, raw_path

MINS_IN_DAY = 1440
REQ_ENERGY_SCALE = 100.0
ARRCOL, DEPCOL, ESTCOL, EREQCOL = 0, 1, 2, 3


def load_gmm(site: str, date_period, n_components: int = 30) -> dict:
    """Loads a packaged reference GMM pickle
    (data/evcharging/gmms/{site}/{start} {end} {n}.pkl)."""
    start, end = _parse_range(date_period)
    path = raw_path("evcharging", "gmms", site,
                    f"{start} {end} {n_components}.pkl")
    with open(path, "rb") as f:
        return pickle.load(f)


def fit_gmm(site: str, date_period, n_components: int = 30,
            seed: int = 42) -> dict:
    """Fits a GMM from the packaged session CSVs (train_gmm_model.py:51-155
    preprocessing: times normalized to [0,1) fractions of a day, energy
    scaled by 1/100)."""
    import sklearn.mixture as mixture

    from .ev_etl import _load_sessions
    df = _load_sessions(site, date_period)
    df = df[df["claimed"]]
    feats = np.stack([
        (df["arrival"].dt.hour * 60 + df["arrival"].dt.minute) / MINS_IN_DAY,
        (df["departure"].dt.hour * 60 + df["departure"].dt.minute) / MINS_IN_DAY,
        (df["estimated_departure"].dt.hour * 60
         + df["estimated_departure"].dt.minute) / MINS_IN_DAY,
        df["requested_energy (kWh)"] / REQ_ENERGY_SCALE,
    ], axis=1)
    gmm = mixture.GaussianMixture(n_components=n_components,
                                  random_state=seed).fit(feats)
    # empirical per-day session counts + station usage
    days = df["arrival"].dt.date
    cnt = days.value_counts().sort_index().to_numpy()
    usage = df["station_id"].value_counts()
    return {"gmm": gmm, "count": cnt, "station_usage": usage}


def _sample_sessions(gmm, n: int, rng: np.random.Generator,
                     oversample: float = 0.2) -> np.ndarray:
    """Rejection sampling loop (event_generation.py:416-463)."""
    if n == 0:
        return np.empty((0, 4))
    out: list[np.ndarray] = []
    total = 0
    while total < n:
        s = gmm.sample(int(n * (1 + oversample)))[0]
        s = s[(0 <= s[:, ARRCOL]) & (s[:, DEPCOL] < 1)
              & (s[:, ESTCOL] < 1) & (s[:, EREQCOL] >= 0)]
        s[:, [ARRCOL, DEPCOL, ESTCOL]] = (
            MINS_IN_DAY * s[:, [ARRCOL, DEPCOL, ESTCOL]] // PERIOD_MIN)
        s = s[(s[:, ARRCOL] < s[:, DEPCOL]) & (s[:, ARRCOL] < s[:, ESTCOL])]
        s[:, EREQCOL] *= REQ_ENERGY_SCALE
        out.append(s)
        total += len(s)
    return np.concatenate(out)[:n]


def _assign_stations(samples: np.ndarray, station_usage: np.ndarray,
                     rng: np.random.Generator) -> np.ndarray:
    """Usage-weighted first-available station assignment
    (event_generation.py:492-514). Returns station index or -1 (dropped)."""
    n_st = len(station_usage)
    probs = station_usage / max(station_usage.sum(), 1)
    order = np.argsort(samples[:, ARRCOL], kind="stable")
    station_dep = np.full(n_st, -1, dtype=np.int64)
    assigned = np.full(len(samples), -1, dtype=np.int64)
    for i in order:
        arr = samples[i, ARRCOL]
        avail = np.where(station_dep < arr)[0]
        if len(avail) == 0:
            continue
        p_sum = probs[avail].sum()
        if p_sum <= 1e-5:
            idx = rng.choice(avail)
        else:
            idx = rng.choice(avail, p=probs[avail] / p_sum)
        station_dep[idx] = max(samples[i, DEPCOL], station_dep[idx])
        assigned[i] = idx
    return assigned


def build_gmm_trace_pack(site: str, date_period,
                         n_days: int = 200,
                         n_components: int = 30,
                         requested_energy_cap: float = 100.0,
                         seed: int = 0,
                         cache: bool = True) -> dict[str, np.ndarray]:
    """Samples a bank of ``n_days`` artificial days from the packaged GMM
    and compiles them into the dense trace-pack layout of
    ev_etl.build_trace_pack. Day k of the bank is deterministic for a given
    (seed, k) — seeded resets are reproducible like the reference's."""
    start, end = _parse_range(date_period)
    cache_file = packed_path(
        f"evgmm_{site}_{start}_{end}_{n_components}_{n_days}_{seed}.npz")
    if cache and os.path.exists(cache_file):
        d = np.load(cache_file)
        return {k: d[k] for k in ("ev_data", "ev_station", "ev_mask")}

    data = load_gmm(site, date_period, n_components)
    gmm, cnt = data["gmm"], np.asarray(data["count"])
    usage = np.asarray(data["station_usage"], dtype=np.float64)

    ev_data = np.zeros((n_days, MAX_EVS, 4), dtype=np.float32)
    ev_station = np.zeros((n_days, MAX_EVS), dtype=np.int32)
    ev_mask = np.zeros((n_days, MAX_EVS), dtype=bool)

    for day in range(n_days):
        rng = np.random.default_rng(seed=seed + day)
        gmm.set_params(random_state=int(seed + day))
        n = int(rng.choice(cnt))
        samples = _sample_sessions(gmm, n, rng)
        st = _assign_stations(samples, usage, rng)
        keep = st >= 0
        samples, st = samples[keep], st[keep]
        k = min(len(samples), MAX_EVS)
        arr = samples[:k, ARRCOL]
        dep = samples[:k, DEPCOL]
        est = samples[:k, ESTCOL]
        req = np.clip(samples[:k, EREQCOL], 0, requested_energy_cap)
        ev_data[day, :k] = np.stack([arr, dep, est, req], axis=1)
        ev_station[day, :k] = st[:k]
        ev_mask[day, :k] = True

    pack = {"ev_data": ev_data, "ev_station": ev_station, "ev_mask": ev_mask}
    if cache:
        np.savez_compressed(cache_file, **pack)
    return pack


def main(argv=None) -> None:
    """CLI mirror of the reference GMM trainer
    (``python -m sustaingym.envs.evcharging.train_gmm_model``,
    train_gmm_model.py:210-237): fits per-site/period GMMs from the packaged
    session data and saves them beside the packaged pickles."""
    import argparse
    import pickle

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("--site", default="caltech",
                        choices=["caltech", "jpl"])
    parser.add_argument("--gmm-n", type=int, default=30,
                        help="number of mixture components")
    parser.add_argument("--date-period", default="Summer 2021",
                        help="default period name or 'YYYY-MM-DD YYYY-MM-DD'")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--out", default=None,
                        help="output pickle path (default: print summary only)")
    args = parser.parse_args(argv)

    model = fit_gmm(args.site, args.date_period, n_components=args.gmm_n,
                    seed=args.seed)
    gmm = model["gmm"]
    print(f"fit {args.gmm_n}-component GMM for {args.site} "
          f"({args.date_period}): {len(model['count'])} days, "
          f"avg {model['count'].mean():.1f} sessions/day, "
          f"log-likelihood {gmm.lower_bound_:.3f}")
    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(model, f)
        print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
