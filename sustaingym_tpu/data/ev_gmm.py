"""GMM-based artificial EV-session generation.

Mirrors the reference's GMMsTraceGenerator + train_gmm_model
(/root/reference/sustaingym/envs/evcharging/event_generation.py:331-515,
train_gmm_model.py:51-237): a 30-component, 4-feature Gaussian mixture over
(arrival, departure, estimated-departure, requested-energy), rejection
sampling with oversampling, empirical per-day session counts, and
usage-weighted station assignment.

Sampling runs ONCE on host with NumPy, producing a bank of sampled days
compiled into the same dense trace-pack arrays the jittable env consumes —
episode resets then index into the bank (SURVEY.md §7 design rule 4:
host-precomputed traces for RNG parity).

The sampler is a BIT-EXACT replica of the reference's call sequence:
``sklearn.mixture.GaussianMixture.sample`` with an int ``random_state``
builds a fresh ``np.random.RandomState(seed)`` per call
(``check_random_state``), draws ``multinomial(n, weights)`` component
counts, then per-component ``multivariate_normal`` draws from the SAME
RandomState in component order — all plain NumPy calls replicated here in
``sample_gmm``, so the sklearn object (and its version-fragile pickle) is
not needed at runtime. GMM parameters are loaded from committed ``.npz``
exports (weights/means/covariances/count/station_usage) made once from the
packaged reference pickles by ``export_gmm_npz``.
"""
from __future__ import annotations

import os

import numpy as np

from .ev_etl import MAX_EVS, PERIOD_MIN, _parse_range
from .paths import raw_path

MINS_IN_DAY = 1440
REQ_ENERGY_SCALE = 100.0
ARRCOL, DEPCOL, ESTCOL, EREQCOL = 0, 1, 2, 3

# committed numeric exports of the 8 packaged reference GMM pickles
GMM_NPZ_DIR = os.path.join(os.path.dirname(__file__), "gmm")

_NPZ_KEYS = ("weights", "means", "covariances", "count", "station_usage")


def _npz_path(site: str, start: str, end: str, n_components: int) -> str:
    return os.path.join(GMM_NPZ_DIR, site,
                        f"{start}_{end}_{n_components}.npz")


def export_gmm_npz(site: str, date_period, n_components: int = 30) -> str:
    """One-time export of a packaged reference GMM pickle
    (data/evcharging/gmms/{site}/{start} {end} {n}.pkl, written by the
    reference's save_gmm_model, utils.py:214-245) to a plain-array ``.npz``
    so runtime loading never unpickles sklearn objects. Requires sklearn
    only here (to unpickle); the exports are committed to the repo."""
    import pickle

    start, end = _parse_range(date_period)
    path = raw_path("evcharging", "gmms", site,
                    f"{start} {end} {n_components}.pkl")
    with open(path, "rb") as f:
        d = pickle.load(f)
    gmm = d["gmm"]
    assert gmm.covariance_type == "full"
    out = _npz_path(site, start, end, n_components)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        weights=np.asarray(gmm.weights_, dtype=np.float64),
        means=np.asarray(gmm.means_, dtype=np.float64),
        covariances=np.asarray(gmm.covariances_, dtype=np.float64),
        count=np.asarray(d["count"]),
        station_usage=np.asarray(d["station_usage"]))
    return out


def load_gmm(site: str, date_period, n_components: int = 30) -> dict:
    """Loads GMM parameters as plain arrays (weights (K,), means (K,4),
    covariances (K,4,4), count (n_days,), station_usage (n_stations,)).

    Prefers the committed ``.npz`` export; falls back to a fresh export
    from the packaged reference pickle if the npz is absent (requires
    sklearn for unpickling in that case only)."""
    start, end = _parse_range(date_period)
    path = _npz_path(site, start, end, n_components)
    if not os.path.exists(path):
        path = export_gmm_npz(site, date_period, n_components)
    with np.load(path) as d:
        return {k: d[k] for k in _NPZ_KEYS}


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


def sample_gmm(weights: np.ndarray, means: np.ndarray, covs: np.ndarray,
               n: int, random_state: int) -> np.ndarray:
    """Bit-exact replica of ``GaussianMixture.sample(n)[0]`` for
    ``covariance_type='full'`` with an int ``random_state``
    (sklearn BaseMixture.sample): a FRESH ``RandomState(random_state)``
    per call draws multinomial component counts, then per-component
    multivariate-normal samples from the same RandomState, vstacked in
    component order (NOT shuffled)."""
    rs = np.random.RandomState(random_state)
    counts = rs.multinomial(n, weights)
    return np.vstack([
        rs.multivariate_normal(mean, cov, int(c))
        for mean, cov, c in zip(means, covs, counts)])


def _sample_sessions(params: dict, n: int, random_state: int,
                     oversample: float = 0.2) -> np.ndarray:
    """Rejection sampling loop (event_generation.py:416-463).

    Replicates a reference quirk that matters for bit-exactness: with an
    int random_state every ``gmm.sample`` call in the while loop returns
    IDENTICAL draws (check_random_state builds a fresh RandomState each
    call), so under-filled passes append duplicate sessions before the
    final truncation to ``n``."""
    if n == 0:
        return np.empty((0, 4))
    w, mu, cov = params["weights"], params["means"], params["covariances"]
    out: list[np.ndarray] = []
    total = 0
    passes = 0
    while total < n:
        passes += 1
        if passes > 1000:
            # the reference would infinite-loop here too; only reachable if
            # the filters rejected every draw 1000 times in a row
            raise RuntimeError("GMM rejection sampling made no progress")
        s = sample_gmm(w, mu, cov, int(n * (1 + oversample)), random_state)
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
    (event_generation.py:492-514). Returns station index or -1 (dropped).

    Iteration order matches the reference exactly: pandas
    ``sort_values('arrival')`` on the int-cast arrival column defaults to
    numpy quicksort (introsort), so ties between same-slot arrivals break
    the same way — this fixes the per-row ``rng.choice`` call sequence."""
    n_st = len(station_usage)
    probs = station_usage / max(station_usage.sum(), 1)
    order = np.argsort(samples[:, ARRCOL].astype(np.int64), kind="quicksort")
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
    from .paths import packed_path

    start, end = _parse_range(date_period)
    cache_file = packed_path(
        f"evgmm_{site}_{start}_{end}_{n_components}_{n_days}_{seed}.npz")
    if cache and os.path.exists(cache_file):
        d = np.load(cache_file)
        return {k: d[k] for k in ("ev_data", "ev_station", "ev_mask")}

    data = load_gmm(site, date_period, n_components)
    cnt = np.asarray(data["count"])
    usage = np.asarray(data["station_usage"], dtype=np.float64)

    ev_data = np.zeros((n_days, MAX_EVS, 4), dtype=np.float32)
    ev_station = np.zeros((n_days, MAX_EVS), dtype=np.int32)
    ev_mask = np.zeros((n_days, MAX_EVS), dtype=bool)

    for day in range(n_days):
        # bank entry `day` reproduces the reference generator's exact
        # post-reset(seed + day) stream: default_rng(seed) day-count draw,
        # RandomState(seed)-seeded GMM draws, then station choices
        rng = np.random.default_rng(seed=seed + day)
        n = int(rng.choice(cnt))
        samples = _sample_sessions(data, n, int(seed + day))
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
