"""EV charging-network site specifications (caltech / jpl).

The reference obtains its network constants (station ids, per-station phase
angles, the aggregate-current constraint matrix, constraint magnitudes, and
per-EVSE minimum pilots) from the external ``acnportal`` package
(`site_str_to_site`, /root/reference/sustaingym/envs/evcharging/utils.py:83-88;
consumed at env.py:473-500 and env.py:368-378). acnportal is not installable
in this environment, so the sites here are a RECONSTRUCTION:

- station id lists are the real ones, extracted from the packaged ACN-Data
  session CSVs (data/evcharging/acn_data/{site}/*.csv.gz) — 54 CA-* ids at
  Caltech, 52 AG-* ids at JPL;
- the three-phase topology follows the published ACN-Sim site structure:
  EVSEs on line pairs AB/BC/CA at phase angles 30/-90/150 degrees, pod-level
  current limits, and transformer primary/secondary per-phase limits
  (I_A = I_AB - I_CA etc., primary scaled by the 120/277 turns ratio);
- ``tools/extract_acn_site.py`` regenerates byte-exact constants from
  acnportal when it is available, writing the same JSON schema consumed
  here — swap the file in and every downstream kernel picks it up.

Per-constant provenance (PUBLISHED = stated in the ACN-Sim/ACN-Data papers,
Lee et al., e-Energy'19, or directly implied by hardware specs;
RECONSTRUCTED = this module's guess, replaceable via the extracted JSON):

| Constant | Status |
|---|---|
| 3-phase 208Y/120 V secondary / 480 V delta primary, 30/-90/150 deg line
  pairs, turns ratio 120/277 | PUBLISHED (ACN-Sim paper, Fig. 2 network) |
| Caltech 150 kVA transformer | PUBLISHED (ACN-Sim paper site description) |
| Caltech CC pod 80 A / AV pod 160 A feeder limits | RECONSTRUCTED (pod
  existence and EVSE membership are published; the amp limits are inferred
  from 8x32 A derated feeders) |
| JPL 200 kVA transformer | RECONSTRUCTED (JPL's 52-EVSE site is larger
  than Caltech's garage; no published rating found) |
| JPL per-bank feeder limit ceil(n_bank * 32 * 0.6) | RECONSTRUCTED
  (0.6 oversubscription chosen so the site is meaningfully constrained,
  matching the qualitative behavior of the reference's congested network) |
| EVSE family pilot sets (AV {0,8,16,24,32}, CC {0} U {6..32}) | PUBLISHED
  (reference env.py:346-378 hard-codes them) |
| Station id lists | EXACT (extracted from the packaged ACN-Data CSVs) |

``tests/test_evcharging.py::test_magnitude_sensitivity_*`` quantifies how
each reward term responds to magnitude error, so the blast radius of the
RECONSTRUCTED rows is pinned numerically.

Two EVSE families, as in the reference (env.py:346-353):
AeroVironment (AV): pilots {0, 8, 16, 24, 32} (min pilot 8);
ClipperCreek (CC): pilots {0} U {6..32} (min pilot 6).
"""
from __future__ import annotations

import json
import os
from typing import NamedTuple

import numpy as np

PHASE_AB, PHASE_BC, PHASE_CA = 30.0, -90.0, 150.0
TURNS_RATIO = 120.0 / 277.0  # 208Y/120 secondary -> 480D/277 primary


class SiteSpec(NamedTuple):
    name: str
    station_ids: tuple[str, ...]
    phase_angles: np.ndarray      # (n,) degrees
    constraint_matrix: np.ndarray  # (m, n) real coefficients
    magnitudes: np.ndarray        # (m,) amps
    constraint_names: tuple[str, ...]
    min_pilots: np.ndarray        # (n,) 6 (CC) or 8 (AV)

    @property
    def num_stations(self) -> int:
        return len(self.station_ids)


_CALTECH_IDS = tuple(
    f"CA-{i}" for i in (148, 149, 212, 213, *range(303, 328),
                        *range(489, 514)))
_JPL_IDS = tuple(
    [f"AG-1F{i:02d}" for i in range(1, 15)]
    + [f"AG-3F{i:02d}" for i in range(15, 34)]
    + [f"AG-4F{i:02d}" for i in range(34, 53)])


def _three_phase_constraints(phases: np.ndarray, n: int,
                             transformer_kva: float
                             ) -> tuple[list[np.ndarray], list[float], list[str]]:
    """Secondary/primary per-phase line constraints from EVSE line
    assignments. Line currents combine as I_A = I_AB - I_CA,
    I_B = I_BC - I_AB, I_C = I_CA - I_BC."""
    on = {p: (phases == p) for p in (PHASE_AB, PHASE_BC, PHASE_CA)}
    rows, mags, names = [], [], []
    combos = [("A", PHASE_AB, PHASE_CA), ("B", PHASE_BC, PHASE_AB),
              ("C", PHASE_CA, PHASE_BC)]
    secondary_limit = transformer_kva * 1000.0 / 3.0 / 120.0
    primary_limit = transformer_kva * 1000.0 / 3.0 / 277.0
    for label, plus, minus in combos:
        row = np.zeros(n)
        row[on[plus]] = 1.0
        row[on[minus]] = -1.0
        rows.append(row)
        mags.append(secondary_limit)
        names.append(f"Secondary {label}")
    for label, plus, minus in combos:
        row = np.zeros(n)
        row[on[plus]] = TURNS_RATIO
        row[on[minus]] = -TURNS_RATIO
        rows.append(row)
        mags.append(primary_limit)
        names.append(f"Primary {label}")
    return rows, mags, names


def caltech_site() -> SiteSpec:
    ids = _CALTECH_IDS
    n = len(ids)
    phases = np.empty(n)
    min_pilots = np.full(n, 8.0)

    cc_pod = [ids.index(f"CA-{i}") for i in range(489, 497)]   # 8 ClipperCreek
    av_pod = [ids.index(f"CA-{i}") for i in range(497, 505)]   # 8 AeroVironment
    rest = [i for i in range(n) if i not in cc_pod + av_pod]

    phases[cc_pod] = PHASE_AB
    phases[av_pod] = PHASE_BC
    for k, i in enumerate(rest):
        phases[i] = (PHASE_AB, PHASE_BC, PHASE_CA)[k % 3]
    min_pilots[cc_pod] = 6.0

    rows, mags, names = [], [], []
    row = np.zeros(n); row[cc_pod] = 1.0
    rows.append(row); mags.append(80.0); names.append("CC Pod")
    row = np.zeros(n); row[av_pod] = 1.0
    rows.append(row); mags.append(160.0); names.append("AV Pod")
    r2, m2, n2 = _three_phase_constraints(phases, n, transformer_kva=150.0)
    rows += r2; mags += m2; names += n2

    return SiteSpec("caltech", ids, phases, np.asarray(rows),
                    np.asarray(mags), tuple(names), min_pilots)


def jpl_site() -> SiteSpec:
    ids = _JPL_IDS
    n = len(ids)
    phases = np.empty(n)
    min_pilots = np.full(n, 8.0)

    banks = {
        "1F": [i for i, s in enumerate(ids) if s.startswith("AG-1F")],
        "3F": [i for i, s in enumerate(ids) if s.startswith("AG-3F")],
        "4F": [i for i, s in enumerate(ids) if s.startswith("AG-4F")],
    }
    for bank, phase in zip(banks.values(), (PHASE_AB, PHASE_BC, PHASE_CA)):
        phases[bank] = phase
    min_pilots[banks["1F"]] = 6.0  # ClipperCreek bank

    rows, mags, names = [], [], []
    for label, idx in banks.items():
        row = np.zeros(n); row[idx] = 1.0
        rows.append(row)
        mags.append(np.ceil(len(idx) * 32 * 0.6))  # bank feeder limit
        names.append(f"Bank {label}")
    r2, m2, n2 = _three_phase_constraints(phases, n, transformer_kva=200.0)
    rows += r2; mags += m2; names += n2

    return SiteSpec("jpl", ids, phases, np.asarray(rows),
                    np.asarray(mags), tuple(names), min_pilots)


def load_site(site: str, json_path: str | None = None) -> SiteSpec:
    """Returns a site spec, preferring an extracted-constants JSON
    (tools/extract_acn_site.py output) over the built-in reconstruction.
    ``json_path`` overrides the default package-dir location (tests)."""
    if json_path is None:
        json_path = os.path.join(os.path.dirname(__file__),
                                 f"{site}_acn.json")
    if os.path.exists(json_path):
        with open(json_path) as f:
            d = json.load(f)
        return SiteSpec(
            site, tuple(d["station_ids"]), np.asarray(d["phase_angles"]),
            np.asarray(d["constraint_matrix"]), np.asarray(d["magnitudes"]),
            tuple(d.get("constraint_names", [])),
            np.asarray(d["min_pilots"]))
    if site == "caltech":
        return caltech_site()
    if site == "jpl":
        return jpl_site()
    raise KeyError(f"unknown site {site!r}")
