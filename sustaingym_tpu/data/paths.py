"""Raw/packed data path resolution.

The raw SustainGym datasets (ASHRAE HTM building tables, TMY3 EPW weather,
MOER monthly CSVs, ACN session CSVs, ERCOT/Henry-Hub price files) are public
artifacts shipped with the reference distribution. This package reads them
from a configurable raw-data root and compiles them ONCE into dense,
device-friendly ``.npz`` packs under ``packed/`` (SURVEY.md §7 design rule 2).
Set ``SUSTAINGYM_RAW`` to point at a raw data directory with the reference
layout (``building/``, ``moer/``, ``cogen/``, ``evcharging/``).
"""
from __future__ import annotations

import os

_DEFAULT_RAW_CANDIDATES = (
    os.environ.get("SUSTAINGYM_RAW", ""),
    "/root/reference/sustaingym/data",
    os.path.join(os.path.dirname(__file__), "raw"),
)

PACKED_DIR = os.environ.get(
    "SUSTAINGYM_PACKED", os.path.join(os.path.dirname(__file__), "packed"))


def raw_root() -> str:
    """Returns the first existing raw-data root."""
    for cand in _DEFAULT_RAW_CANDIDATES:
        if cand and os.path.isdir(cand):
            return cand
    raise FileNotFoundError(
        "No raw SustainGym data directory found. Set SUSTAINGYM_RAW to a "
        "directory with the reference data layout (building/, moer/, ...).")


def raw_path(*parts: str) -> str:
    return os.path.join(raw_root(), *parts)


def packed_path(*parts: str) -> str:
    os.makedirs(PACKED_DIR, exist_ok=True)
    return os.path.join(PACKED_DIR, *parts)
