"""Extracts exact ACN network constants from acnportal into the JSON schema
consumed by sustaingym_tpu.envs.evcharging.sites.load_site.

Run in any environment where acnportal is installed (it is NOT available in
this build container):

    python tools/extract_acn_site.py caltech > sustaingym_tpu/envs/evcharging/caltech_acn.json
    python tools/extract_acn_site.py jpl     > sustaingym_tpu/envs/evcharging/jpl_acn.json

The extracted file replaces the built-in structural reconstruction, making
the network constraints byte-identical to the reference's
(/root/reference/sustaingym/envs/evcharging/utils.py:83-88).
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    import acnportal.acnsim as acns

    site = sys.argv[1]
    cn = (acns.network.sites.caltech_acn() if site == "caltech"
          else acns.network.sites.jpl_acn())
    out = {
        "station_ids": list(cn.station_ids),
        "phase_angles": cn._phase_angles.tolist(),
        "constraint_matrix": cn.constraint_matrix.tolist(),
        "magnitudes": cn.magnitudes.tolist(),
        "constraint_names": list(cn.constraint_index),
        "min_pilots": [float(p) for p in cn.min_pilot_signals],
    }
    json.dump(out, sys.stdout, indent=1)


if __name__ == "__main__":
    main()
