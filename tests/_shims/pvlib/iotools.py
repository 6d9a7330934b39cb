from __future__ import annotations

import pandas as pd

from sustaingym_tpu.utils.epw import read_epw as _read_epw


def parse_epw(file_obj):
    data = _read_epw(file_obj)
    return pd.DataFrame(data), {}


def read_epw(path):
    data = _read_epw(path)
    return pd.DataFrame(data), {}
