"""Minimal pvlib stand-in for running the reference BuildingEnv in tests.

The reference only uses ``pvlib.iotools.parse_epw``/``read_epw``
(/root/reference/sustaingym/envs/building/utils.py:579-582) to pull the
``temp_air`` and ``ghi`` columns out of TMY3 EPW weather files; we serve
those from our own EPW parser (sustaingym_tpu/utils/epw.py).
"""
from . import iotools  # noqa: F401
