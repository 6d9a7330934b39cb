"""ElectricityMarketEnv: battery bidding into a 5-min SCED market."""
from __future__ import annotations

from .env import ElectricityMarketEnv, MarketParams, MarketState, make_params
from .network import (BATTERY_CAPACITY_MWH, BATTERY_POWER_MW, GENERATORS,
                      MarketNetwork, build_network, build_sced_matrices)


def make_env(dtype=None, **kwargs):
    import jax.numpy as jnp
    params = make_params(dtype=dtype or jnp.float32, **kwargs)
    return ElectricityMarketEnv(), params


__all__ = [
    "ElectricityMarketEnv", "MarketParams", "MarketState", "make_params",
    "make_env", "build_network", "build_sced_matrices", "MarketNetwork",
    "GENERATORS", "BATTERY_CAPACITY_MWH", "BATTERY_POWER_MW",
]
