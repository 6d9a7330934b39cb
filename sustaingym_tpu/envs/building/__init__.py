"""BuildingEnv: multi-zone thermal RC control, TPU-native."""
from __future__ import annotations

from .env import BuildingEnv, BuildingParams, BuildingState, make_params
from .params import (BUILDINGS, GROUND_TEMP, WEATHER, Ufactor, Zone,
                     generate_building_params)


def make_env(building: str = "OfficeSmall", weather: str = "Hot_Dry",
             location: str = "Tucson", dtype=None, **kwargs):
    """Factory: compile params on host and return (env, params)."""
    import jax.numpy as jnp
    p = generate_building_params(building, weather, location, **kwargs)
    params = make_params(p, dtype=dtype or jnp.float32)
    return BuildingEnv(), params


__all__ = [
    "BuildingEnv", "BuildingParams", "BuildingState", "make_params",
    "make_env", "generate_building_params",
    "BUILDINGS", "GROUND_TEMP", "WEATHER", "Ufactor", "Zone",
]
