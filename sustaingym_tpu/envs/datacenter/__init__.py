"""DataCenterEnv: carbon-aware datacenter load shifting."""
from __future__ import annotations

from .env import (DataCenterEnv, DCParams, DCState, EPISODE_LEN, make_params)


def make_env(dtype=None, **kwargs):
    import jax.numpy as jnp
    params = make_params(dtype=dtype or jnp.float32, **kwargs)
    return DataCenterEnv(), params


__all__ = ["DataCenterEnv", "DCParams", "DCState", "EPISODE_LEN",
           "make_params", "make_env"]
