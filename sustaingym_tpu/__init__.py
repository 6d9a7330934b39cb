"""SustainGym-TPU: a TPU-native vectorized engine for the SustainGym suite.

A from-scratch rebuild of chrisyeh96/sustaingym (reference snapshot at
/root/reference) as pure, jittable JAX environments that vmap to thousands of
instances per chip and shard across TPU pod slices. See SURVEY.md for the
layer map and design rules.

Quick start::

    import jax
    from sustaingym_tpu import make

    env, params = make("building")
    state, ts = env.reset(params, jax.random.PRNGKey(0))
    action = env.action_space(params).sample(jax.random.PRNGKey(1))
    state, ts = env.step(params, state, action, jax.random.PRNGKey(2))
"""
from __future__ import annotations

from typing import Any

__version__ = "0.1.0"

_REGISTRY: dict[str, Any] = {}


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first compiles on the tunneled TPU
    take 30-300 s; cached reloads take milliseconds."""
    import os
    cache_dir = os.environ.get(
        "SUSTAINGYM_XLA_CACHE",
        os.path.expanduser("~/.cache/sustaingym_tpu_xla"))
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - best effort
        pass


_enable_compilation_cache()


def register(name: str, factory) -> None:
    """Registers an env factory. ``factory(**kwargs) -> (env, params)``."""
    _REGISTRY[name] = factory


def make(name: str, **kwargs):
    """Creates (env, params) for a registered environment.

    Registered names (mirroring /root/reference/sustaingym/__init__.py:3-29
    plus the two doc-spec envs):
      'building', 'cogen', 'evcharging', 'electricitymarket', 'datacenter'
    """
    if not _REGISTRY:
        _populate_registry()
    if name not in _REGISTRY:
        raise KeyError(f"unknown env {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def _populate_registry() -> None:
    import importlib

    for name in ("building", "cogen", "evcharging", "electricitymarket",
                 "datacenter"):
        try:
            mod = importlib.import_module(f".envs.{name}", __name__)
        except ImportError:
            continue
        if hasattr(mod, "make_env"):
            register(name, mod.make_env)

    try:
        from .envs import multiagent as ma
    except ImportError:
        return

    def _ma_ev(**kw):
        return ma.MultiAgentEVChargingEnv(), ma.make_ma_ev_params(**kw)

    def _ma_building(**kw):
        from .envs.building import make_env
        _, params = make_env(**kw)
        return ma.MultiAgentBuildingEnv(), params

    def _ma_cogen(**kw):
        from .envs.cogen import make_env
        _, params = make_env(**kw)
        return ma.MultiAgentCogenEnv(), params

    register("evcharging-multiagent", _ma_ev)
    register("building-multiagent", _ma_building)
    register("cogen-multiagent", _ma_cogen)
