"""Host-edge compatibility layer: Gymnasium + PettingZoo APIs.

Importing this module registers the suite's Gymnasium IDs (mirroring
/root/reference/sustaingym/__init__.py:3-29, plus the two envs the
reference left unimplemented):

    sustaingym/Building-v0
    sustaingym/Cogen-v0
    sustaingym/EVCharging-v0
    sustaingym/ElectricityMarket-v0
    sustaingym/DataCenter-v0
"""
from __future__ import annotations

from .gym import (BuildingGymEnv, CogenGymEnv, DataCenterGymEnv,
                  DiscreteActionWrapper, ElectricityMarketGymEnv,
                  EVChargingGymEnv, FunctionalGymEnv,
                  FunctionalVectorGymEnv, make_vec, to_gym_space)
from .pettingzoo import (MultiAgentBuildingParallelEnv,
                         MultiAgentCogenParallelEnv,
                         MultiAgentEVChargingParallelEnv)


def _register() -> None:
    from gymnasium.envs.registration import register, registry
    specs = {
        "sustaingym/Building-v0": "sustaingym_tpu.compat.gym:BuildingGymEnv",
        "sustaingym/Cogen-v0": "sustaingym_tpu.compat.gym:CogenGymEnv",
        "sustaingym/EVCharging-v0": "sustaingym_tpu.compat.gym:EVChargingGymEnv",
        "sustaingym/ElectricityMarket-v0":
            "sustaingym_tpu.compat.gym:ElectricityMarketGymEnv",
        "sustaingym/DataCenter-v0": "sustaingym_tpu.compat.gym:DataCenterGymEnv",
    }
    for env_id, entry in specs.items():
        # claim the ID even if another distribution (e.g. the reference
        # package in a side-by-side install) registered it first
        registry.pop(env_id, None)
        register(id=env_id, entry_point=entry, nondeterministic=False)


_register()

__all__ = [
    "FunctionalGymEnv", "BuildingGymEnv", "CogenGymEnv", "EVChargingGymEnv",
    "ElectricityMarketGymEnv", "DataCenterGymEnv", "DiscreteActionWrapper",
    "FunctionalVectorGymEnv", "make_vec", "to_gym_space",
    "MultiAgentBuildingParallelEnv", "MultiAgentCogenParallelEnv",
    "MultiAgentEVChargingParallelEnv",
]
