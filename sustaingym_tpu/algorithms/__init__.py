from .base import BaseAlgorithm, RandomAlgorithm, batch_run
from .building import MPCAgent, mpc_action
from .evcharging import (GreedyAlgorithm, MPC, OfflineOptimal,
                         offline_optimal_schedule)
from .evcharging import RandomAlgorithm as EVRandomAlgorithm

__all__ = [
    "BaseAlgorithm", "RandomAlgorithm", "batch_run",
    "GreedyAlgorithm", "EVRandomAlgorithm", "MPC", "OfflineOptimal",
    "offline_optimal_schedule", "MPCAgent", "mpc_action",
]
