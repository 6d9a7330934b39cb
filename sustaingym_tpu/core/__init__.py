from .env import (FunctionalEnv, TimeStep, autoreset_step,
                  autoreset_vstep)
from .rollout import (batch_reset, batch_rollout, episode_return, random_policy,
                      rollout)
from .spaces import Box, Discrete, DictSpace, MultiDiscrete, Space, flatdim, flatten
from .struct import PyTreeNode, dataclass, field, static_field, tree_select

__all__ = [
    "FunctionalEnv", "TimeStep", "autoreset_step", "autoreset_vstep",
    "rollout", "batch_rollout", "batch_reset", "episode_return", "random_policy",
    "Space", "Box", "Discrete", "MultiDiscrete", "DictSpace", "flatdim", "flatten",
    "PyTreeNode", "dataclass", "field", "static_field", "tree_select",
]
