from .ddpg import DDPGConfig, make_ddpg_train_step, train_ddpg
from .distributed import (host_env_keys, host_fold, init_distributed,
                          is_distributed, process_local_batch)
from .mesh import data_sharding, make_mesh, model_sharding, replicated
from .dqn import DQNConfig, make_dqn_train_step, train_dqn
from .ppo import (PPOConfig, init_policy, make_train_step, policy_apply,
                  train)
from .sac import SACConfig, make_sac_train_step, train_sac

__all__ = [
    "make_mesh", "data_sharding", "model_sharding", "replicated",
    "PPOConfig", "init_policy", "policy_apply", "make_train_step", "train",
    "SACConfig", "make_sac_train_step", "train_sac",
    "DQNConfig", "make_dqn_train_step", "train_dqn",
    "DDPGConfig", "make_ddpg_train_step", "train_ddpg",
    "init_distributed", "is_distributed", "host_fold", "host_env_keys",
    "process_local_batch",
]
