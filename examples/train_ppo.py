"""Thin wrapper over the training CLI — the analogue of the reference's
examples/evcharging/train_rllib.py / train_stable_baselines.py entry points
(the RLLib/SB3 roles are played by the fused SPMD PPO learner).

    python examples/train_ppo.py --env building --iterations 100 \
        --num-envs 1024 --log-dir runs/building
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sustaingym_tpu.train import main

if __name__ == "__main__":
    main()
