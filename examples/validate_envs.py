"""Environment validation sweep — the script analogue of the reference's
env-validation notebook (examples/evcharging/env_validation.ipynb, outputs
cleared in its snapshot).

For every registered env: roll a batch of random-policy episodes, check
finiteness/termination structure, print reward statistics, and (with
--plots) write per-env reward histograms + an episode trace to PNG.

    python examples/validate_envs.py            # stats only
    python examples/validate_envs.py --plots --out-dir validation/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPISODE_LEN = {"building": 288, "cogen": 96, "evcharging": 288,
               "electricitymarket": 288, "datacenter": 672}


def validate(name: str, batch: int, plots: bool, out_dir: str) -> dict:
    import jax
    import numpy as np

    from sustaingym_tpu import make
    from sustaingym_tpu.core import batch_rollout, random_policy

    env, params = make(name)
    steps = EPISODE_LEN[name]
    traj = batch_rollout(env, params, random_policy(env, params, batch),
                         None, jax.random.PRNGKey(0), batch, steps)
    rewards = np.asarray(traj.reward)           # (steps, batch)
    terms = np.asarray(traj.terminated)
    returns = rewards.sum(axis=0)

    assert np.all(np.isfinite(rewards)), f"{name}: non-finite rewards"
    assert terms[-1].all(), f"{name}: episodes must terminate at step {steps}"
    assert not terms[:-1].any(), f"{name}: early termination"

    stats = {
        "env": name,
        "episodes": batch,
        "return_mean": float(returns.mean()),
        "return_std": float(returns.std()),
        "reward_min": float(rewards.min()),
        "reward_max": float(rewards.max()),
    }
    if plots:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.2))
        ax1.hist(returns, bins=30)
        ax1.set_title(f"{name}: episode returns (n={batch})")
        ax2.plot(rewards[:, :8])
        ax2.set_title("per-step rewards (8 episodes)")
        fig.tight_layout()
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{name}.png")
        fig.savefig(path, dpi=110)
        plt.close(fig)
        stats["plot"] = path
    return stats


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--envs", nargs="+", default=sorted(EPISODE_LEN))
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--plots", action="store_true")
    parser.add_argument("--out-dir", default="validation")
    args = parser.parse_args(argv)

    for name in args.envs:
        stats = validate(name, args.batch, args.plots, args.out_dir)
        print(" ".join(f"{k}={v}" for k, v in stats.items()))


if __name__ == "__main__":
    main()
