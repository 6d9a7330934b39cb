"""Batch-evaluates baseline controllers and writes per-run CSVs.

The reference's examples/evcharging/run_baselines.py:91-142 fans a
ProcessPool (<=12 workers) over (site, period, baseline) combinations; here
each run is a single program (the imperative runner, or the jitted
``algorithms.base.batch_run`` for policies expressible on-device), so no
process pool is needed.

Outputs results/<site>/<period>/<algorithm>.csv with columns
[seed, return, <info columns>], consumable by
``sustaingym_tpu.envs.evcharging.plot_utils``.

Examples:
    python examples/run_baselines.py --env evcharging --site caltech \
        --period "Summer 2021" --algorithms greedy random --num-seeds 14
    python examples/run_baselines.py --env building --algorithms mpc random
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ev_algorithms(names, site, period, project_action=True):
    from sustaingym_tpu.compat.gym import EVChargingGymEnv
    from sustaingym_tpu.algorithms.evcharging import (GreedyAlgorithm, MPC,
                                                      OfflineOptimal,
                                                      RandomAlgorithm)
    env = EVChargingGymEnv(site=site, date_period=period,
                           project_action=project_action)
    table = {
        "greedy": lambda: GreedyAlgorithm(env),
        "random": lambda: RandomAlgorithm(env),
        "offline_optimal": lambda: OfflineOptimal(env),
    }
    for name in names:
        if name.startswith("mpc"):
            lookahead = int(name[3:]) if len(name) > 3 else 12
            yield f"mpc{lookahead}", MPC(env, lookahead=lookahead)
        else:
            yield name, table[name]()


def building_algorithms(names, building, weather, location):
    from sustaingym_tpu.compat.gym import BuildingGymEnv
    from sustaingym_tpu.algorithms.base import RandomAlgorithm
    from sustaingym_tpu.algorithms.building import MPCAgent
    env = BuildingGymEnv(building=building, weather=weather,
                         location=location)
    table = {
        "random": lambda: RandomAlgorithm(env),
        "mpc": lambda: MPCAgent(env),
    }
    for name in names:
        yield name, table[name]()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--env", default="evcharging",
                        choices=["evcharging", "building"])
    parser.add_argument("--site", default="caltech")
    parser.add_argument("--period", default="Summer 2021")
    parser.add_argument("--building", default="OfficeSmall")
    parser.add_argument("--weather", default="Hot_Dry")
    parser.add_argument("--location", default="Tucson")
    parser.add_argument("--algorithms", nargs="+",
                        default=["greedy", "random"])
    parser.add_argument("--num-seeds", type=int, default=14,
                        help="seeds 0..n-1 map to distinct episode days")
    parser.add_argument("--results-dir", default="results")
    args = parser.parse_args(argv)

    if args.env == "evcharging":
        runs = ev_algorithms(args.algorithms, args.site, args.period)
        subdir = os.path.join(args.results_dir, args.site,
                              args.period.replace(" ", "_").lower())
    else:
        runs = building_algorithms(args.algorithms, args.building,
                                   args.weather, args.location)
        subdir = os.path.join(args.results_dir, args.building,
                              args.weather.lower())

    os.makedirs(subdir, exist_ok=True)
    for name, algo in runs:
        df = algo.run(args.num_seeds)
        out = os.path.join(subdir, f"{name}.csv")
        df.to_csv(out, index=False)
        print(f"{name}: mean return {df['return'].mean():.3f} "
              f"(+-{df['return'].std():.3f}) -> {out}")


if __name__ == "__main__":
    main()
