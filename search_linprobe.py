#!/usr/bin/env python3
"""LR grid search — reference search_linprobe.py equivalent.

Runs the linprobe driver once per blr in the grid, each into
``{output_dir}/trial_{n}/``, and reads "Max Accuracy" back from
training_log.txt (search_linprobe.py:14-51). Uses optuna's GridSampler when
optuna is installed; otherwise falls back to a plain sequential grid with
identical behavior and result files.
"""
import argparse
import dataclasses
import os
import re

from ep_tpu.cli.linprobe import main as linprobe_main
from ep_tpu.configs import config_from_args, get_args_parser

# LARS search space (reference search_linprobe.py:60); override with
# EP_SEARCH_BLRS="0.1,0.5,1.0"
SEARCH_SPACE = {"blr": [0.1, 0.2, 0.5, 0.7, 1.0, 1.2, 1.5]}
if os.environ.get("EP_SEARCH_BLRS"):
    SEARCH_SPACE = {"blr": [float(v) for v in
                            os.environ["EP_SEARCH_BLRS"].split(",")]}


def read_max_accuracy(output_dir: str) -> float:
    log_path = os.path.join(output_dir, "training_log.txt")
    with open(log_path) as f:
        for line in f:
            if "Max Accuracy" in line:
                return float(re.findall(r"[\d.]+", line)[0])
    return 0.0


def run_trial(base_cfg, blr: float, trial_number: int) -> float:
    cfg = dataclasses.replace(
        base_cfg, blr=blr, lr=None,
        output_dir=os.path.join(base_cfg.output_dir, f"trial_{trial_number}"))
    os.makedirs(cfg.output_dir, exist_ok=True)
    linprobe_main(cfg)
    return read_max_accuracy(cfg.output_dir)


def main():
    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    base_cfg = config_from_args(parser.parse_args())

    try:
        import optuna
        from optuna.samplers import GridSampler

        def objective(trial):
            blr = trial.suggest_categorical("blr", SEARCH_SPACE["blr"])
            return run_trial(base_cfg, blr, trial.number)

        study = optuna.create_study(direction="maximize",
                                    sampler=GridSampler(SEARCH_SPACE))
        study.optimize(objective, n_trials=len(SEARCH_SPACE["blr"]))
        print("Best BLR:", study.best_params["blr"])
        print("Best Validation Accuracy:", study.best_value)
    except ImportError:
        print("[search] optuna not installed — sequential grid fallback")
        results = {}
        for n, blr in enumerate(SEARCH_SPACE["blr"]):
            results[blr] = run_trial(base_cfg, blr, n)
            print(f"trial_{n}: blr={blr} max_acc={results[blr]:.2f}")
        best = max(results, key=results.get)
        print("Best BLR:", best)
        print("Best Validation Accuracy:", results[best])


if __name__ == "__main__":
    main()
