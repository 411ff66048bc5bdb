#!/usr/bin/env python3
"""Plot max accuracy vs base LR across LR-search trials.

Port of the reference's util/plot_lr_search.py:7-77 — walks
{parent}/trial_*/training_log.txt, extracts (Base learning rate, Max
Accuracy) pairs and renders max_accuracy_vs_blr.png."""
import argparse
import os
import re
from collections import defaultdict


def parse_training_logs(parent_dir):
    blr_to_max_acc = defaultdict(list)
    for trial in os.listdir(parent_dir):
        path = os.path.join(parent_dir, trial, "training_log.txt")
        if not os.path.exists(path):
            continue
        blr = max_acc = None
        with open(path) as f:
            for line in f:
                if "Base learning rate:" in line:
                    blr = float(line.split(":")[1].strip())
                if "Max Accuracy:" in line:
                    max_acc = float(re.findall(r"[\d.]+", line)[0])
        if blr is not None and max_acc is not None:
            blr_to_max_acc[blr].append(max_acc)
    return blr_to_max_acc


def plot_results(blr_to_max_acc, save_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    avg = {b: sum(a) / len(a) for b, a in blr_to_max_acc.items()}
    xs = sorted(avg)
    ys = [avg[b] for b in xs]
    plt.figure(figsize=(8, 6))
    plt.plot(xs, ys, marker="o", linestyle="-")
    plt.xlabel("Base Learning Rate")
    plt.ylabel("Max Accuracy (%)")
    plt.title("Max Accuracy vs Base Learning Rate")
    plt.grid(True)
    plt.xscale("log")
    plt.savefig(save_path, dpi=300, bbox_inches="tight")
    print(f"Plot saved to {save_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parent_folder", type=str, required=True)
    args = ap.parse_args()
    data = parse_training_logs(args.parent_folder)
    plot_results(data, os.path.join(args.parent_folder,
                                    "max_accuracy_vs_blr.png"))


if __name__ == "__main__":
    main()
