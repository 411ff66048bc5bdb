#!/usr/bin/env python3
"""Plot validation accuracy per epoch from training_log.txt.

Port of the reference's util/plot_lr.py:6-67 — same log-line regex, same
output file (val_accuracy_plot.png), so logs from either framework plot."""
import argparse
import os
import re


def parse_training_log(training_log_path):
    epochs, val_acc1 = [], []
    with open(training_log_path) as f:
        for line in f:
            m = re.match(r"(\d+), [\d.]+, [\d.]+, [\d.]+, ([\d.]+), [\d.]+",
                         line)
            if m:
                epochs.append(int(m.group(1)))
                val_acc1.append(float(m.group(2)))
    return epochs, val_acc1


def plot_validation_accuracy(epochs, val_acc1, save_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.figure(figsize=(8, 6))
    plt.plot(epochs, val_acc1, marker="o", linestyle="-",
             label="Validation Accuracy")
    plt.xlabel("Epochs")
    plt.ylabel("Validation Accuracy (%)")
    plt.title("Validation Accuracy Over Epochs")
    plt.grid(True)
    plt.legend()
    plt.savefig(save_path, dpi=300, bbox_inches="tight")
    print(f"Plot saved to {save_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", type=str, required=True)
    args = ap.parse_args()
    path = os.path.join(args.folder, "training_log.txt")
    if not os.path.exists(path):
        print(f"Error: {path} does not exist!")
        return
    epochs, acc = parse_training_log(path)
    if not epochs:
        print("No epoch validation accuracy data found!")
        return
    plot_validation_accuracy(epochs, acc,
                             os.path.join(args.folder,
                                          "val_accuracy_plot.png"))


if __name__ == "__main__":
    main()
