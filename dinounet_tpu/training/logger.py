"""Per-epoch metric logger with progress.png plotting.

Capability parity with ref: dinounet/training/logging/nnunet_logger.py:9-103:
fixed-key per-epoch series (train/val losses, per-class pseudo-Dice, EMA dice
with beta=0.9, learning rates, epoch timestamps), checkpointable state, and a
3-panel progress.png.
"""

import os
from typing import Optional

import numpy as np


class nnUNetLogger:
    def __init__(self, verbose: bool = False):
        self.my_fantastic_logging = {
            "mean_fg_dice": [],
            "ema_fg_dice": [],
            "dice_per_class_or_region": [],
            "train_losses": [],
            "val_losses": [],
            "lrs": [],
            "epoch_start_timestamps": [],
            "epoch_end_timestamps": [],
        }
        self.verbose = verbose

    def log(self, key, value, epoch: int):
        assert key in self.my_fantastic_logging, f"unknown logging key {key}"
        series = self.my_fantastic_logging[key]
        if key == "mean_fg_dice":
            new_ema = (
                self.my_fantastic_logging["ema_fg_dice"][epoch - 1] * 0.9 + 0.1 * value
                if len(self.my_fantastic_logging["ema_fg_dice"]) > 0 else value
            )
            self.log("ema_fg_dice", new_ema, epoch)
        if len(series) < epoch + 1:
            series.append(value)
        else:
            series[epoch] = value

    def plot_progress_png(self, output_folder: str):
        import matplotlib

        matplotlib.use("agg")
        import matplotlib.pyplot as plt

        log = self.my_fantastic_logging
        epoch = min(len(log["train_losses"]), len(log["val_losses"])) - 1
        if epoch < 0:
            return
        xs = list(range(epoch + 1))
        fig, axes = plt.subplots(3, 1, figsize=(10, 12), sharex=True)

        ax = axes[0]
        ax.plot(xs, log["train_losses"][: epoch + 1], ls="-", label="loss_tr")
        ax.plot(xs, log["val_losses"][: epoch + 1], ls="-", label="loss_val")
        ax2 = ax.twinx()
        ax2.plot(xs, log["mean_fg_dice"][: epoch + 1], ls="dotted", label="pseudo dice")
        ax2.plot(xs, log["ema_fg_dice"][: epoch + 1], ls="-", label="pseudo dice (mov. avg.)")
        ax.set_ylabel("loss")
        ax2.set_ylabel("pseudo dice")
        ax.legend(loc=(0, 1))
        ax2.legend(loc=(0.4, 1))

        ax = axes[1]
        times = [
            e - s for s, e in zip(
                log["epoch_start_timestamps"][: epoch + 1],
                log["epoch_end_timestamps"][: epoch + 1],
            )
        ]
        ax.plot(xs, times, ls="-", label="epoch duration")
        ax.set_ylabel("time [s]")
        ax.legend(loc=(0, 1))

        ax = axes[2]
        ax.plot(xs, log["lrs"][: epoch + 1], ls="-", label="learning rate")
        ax.set_xlabel("epoch")
        ax.set_ylabel("learning rate")
        ax.legend(loc=(0, 1))

        plt.tight_layout()
        fig.savefig(os.path.join(output_folder, "progress.png"))
        plt.close(fig)

    def get_checkpoint(self) -> dict:
        return self.my_fantastic_logging

    def load_checkpoint(self, checkpoint: dict):
        self.my_fantastic_logging = checkpoint
