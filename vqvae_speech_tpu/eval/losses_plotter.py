"""Loss/perplexity curves from merged per-epoch checkpoints.

Capability-parity with reference src/evaluation/losses_plotter.py:37-305:
per-experiment loss+perplexity figures (savgol-smoothed, log-y), merged
figures across experiments, and per-loss-type figures.
"""
import os

import numpy as np
from scipy.signal import savgol_filter

from vqvae_speech_tpu.train.checkpoint import merge_checkpoint_losses
from vqvae_speech_tpu.utils.logger import ConsoleLogger


def _smooth(values, window: int = 9, order: int = 3):
    values = np.asarray(values, np.float64)
    if len(values) < window:
        return values
    return savgol_filter(values, window, order)


def _loss_series(losses):
    """list of per-step loss dicts -> {loss_name: np.array}."""
    if not losses:
        return {}
    keys = losses[0].keys()
    return {k: np.asarray([step[k] for step in losses]) for k in keys}


def plot_experiment_losses(experiment_name: str, experiments_path: str,
                           output_path: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    losses, perplexities = merge_checkpoint_losses(
        experiments_path, experiment_name)
    if not losses:
        ConsoleLogger.warn(f"No checkpoints found for '{experiment_name}'")
        return None
    series = _loss_series(losses)

    fig, axs = plt.subplots(2, 1, figsize=(12, 8), sharex=True)
    for name, values in series.items():
        axs[0].plot(_smooth(values), label=name)
    axs[0].set_yscale("log")
    axs[0].set_ylabel("loss")
    axs[0].legend(fontsize=7)
    axs[1].plot(_smooth(perplexities), color="tab:orange")
    axs[1].set_ylabel("perplexity")
    axs[1].set_xlabel("step")
    out = os.path.join(output_path,
                       f"{experiment_name}_losses-and-perplexities.png")
    os.makedirs(output_path, exist_ok=True)
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_merged_losses(experiment_names, experiments_path: str,
                       output_path: str, loss_key: str = "loss"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 6))
    for name in experiment_names:
        losses, _ = merge_checkpoint_losses(experiments_path, name)
        if not losses:
            continue
        series = _loss_series(losses)
        if loss_key in series:
            ax.plot(_smooth(series[loss_key]), label=name)
    ax.set_yscale("log")
    ax.set_ylabel(loss_key)
    ax.set_xlabel("step")
    ax.legend()
    os.makedirs(output_path, exist_ok=True)
    out = os.path.join(output_path, f"merged_{loss_key}.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_training_losses(experiments, experiments_path: str):
    """Entry point for the --plot_experiments_losses CLI mode."""
    names = [e.name for e in experiments]
    results_path = experiments[0].results_path if experiments else "results"
    for name in names:
        plot_experiment_losses(name, experiments_path, results_path)
    plot_merged_losses(names, experiments_path, results_path)
