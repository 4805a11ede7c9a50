"""Balanced VQ-EMA demo: many clusters, dead-code revival.

Capability-parity with reference vqvae_balanced.py:302-360 (40 clusters,
2000 points): trains the usage-tracked balanced quantizer and plots
assignments, codebook coverage, and code-usage distribution.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vqvae_speech_tpu.models.vq_balanced import balanced_vq_init, balanced_vq_apply
from examples.vq_2d_clustering import generate_2d_clusters


def train_balanced(data, n_codes=40, n_epochs=300, seed=0):
    key = jax.random.PRNGKey(seed)
    state = balanced_vq_init(key, n_codes, 2)
    # start the codebook around the data statistics
    mean, std = data.mean(0), data.std(0)
    state["codebook"] = jnp.asarray(
        mean + std * np.random.default_rng(seed).standard_normal((n_codes, 2))
    ).astype(jnp.float32)
    points = jnp.asarray(data)

    @jax.jit
    def epoch_step(state, key):
        out = balanced_vq_apply(state, points, training=True,
                                revival_key=key)
        return out.new_state, (out.vq_loss, out.perplexity)

    history = []
    for epoch in range(n_epochs):
        key, sub = jax.random.split(key)
        state, (loss, perp) = epoch_step(state, sub)
        history.append({"loss": float(loss), "perplexity": float(perp)})
    out = balanced_vq_apply(state, points, training=False)
    return state, np.asarray(out.indices), history


def main(output_path="vq_balanced_2d.png"):
    data, labels = generate_2d_clusters(n_points=2000, n_clusters=40,
                                        noise=0.25)
    state, assignments, history = train_balanced(data)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    codebook = np.asarray(state["codebook"])
    usage = np.asarray(state["usage_count"])
    fig, axs = plt.subplots(2, 2, figsize=(14, 12))
    axs[0, 0].scatter(data[:, 0], data[:, 1], c=labels, s=6, cmap="hsv")
    axs[0, 0].set_title("groundtruth (40 clusters)")
    axs[0, 1].scatter(data[:, 0], data[:, 1], c=assignments, s=6, cmap="hsv")
    axs[0, 1].scatter(codebook[:, 0], codebook[:, 1], c="k", marker="x", s=80)
    axs[0, 1].set_title("balanced VQ assignments + codebook")
    axs[1, 0].plot([h["perplexity"] for h in history])
    axs[1, 0].set_title("perplexity (codebook coverage)")
    axs[1, 1].bar(np.arange(len(usage)), np.sort(usage)[::-1])
    axs[1, 1].set_title("code usage distribution")
    fig.savefig(output_path, bbox_inches="tight")
    plt.close(fig)
    print(f"final perplexity {history[-1]['perplexity']:.1f} -> {output_path}")


if __name__ == "__main__":
    main()
