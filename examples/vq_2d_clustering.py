"""2-D synthetic clustering demo: VQ-EMA directly on Gaussian clusters.

Capability-parity with reference vqvae_2d_direct_clustering.py: generate
points from ring-arranged Gaussian clusters, train the EMA quantizer with no
encoder/decoder (codebook initialized around the data statistics), and plot
assignments + codebook trajectory.  The training loop here is one jitted
scan-free step per epoch (the whole dataset is one batch on device).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vqvae_speech_tpu.models.vq import vector_quantizer_apply


def generate_2d_clusters(n_points=500, n_clusters=5, noise=0.3, seed=42):
    rng = np.random.default_rng(seed)
    angles = np.linspace(0, 2 * np.pi, n_clusters, endpoint=False)
    centers = np.stack([np.cos(angles) * 3, np.sin(angles) * 3], axis=1)
    per = n_points // n_clusters
    data, labels = [], []
    for i, c in enumerate(centers):
        data.append(rng.standard_normal((per, 2)) * noise + c)
        labels.extend([i] * per)
    data, labels = np.vstack(data), np.array(labels)
    order = rng.permutation(len(data))
    return data[order].astype(np.float32), labels[order]


def train_direct_vq(data, n_epochs=100, num_embeddings=8, decay=0.99,
                    seed=0):
    """Cluster (N, 2) points with the EMA quantizer (no encoder/decoder).

    Feeding the points as (1, 2, N) — coordinate axis as "time" — makes the
    quantizer's (C,T,B)-order flatten (ops/vq.py:reference_flatten) produce
    exactly one row per 2-D point, so assignments are per-point.
    """
    sequences = jnp.asarray(data.T[None])  # (1, 2, N)

    key = jax.random.PRNGKey(seed)
    mean = sequences.mean()
    std = sequences.std()
    codebook0 = mean + std * jax.random.normal(key, (num_embeddings, 2))
    state = {
        "codebook": codebook0,
        "ema_cluster_size": jnp.zeros((num_embeddings,)),
        "ema_w": codebook0,
    }

    @jax.jit
    def epoch_step(state):
        out = vector_quantizer_apply({}, state, sequences,
                                     commitment_cost=0.25, decay=decay,
                                     training=True, use_pallas=False)
        return out.new_state, (out.vq_loss, out.perplexity)

    history = []
    for epoch in range(n_epochs):
        state, (loss, perp) = epoch_step(state)
        history.append({"epoch": epoch, "loss": float(loss),
                        "perplexity": float(perp),
                        "codebook": np.asarray(state["codebook"])})
    out = vector_quantizer_apply({}, state, sequences, commitment_cost=0.25,
                                 decay=decay, training=False,
                                 use_pallas=False)
    assignments = np.asarray(out.indices[:, 0])
    return state, assignments, history


def visualize(data, labels, state, assignments, history, output_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    codebook = np.asarray(state["codebook"])
    fig, axs = plt.subplots(2, 2, figsize=(14, 12))
    axs[0, 0].scatter(data[:, 0], data[:, 1], c=labels, s=8, cmap="tab10")
    axs[0, 0].set_title("groundtruth clusters")
    n = len(assignments)
    axs[0, 1].scatter(data[:n, 0], data[:n, 1], c=assignments, s=8,
                      cmap="tab10")
    axs[0, 1].scatter(codebook[:, 0], codebook[:, 1], c="k", marker="x",
                      s=120)
    axs[0, 1].set_title("VQ-EMA assignments + codebook")
    axs[1, 0].plot([h["loss"] for h in history])
    axs[1, 0].set_title("vq loss")
    axs[1, 0].set_yscale("log")
    axs[1, 1].plot([h["perplexity"] for h in history])
    axs[1, 1].set_title("perplexity")
    fig.savefig(output_path, bbox_inches="tight")
    plt.close(fig)
    return output_path


def main(output_path="vq_2d_clustering.png"):
    data, labels = generate_2d_clusters()
    state, assignments, history = train_direct_vq(data)
    visualize(data, labels, state, assignments, history, output_path)
    print(f"final loss {history[-1]['loss']:.4f} "
          f"perplexity {history[-1]['perplexity']:.2f} -> {output_path}")


if __name__ == "__main__":
    main()
