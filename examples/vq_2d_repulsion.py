"""2-D clustering demos with codebook repulsion + dead-code reset.

Capability-parity with the two `old/` demo variants:

* default mode — reference old/vqvae_2d_direct_fixed.py ("VQWithRepulsion"):
  EMA-VQ directly on Gaussian clusters with a pairwise repulsive force
  applied every step (min_distance 2.0).
* --improved — reference old/vqvae_2d_improved.py
  ("ImprovedVectorQuantizerEMA"): adds the outward-from-center force,
  a usage EMA, periodic dead-code reset from random input rows
  (reset_interval 30, threshold 1%), and k-means codebook init.

TPU redesign: one jitted step per epoch (repulsion + usage EMA fused into
the step); the periodic reset runs between steps on host state — demo
scale, same mechanics.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vqvae_speech_tpu.models.vq import vector_quantizer_apply
from vqvae_speech_tpu.models.vq_repulsion import (
    codebook_repulsion, usage_ema_update, reset_dead_codes)
from examples.vq_2d_clustering import generate_2d_clusters, visualize


def kmeans_init(data, k, seed=42):
    try:
        from sklearn.cluster import KMeans
        km = KMeans(n_clusters=k, random_state=seed, n_init=10).fit(data)
        return km.cluster_centers_.astype(np.float32)
    except ImportError:  # pragma: no cover - sklearn is in the image
        rng = np.random.default_rng(seed)
        return data[rng.choice(len(data), k, replace=False)]


def train_repulsion_vq(data, n_epochs=200, num_embeddings=8, decay=0.99,
                       improved=False, repulsion_strength=None,
                       min_distance=None, reset_interval=30,
                       reset_threshold=0.01, seed=0):
    """Returns (state, assignments, history).  See module docstring."""
    if repulsion_strength is None:
        # reference defaults: 0.01 (direct_fixed), 0.05 (improved)
        repulsion_strength = 0.05 if improved else 0.01
    if min_distance is None:
        min_distance = 1.5 if improved else 2.0
    outward = repulsion_strength * 0.5 if improved else 0.0

    sequences = jnp.asarray(data.T[None])  # (1, 2, N): one row per point
    flat = jnp.asarray(data)
    key = jax.random.PRNGKey(seed)

    if improved:
        codebook0 = jnp.asarray(kmeans_init(data, num_embeddings))
        cluster0 = jnp.full((num_embeddings,), len(data) / num_embeddings)
    else:
        mean, std = sequences.mean(), sequences.std()
        codebook0 = mean + std * jax.random.normal(key, (num_embeddings, 2))
        cluster0 = jnp.zeros((num_embeddings,))
    state = {"codebook": codebook0, "ema_cluster_size": cluster0,
             "ema_w": codebook0}
    usage = jnp.zeros((num_embeddings,))

    @jax.jit
    def epoch_step(state, usage):
        out = vector_quantizer_apply({}, state, sequences,
                                     commitment_cost=0.25, decay=decay,
                                     training=True, use_pallas=False)
        new_state = dict(out.new_state)
        counts = jnp.sum(out.encodings.reshape(-1, num_embeddings), axis=0)
        usage = usage_ema_update(usage, counts, decay)
        cb = codebook_repulsion(new_state["codebook"], repulsion_strength,
                                min_distance, outward_strength=outward)
        new_state["codebook"] = cb
        # The reference clones raw POSITIONS into ema_w
        # (old/vqvae_2d_direct_fixed.py:109), which fights the
        # ema_w/cluster_size parameterization (next step divides positions
        # by cluster sizes — codes implode/explode; these demos live in
        # old/ for a reason).  We keep the displacement consistent with the
        # parameterization instead: ema_w = position * cluster_size, so the
        # repulsed position survives the next EMA update.
        new_state["ema_w"] = cb * new_state["ema_cluster_size"][:, None]
        return new_state, usage, (out.vq_loss, out.perplexity)

    history = []
    resets = 0
    for epoch in range(n_epochs):
        state, usage, (loss, perp) = epoch_step(state, usage)
        if improved and (epoch + 1) % reset_interval == 0:
            key, sub = jax.random.split(key)
            r = reset_dead_codes(sub, state["codebook"], state["ema_w"],
                                 state["ema_cluster_size"], usage, flat,
                                 threshold=reset_threshold)
            state = {"codebook": r.codebook, "ema_w": r.ema_w,
                     "ema_cluster_size": r.cluster_size}
            usage = r.usage
            resets += int(r.num_reset)
        history.append({"epoch": epoch, "loss": float(loss),
                        "perplexity": float(perp),
                        "codebook": np.asarray(state["codebook"])})
    out = vector_quantizer_apply({}, state, sequences, commitment_cost=0.25,
                                 decay=decay, training=False,
                                 use_pallas=False)
    assignments = np.asarray(out.indices[:, 0])
    return state, assignments, history, resets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--improved", action="store_true",
                    help="outward force + dead-code reset + k-means init "
                         "(old/vqvae_2d_improved.py)")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    name = "vq_2d_improved.png" if args.improved else "vq_2d_repulsion.png"
    output = args.output or name

    data, labels = generate_2d_clusters()
    state, assignments, history, resets = train_repulsion_vq(
        data, improved=args.improved)
    visualize(data, labels, state, assignments, history, output)
    active = int((np.bincount(assignments, minlength=8) > 0).sum())
    print(f"final loss {history[-1]['loss']:.4f} "
          f"perplexity {history[-1]['perplexity']:.2f} "
          f"active {active}/8 resets {resets} -> {output}")


if __name__ == "__main__":
    main()
