"""Balanced VQ-EMA: usage-tracked codebook with dead-code revival.

Capability-parity with the reference's standalone BalancedVQVAE demo
(reference vqvae_balanced.py:11-102): standard last-dim flatten (NOT the
composite model's (C,T,B) quirk), EMA codebook updates, per-code usage
counts, and re-initialization of under-used codes near high-usage codes.

TPU re-design: the reference revives dead codes with Python loops over
index tensors (vqvae_balanced.py:75-91); here the revival is one vectorized
masked update — every dead code draws a donor uniformly from the top-k
high-usage codes and perturbs it with N(0, 0.5) noise.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp


class BalancedVQOutput(NamedTuple):
    vq_loss: jax.Array
    quantized: jax.Array
    perplexity: jax.Array
    encodings: jax.Array
    indices: jax.Array
    new_state: dict


def balanced_vq_init(key, num_embeddings: int, embedding_dim: int,
                     dtype=jnp.float32):
    bound = 1.0 / num_embeddings
    return {
        "codebook": jax.random.uniform(
            key, (num_embeddings, embedding_dim), dtype, -bound, bound),
        "ema_cluster_size": jnp.zeros((num_embeddings,), dtype),
        "ema_w": jnp.zeros((num_embeddings, embedding_dim), dtype),
        "usage_count": jnp.zeros((num_embeddings,), dtype),
    }


def balanced_vq_apply(state: dict, inputs, *, commitment_cost: float = 0.25,
                      decay: float = 0.99, epsilon: float = 1e-5,
                      training: bool = True, revival_key=None,
                      usage_threshold_frac: float = 0.1,
                      min_total_usage: float = 100.0,
                      revival_noise: float = 0.5):
    """inputs: (..., D).  Returns BalancedVQOutput with updated state."""
    codebook = state["codebook"]
    K, D = codebook.shape
    shape = inputs.shape
    flat = inputs.reshape(-1, D)

    d = (jnp.sum(jnp.square(flat), axis=1, keepdims=True)
         + jnp.sum(jnp.square(codebook), axis=1)
         - 2.0 * flat @ codebook.T)
    idx = jnp.argmin(d, axis=1)
    onehot = jax.nn.one_hot(idx, K, dtype=flat.dtype)
    quantized = (onehot @ codebook).reshape(shape)

    e_latent = jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - inputs))
    q_latent = jnp.mean(jnp.square(quantized - jax.lax.stop_gradient(inputs)))
    vq_loss = q_latent + commitment_cost * e_latent

    new_state = state
    if training:
        usage = state["usage_count"] + jnp.sum(onehot, axis=0)
        cluster = (decay * state["ema_cluster_size"]
                   + (1 - decay) * jnp.sum(onehot, axis=0))
        dw = onehot.T @ flat
        ema_w = decay * state["ema_w"] + (1 - decay) * dw
        n = jnp.sum(cluster)
        cluster = (cluster + epsilon) / (n + K * epsilon) * n
        codebook = ema_w / cluster[:, None]

        if revival_key is not None:
            # vectorized dead-code revival (reference lines 75-91)
            threshold = jnp.mean(usage) * usage_threshold_frac
            dead = (usage < threshold) & (jnp.sum(usage) > min_total_usage)
            k_top = min(3, K // 2)
            _, donors = jax.lax.top_k(usage, k_top)
            k_pick, k_noise = jax.random.split(revival_key)
            pick = donors[jax.random.randint(k_pick, (K,), 0, k_top)]
            revived = (codebook[pick]
                       + revival_noise * jax.random.normal(
                           k_noise, (K, D), codebook.dtype))
            codebook = jnp.where(dead[:, None], revived, codebook)
            cluster = jnp.where(dead, cluster[pick] / 2.0, cluster)
            ema_w = jnp.where(dead[:, None], codebook * cluster[:, None],
                              ema_w)
            usage = jnp.where(dead, usage[pick] / 2.0, usage)

        new_state = {
            "codebook": codebook,
            "ema_cluster_size": cluster,
            "ema_w": ema_w,
            "usage_count": usage,
        }

    quantized_st = inputs + jax.lax.stop_gradient(quantized - inputs)
    avg = jnp.mean(onehot, axis=0)
    perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
    return BalancedVQOutput(vq_loss, quantized_st, perplexity, onehot, idx,
                            new_state)
