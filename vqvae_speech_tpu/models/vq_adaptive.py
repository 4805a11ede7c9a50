"""Adaptive VQ-EMA: automatic codebook sizing via usage pruning + merging.

Capability-parity with the reference's adaptive demo family
(reference old/vqvae_adaptive.py:16-259 and its *_fixed/_optimized/_smart
iterations; the repo-root result images adaptive_vqvae_*.png come from it):

* an active-code mask over a fixed K_max codebook,
* EMA usage tracking; codes under ``min_usage_threshold`` of total usage are
  pruned every ``prune_interval`` steps,
* active code pairs closer than ``merge_distance_threshold`` are merged into
  the higher-usage member (usage-weighted average),
* stability = active count unchanged for ``stable_epochs_required`` steps.

TPU re-design: shapes stay STATIC (the torch demo reindexes tensors by the
active set every forward — a dynamic-shape pattern XLA can't compile);
inactive codes are masked out of the argmin with +inf distances, and
prune/merge is one vectorized masked update (the reference's O(K^2) Python
pair loop, lines 177-206, becomes a matrix computation).
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdaptiveVQOutput(NamedTuple):
    vq_loss: jax.Array
    quantized: jax.Array
    perplexity: jax.Array
    indices: jax.Array
    new_state: dict


def adaptive_vq_init(key, max_embeddings: int, embedding_dim: int,
                     initial_num_embeddings: int = None, dtype=jnp.float32):
    """All K_max slots allocated; only the first ``initial_num_embeddings``
    start active (default-20 policy, reference line 37)."""
    n0 = initial_num_embeddings or min(20, max_embeddings)
    return {
        "codebook": jax.random.normal(key, (max_embeddings, embedding_dim),
                                      dtype),
        "ema_cluster_size": jnp.zeros((max_embeddings,), dtype),
        "ema_w": jax.random.normal(key, (max_embeddings, embedding_dim),
                                   dtype),
        "ema_usage": jnp.zeros((max_embeddings,), dtype),
        "active": jnp.arange(max_embeddings) < n0,
        "stable_steps": jnp.zeros((), jnp.int32),
        "last_active_count": jnp.asarray(n0, jnp.int32),
    }


def suggest_initial_codes(data_size: int, max_embeddings: int = 30) -> int:
    """sqrt-of-data-size heuristic (reference lines 244-259)."""
    import math

    return min(max_embeddings, max(5, int(math.sqrt(data_size))))


def adaptive_vq_apply(state: dict, inputs, *, commitment_cost: float = 0.25,
                      decay: float = 0.99, epsilon: float = 1e-5,
                      training: bool = True):
    """inputs: (..., D) -> AdaptiveVQOutput.  Inactive codes get +inf
    distance so they are never selected; EMA updates only touch active rows."""
    codebook = state["codebook"]
    active = state["active"]
    K, D = codebook.shape
    shape = inputs.shape
    flat = inputs.reshape(-1, D)

    d = (jnp.sum(jnp.square(flat), axis=1, keepdims=True)
         + jnp.sum(jnp.square(codebook), axis=1)
         - 2.0 * flat @ codebook.T)
    d = jnp.where(active[None, :], d, jnp.inf)
    idx = jnp.argmin(d, axis=1)
    onehot = jax.nn.one_hot(idx, K, dtype=flat.dtype)
    quantized = (onehot @ codebook).reshape(shape)

    e_latent = jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - inputs))
    commitment = commitment_cost * jnp.mean(
        jnp.square(quantized - jax.lax.stop_gradient(inputs)))
    vq_loss = commitment + e_latent

    new_state = state
    if training:
        counts = jnp.sum(onehot, axis=0)
        batch_usage = counts / flat.shape[0]
        usage = state["ema_usage"] * decay + (1 - decay) * batch_usage
        cluster = jnp.where(
            active,
            state["ema_cluster_size"] * decay + (1 - decay) * counts,
            state["ema_cluster_size"])
        dw = onehot.T @ flat
        ema_w = jnp.where(active[:, None],
                          state["ema_w"] * decay + (1 - decay) * dw,
                          state["ema_w"])
        n = jnp.sum(jnp.where(active, cluster, 0.0))
        n_active = jnp.sum(active)
        smoothed = (cluster + epsilon) / (n + n_active * epsilon) * n
        codebook = jnp.where(active[:, None],
                             ema_w / smoothed[:, None], codebook)
        new_state = dict(state, codebook=codebook, ema_cluster_size=cluster,
                         ema_w=ema_w, ema_usage=usage)

    quantized_st = inputs + jax.lax.stop_gradient(quantized - inputs)
    avg = jnp.mean(onehot, axis=0)
    perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
    return AdaptiveVQOutput(vq_loss, quantized_st, perplexity, idx, new_state)


@jax.jit
def adaptive_prune_and_merge(state: dict,
                             min_usage_threshold: float = 0.01,
                             merge_distance_threshold: float = 0.5):
    """Vectorized prune + merge pass (call every ``prune_interval`` steps).

    Prune: active codes with usage share below the threshold.
    Merge: for each active pair (i, j) with ||e_i - e_j|| below the
    threshold, the lower-usage member is pruned and the survivor becomes the
    usage-weighted average (reference lines 154-231, without the Python pair
    loop: each code merges toward its nearest higher-usage close neighbor).
    """
    codebook = state["codebook"]
    active = state["active"]
    usage = state["ema_usage"]
    K = codebook.shape[0]

    share = usage / (jnp.sum(usage) + 1e-10)
    to_prune = (share < min_usage_threshold) & active

    # pairwise distances among active codes
    sq = (jnp.sum(jnp.square(codebook), axis=1, keepdims=True)
          + jnp.sum(jnp.square(codebook), axis=1)
          - 2.0 * codebook @ codebook.T)
    dist = jnp.sqrt(jnp.maximum(sq, 0.0))
    pair_active = active[:, None] & active[None, :]
    eye = jnp.eye(K, dtype=bool)
    close = (dist < merge_distance_threshold) & pair_active & ~eye

    # j loses to i when close and usage_i > usage_j (ties broken by index)
    usage_gt = (usage[:, None] > usage[None, :]) | (
        (usage[:, None] == usage[None, :])
        & (jnp.arange(K)[:, None] < jnp.arange(K)[None, :]))
    loses = close & usage_gt.T          # loses[j, i]: j absorbed into i
    absorbed = jnp.any(loses, axis=1)   # j is absorbed by someone
    # winner for each absorbed j: the closest dominating neighbor
    dist_masked = jnp.where(loses, dist, jnp.inf)
    winner = jnp.argmin(dist_masked, axis=1)

    # usage-weighted average into the winner (one absorbed donor per winner
    # per pass; additional duplicates resolve over subsequent passes)
    scatter_idx = jnp.where(absorbed, winner, K)  # K = dropped (out of range)
    donor_of = jnp.full((K,), -1).at[scatter_idx].set(
        jnp.arange(K), mode="drop")
    has_donor = donor_of >= 0
    donor_idx = jnp.clip(donor_of, 0, K - 1)
    total = usage + jnp.where(has_donor, usage[donor_idx], 0.0)
    w_self = jnp.where(has_donor, usage / jnp.maximum(total, 1e-10), 1.0)
    w_donor = jnp.where(has_donor,
                        usage[donor_idx] / jnp.maximum(total, 1e-10), 0.0)
    codebook = (w_self[:, None] * codebook
                + w_donor[:, None] * codebook[donor_idx])
    usage = jnp.where(has_donor, total, usage)

    to_prune = to_prune | absorbed
    new_active = active & ~to_prune
    # never go below one active code
    new_active = jnp.where(jnp.any(new_active), new_active,
                           jnp.zeros_like(new_active).at[0].set(True))
    usage = jnp.where(new_active, usage, 0.0)

    count = jnp.sum(new_active).astype(jnp.int32)
    stable = jnp.where(count == state["last_active_count"],
                       state["stable_steps"] + 1, 0)
    return dict(state, codebook=codebook, ema_usage=usage,
                active=new_active, stable_steps=stable,
                last_active_count=count)


def active_codes_count(state) -> int:
    return int(jnp.sum(state["active"]))


def is_stable(state, stable_passes_required: int = 2) -> bool:
    return int(state["stable_steps"]) >= stable_passes_required
