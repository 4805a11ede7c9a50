"""Codebook repulsion + dead-code reset: the `old/` 2-D demo VQ variants.

Capability-parity with the reference's experimental quantizers
(reference old/vqvae_2d_direct_fixed.py:56-109 `VQWithRepulsion` and
old/vqvae_2d_improved.py:57-170 `ImprovedVectorQuantizerEMA`), redesigned
as pure jittable functions:

* `codebook_repulsion` — pairwise repulsive force between codes closer than
  `min_distance` (force ∝ (min_distance - d)/min_distance, direction i<-j;
  reference old/vqvae_2d_direct_fixed.py:85-109), plus the "improved"
  variant's outward-from-center force at 0.5x strength
  (old/vqvae_2d_improved.py:130-140).  The torch loops update codes
  sequentially in place; this vectorized version applies all forces
  simultaneously (Jacobi update) — O(K^2 D) as one broadcast instead of
  Python loops, and jit/grad-safe.
* `usage_ema_update` — per-code usage EMA (old/vqvae_2d_improved.py:91).
* `reset_dead_codes` — codes whose usage EMA fell below a threshold are
  re-seeded from random input rows (old/vqvae_2d_improved.py:146-170),
  vectorized with one permutation draw.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp


def codebook_repulsion(codebook, strength: float, min_distance: float,
                       outward_strength: float = 0.0, eps: float = 1e-8):
    """Push codes apart; returns the displaced codebook (K, D)."""
    diff = codebook[:, None, :] - codebook[None, :, :]       # i - j
    dist = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(diff), -1), 0.0))
    near = (dist > 0.0) & (dist < min_distance)              # (K, K)
    direction = diff / (dist + eps)[..., None]
    magnitude = strength * (min_distance - dist) / min_distance
    force = jnp.sum(jnp.where(near[..., None],
                              direction * magnitude[..., None], 0.0), axis=1)
    if outward_strength:
        center = jnp.mean(codebook, axis=0, keepdims=True)
        out_dir = codebook - center
        norm = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(out_dir), -1,
                                            keepdims=True), 0.0))
        force = force + jnp.where(norm > 0, out_dir / (norm + eps), 0.0) \
            * outward_strength
    return codebook + force


def usage_ema_update(usage, counts, decay: float):
    """usage EMA over per-batch code counts (K,)."""
    return usage * decay + (1.0 - decay) * counts


class ResetResult(NamedTuple):
    codebook: jax.Array
    ema_w: jax.Array
    cluster_size: jax.Array
    usage: jax.Array
    num_reset: jax.Array


def reset_dead_codes(key, codebook, ema_w, cluster_size, usage, flat_input,
                     threshold: float = 0.01, usage_init: float = 0.1,
                     cluster_init: float = 1.0) -> ResetResult:
    """Re-seed codes with usage EMA below `threshold` from random input rows.

    Jittable: every dead code k gets row perm[rank(k)] of a single input
    permutation (the torch original draws randperm and assigns in a loop,
    old/vqvae_2d_improved.py:153-169 — same distribution, one gather).
    """
    K = codebook.shape[0]
    n = flat_input.shape[0]
    dead = usage < threshold                                  # (K,)
    perm = jax.random.permutation(key, n)
    rank = jnp.cumsum(dead.astype(jnp.int32)) - 1             # (K,)
    rows = flat_input[perm[jnp.clip(rank, 0, n - 1) % n]]     # (K, D)
    dead_col = dead[:, None]
    return ResetResult(
        codebook=jnp.where(dead_col, rows, codebook),
        ema_w=jnp.where(dead_col, rows, ema_w),
        cluster_size=jnp.where(dead, cluster_init, cluster_size),
        usage=jnp.where(dead, usage_init, usage),
        num_reset=jnp.sum(dead.astype(jnp.int32)),
    )
