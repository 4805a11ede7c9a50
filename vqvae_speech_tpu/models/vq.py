"""Vector quantizers (gradient and EMA variants), functional TPU re-design.

Capability-parity with reference src/models/vector_quantizer.py:33-160 and
src/models/vector_quantizer_ema.py:33-187:

* codebook search with the exact (C, T, B)-order flatten quirk (see
  ops/vq.py:reference_flatten; reference vector_quantizer.py:88-93),
* straight-through estimator (``z + stop_grad(q - z)``, reference line 141),
* gradient variant: q-latent + beta-commitment losses, codebook init
  U(-1/K, 1/K) (reference line 65),
* EMA variant: Laplace-smoothed cluster-size EMA + dw EMA applied BEFORE the
  quantized output is produced (reference vector_quantizer_ema.py:143-159),
  codebook init N(0, 1) (line 72), loss = commitment only,
* perplexity = exp(entropy of code usage) (reference lines 142-148).

State design: the codebook is a *trainable param* for the gradient variant and
*pure state* for the EMA variant — the functional split the reference fudges
with nn.Parameter reassignment every step (vector_quantizer_ema.py:154-156).
"""
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vqvae_speech_tpu.ops.vq import (
    reference_flatten,
    reference_unflatten,
    vq_distances,
    vq_search,
)


class VQOutput(NamedTuple):
    vq_loss: jax.Array          # scalar loss to add to the objective
    quantized: jax.Array        # (B, T, C) straight-through quantized latents
    perplexity: jax.Array       # scalar exp-entropy of code usage
    encodings: jax.Array        # (B, T', K) one-hot in reference layout
    distances: jax.Array        # (B, T', K) distance matrix in reference layout
    indices: jax.Array          # (N, 1) flat encoding indices (reference layout)
    losses: dict                # per-term scalars
    new_state: Optional[dict]   # updated EMA state (None for gradient variant)


def vector_quantizer_init(key, num_embeddings: int, embedding_dim: int,
                          ema: bool, dtype=jnp.float32):
    """Returns (params, state).

    Gradient variant: params={'codebook'} U(-1/K, 1/K); state={}.
    EMA variant: params={}; state={'codebook' N(0,1), 'ema_cluster_size' zeros,
    'ema_w' N(0,1)}.
    """
    k1, k2 = jax.random.split(key)
    if ema:
        state = {
            "codebook": jax.random.normal(k1, (num_embeddings, embedding_dim), dtype),
            "ema_cluster_size": jnp.zeros((num_embeddings,), dtype),
            "ema_w": jax.random.normal(k2, (num_embeddings, embedding_dim), dtype),
        }
        return {}, state
    bound = 1.0 / num_embeddings
    params = {
        "codebook": jax.random.uniform(
            k1, (num_embeddings, embedding_dim), dtype, -bound, bound
        )
    }
    return params, {}


def vector_quantizer_apply(
    params: dict,
    state: dict,
    z_btc,
    *,
    commitment_cost: float,
    decay: float = 0.0,
    epsilon: float = 1e-5,
    training: bool = True,
    use_pallas: Optional[bool] = None,
):
    """Quantize (B, T, C) latents.  EMA variant iff ``decay > 0``."""
    ema = decay > 0.0
    codebook = state["codebook"] if ema else params["codebook"]
    pre_update_codebook = codebook  # the distances view below uses this
    K, D = codebook.shape
    B, T, C = z_btc.shape

    flat = reference_flatten(z_btc, D)  # (N, D), N = B*T when C == D
    res = vq_search(flat, codebook, use_pallas=use_pallas)
    # res.quantized is differentiable on both dispatch paths with identical
    # a.e. semantics (custom VJP routes g_quantized to the codebook through
    # the saved one-hot — exactly what autograd does on the XLA chain, where
    # the int argmin blocks any gradient to the distances).  The onehot
    # below feeds only the EMA re-quantize and the evaluator's encodings
    # view; XLA dead-code-eliminates it from the gradient-variant train step.
    onehot = jax.nn.one_hot(res.indices, K, dtype=flat.dtype)

    new_state = None
    if ema and training:
        # EMA codebook update BEFORE producing the quantized output
        # (reference vector_quantizer_ema.py:143-159).  counts/dw are
        # gradient-stopped: the reference detaches them by rebuilding
        # nn.Parameters each step.
        counts = jax.lax.stop_gradient(res.counts)
        dw = jax.lax.stop_gradient(res.dw)
        cluster = state["ema_cluster_size"] * decay + (1 - decay) * counts
        n = jnp.sum(cluster)
        cluster = (cluster + epsilon) / (n + K * epsilon) * n
        ema_w = state["ema_w"] * decay + (1 - decay) * dw
        codebook = ema_w / cluster[:, None]
        new_state = {
            "codebook": codebook,
            "ema_cluster_size": cluster,
            "ema_w": ema_w,
        }
    elif ema:
        new_state = state
    if ema:
        # update-before-quantize quirk: the EMA variant quantizes with the
        # UPDATED codebook (reference vector_quantizer_ema.py:143-159), so
        # the kernel's pre-update quantized rows cannot be used here.
        quant_flat = jnp.dot(
            onehot, jax.lax.stop_gradient(codebook),
            preferred_element_type=flat.dtype)
    else:
        quant_flat = res.quantized.astype(flat.dtype)

    quantized = reference_unflatten(quant_flat, B, T, C)

    # Losses (means are layout-invariant, computed in (B, T, C)).
    e_latent = jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - z_btc))
    commitment = commitment_cost * e_latent
    if ema:
        vq_loss = commitment
        losses = {"vq_loss": vq_loss}
    else:
        q_latent = jnp.mean(jnp.square(quantized - jax.lax.stop_gradient(z_btc)))
        vq_loss = q_latent + commitment
        losses = {
            "e_latent_loss": e_latent,
            "q_latent_loss": q_latent,
            "commitment_loss": commitment,
            "vq_loss": vq_loss,
        }

    # Straight-through estimator (reference vector_quantizer.py:141).
    quantized_st = z_btc + jax.lax.stop_gradient(quantized - z_btc)

    # mean(onehot, 0) == counts / N (the kernel's masked column sums), so the
    # train step never materializes the one-hot at all.
    avg_probs = res.counts.astype(flat.dtype) / flat.shape[0]
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

    # Reference-layout views for the evaluator: encodings/distances are
    # view(batch, time, -1) reshapes of the (C,T,B)-order row stream
    # (reference vector_quantizer.py:151-153; the -1 matters when D != C).
    # NOTE: the distances view uses the PRE-update codebook — the reference
    # computes them before its EMA update (vector_quantizer_ema.py:109-111).
    distances = vq_distances(flat, pre_update_codebook).reshape(B, T, -1)
    encodings = onehot.reshape(B, T, -1)

    return VQOutput(
        vq_loss=vq_loss,
        quantized=quantized_st,
        perplexity=perplexity,
        encodings=encodings,
        distances=distances,
        indices=res.indices[:, None],
        losses=losses,
        new_state=new_state,
    )
