"""NN building blocks: residual blocks, residual stack, jitter, upsampling.

Functional re-design of the reference's `src/modules/` (param pytrees +
pure apply fns, explicit PRNG threading).
"""
import jax
import jax.numpy as jnp

from vqvae_speech_tpu.nn.conv import conv1d_init, conv1d


# -------------------- Residual block / stack --------------------


def residual_init(key, in_ch, num_hiddens, num_residual_hiddens,
                  use_weight_norm=False, dtype=jnp.float32):
    """ReLU -> conv k3 p1 (no bias) -> ReLU -> conv k1 (no bias), residual add.

    Mirrors reference src/modules/residual.py:31-70.
    """
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv1d_init(k1, in_ch, num_residual_hiddens, 3, bias=False,
                             use_weight_norm=use_weight_norm, dtype=dtype),
        "conv2": conv1d_init(k2, num_residual_hiddens, num_hiddens, 1, bias=False,
                             use_weight_norm=use_weight_norm, dtype=dtype),
    }


def residual_apply(params, x):
    h = jax.nn.relu(x)
    h = conv1d(params["conv1"], h, padding=1)
    h = jax.nn.relu(h)
    h = conv1d(params["conv2"], h)
    return x + h


def residual_stack_init(key, in_ch, num_hiddens, num_residual_layers,
                        num_residual_hiddens, use_weight_norm=False,
                        dtype=jnp.float32):
    """ONE set of residual params applied `num_residual_layers` times.

    The reference's ResidualStack builds its layer list with Python list
    multiplication, so every layer is the SAME module instance (tied weights,
    reference src/modules/residual_stack.py:40-41).  We reproduce that by
    storing a single block's params and looping the apply.  The layer count is
    static (threaded through apply, NOT stored in the param pytree — grads
    flow over params).
    """
    del num_residual_layers  # static; passed to residual_stack_apply
    return {
        "block": residual_init(key, in_ch, num_hiddens, num_residual_hiddens,
                               use_weight_norm, dtype),
    }


def residual_stack_apply(params, x, num_layers: int):
    for _ in range(num_layers):
        x = residual_apply(params["block"], x)
    return jax.nn.relu(x)


# -------------------- Jitter --------------------


def jitter(key, x, probability: float = 0.12, inverted: bool = True,
           detach_replacements: bool = True):
    """Chorowski time-jitter on (B, T, C) — vectorized (one fused gather).

    The reference implements this as a per-timestep Python loop with host RNG
    (reference src/modules/jitter.py:47-70).  Two behaviors to know about:

    * One random draw per timestep, SHARED across the batch and channels —
      reproduced here (draw shapes are (T,)).
    * Reference inversion quirk: `[True, False][np.random.choice([1, 0],
      p=[p, 1-p])]` selects True (replace) with probability **1-p**, not p
      (jitter.py:55).  With the default `inverted=True` we reproduce that
      behavior, since the published jitter12 baselines were produced with it;
      pass `inverted=False` for the paper's intended semantics (replace w.p. p).

    Boundary frames use their only neighbor (t=0 -> +1, t=T-1 -> -1); interior
    frames pick t-1 or t+1 uniformly.  Replacements read the *original*
    tensor (the reference copies before mutating, jitter.py:48).

    GRADIENT SEMANTICS (the round-3 flagship-divergence fix): the reference
    copies from `quantized.detach().clone()` (jitter.py:47), so replaced
    frames carry NO gradient — with the inverted quirk that detaches ~88%
    of the decoder input, cutting the straight-through reconstruction
    gradient into the encoder ~8x.  That cut is what makes the reference's
    jitter12 flagship configuration drift-stable (measured head-to-head in
    RESULTS.md: torch e_latent 0.68 vs 4.3 for a live-gather jitter at the
    flagship operating point).  A live gather (gradients rerouted through
    neighbors) is NOT equivalent; `jax.lax.stop_gradient` on the gathered
    neighbor values reproduces the reference exactly.

    ``detach_replacements=False`` keeps the live gather — the FLOW-GRADIENT
    EXTENSION: replaced frames backprop into their source neighbor, adding
    a temporal-consistency pressure (the Chorowski jitter *intent* — "a
    latent vector at t must strive to be useful at t-1/t+1" — applied to
    gradients as well as values).  Measurably stronger regularizer at toy
    scale (w24 gate ARI ~3x the detached reference semantics, RESULTS.md);
    values are identical either way.
    """
    T = x.shape[1]
    k_rep, k_dir = jax.random.split(key)
    p_replace = (1.0 - probability) if inverted else probability
    replace = jax.random.bernoulli(k_rep, p_replace, (T,))
    direction = jnp.where(jax.random.bernoulli(k_dir, 0.5, (T,)), 1, -1)
    t = jnp.arange(T)
    neighbor = jnp.where(t == 0, 1, jnp.where(t == T - 1, T - 2, t + direction))
    if not detach_replacements:
        src = jnp.where(replace, neighbor, t)
        return x[:, src, :]
    detached = jax.lax.stop_gradient(x)[:, neighbor, :]
    return jnp.where(replace[None, :, None], detached, x)


# -------------------- Upsample --------------------


def upsample_nearest(x, scale: int = 2):
    """nn.Upsample(scale_factor=scale) nearest-neighbor on (B, T, C)
    (reference src/models/deconvolutional_decoder.py:66,117)."""
    return jnp.repeat(x, scale, axis=1)


# -------------------- Embedding --------------------


def embedding_init(key, num_embeddings, dim, dtype=jnp.float32, scale=None):
    """nn.Embedding-style table; default init N(0,1) like torch."""
    w = jax.random.normal(key, (num_embeddings, dim), dtype)
    if scale is not None:
        w = w * scale
    return {"table": w}


def embedding_lookup(params, ids):
    return params["table"][ids]
