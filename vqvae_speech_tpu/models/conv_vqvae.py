"""ConvolutionalVQVAE: encoder -> pre-VQ conv -> VQ(-EMA) -> deconv decoder.

Capability-parity with reference src/models/convolutional_vq_vae.py:39-139.
The composite is a pure function of (params, state, batch, rng): jit/pjit it
whole.  The EMA codebook lives in `state` and the updated state is returned
alongside the output (the functional replacement for the reference's
in-place buffer mutation).
"""
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vqvae_speech_tpu.nn import conv1d_init, conv1d
from vqvae_speech_tpu.models.encoder import (
    convolutional_encoder_init,
    convolutional_encoder_apply,
)
from vqvae_speech_tpu.models.decoder import (
    deconvolutional_decoder_init,
    deconvolutional_decoder_apply,
)
from vqvae_speech_tpu.models.vq import (
    vector_quantizer_init,
    vector_quantizer_apply,
)


class ConvVQVAEOutput(NamedTuple):
    reconstructed_x: jax.Array   # (B, T, C_out) trimmed to input length
    vq_loss: jax.Array
    losses: dict
    perplexity: jax.Array
    encoding_indices: jax.Array  # (N, 1) reference-layout flat indices
    quantized: jax.Array         # (B, T', D) straight-through latents
    encodings: jax.Array         # (B, T', K)
    distances: jax.Array         # (B, T', K)
    new_state: Optional[dict]
    # stop-gradient pre-VQ latents (B, T', D) — reseeding source for the
    # codebook-revival extension (train/trainer.py); None outside training
    pre_vq_latents: Optional[jax.Array] = None


def conv_vqvae_init(key, config: dict, dtype=jnp.float32):
    """Build params/state from a configuration dict (same keys as the
    reference YAML, configurations/vctk_features.yaml)."""
    k_enc, k_pre, k_vq, k_dec = jax.random.split(key, 4)
    in_filters = (config["input_features_filters"] * 3
                  if config["augment_input_features"]
                  else config["input_features_filters"])
    out_filters = (config["output_features_filters"] * 3
                   if config["augment_output_features"]
                   else config["output_features_filters"])
    ema = config["decay"] > 0.0
    vq_params, vq_state = vector_quantizer_init(
        k_vq, config["num_embeddings"], config["embedding_dim"], ema, dtype)
    params = {
        "encoder": convolutional_encoder_init(
            k_enc, in_filters, config["num_hiddens"],
            config["num_residual_layers"], config["num_hiddens"],
            config["use_kaiming_normal"], dtype),
        "pre_vq_conv": conv1d_init(
            k_pre, config["num_hiddens"], config["embedding_dim"], 3,
            dtype=dtype),
        "vq": vq_params,
        "decoder": deconvolutional_decoder_init(
            k_dec, config["embedding_dim"], out_filters,
            config["num_hiddens"], config["num_residual_layers"],
            config["residual_channels"], config["use_kaiming_normal"],
            config["use_speaker_conditioning"],
            config.get("num_speakers", 0), dtype),
    }
    state = {"vq": vq_state}
    if config.get("codebook_revival", False):
        # usage EMA of per-code assignment fractions (uniform at init) —
        # the revival extension's dead-code detector (train/trainer.py)
        K = config["num_embeddings"]
        state["revival"] = {"usage": jnp.full((K,), 1.0 / K, dtype)}
    return params, state


def conv_vqvae_encode(params, state, x, config: dict, *, training: bool = False,
                      use_pallas: Optional[bool] = None,
                      return_latents: bool = False):
    """Encoder + pre-VQ + VQ (the hot path benchmarked against the reference).

    x: (B, T, features) normalized input features.  With
    ``return_latents`` also returns the pre-VQ latents (B, T', D).
    """
    z = convolutional_encoder_apply(params["encoder"], x,
                                    config["num_residual_layers"])
    z = conv1d(params["pre_vq_conv"], z, padding=1)
    vq_out = vector_quantizer_apply(
        params["vq"], state["vq"], z,
        commitment_cost=config["commitment_cost"],
        decay=config["decay"],
        training=training,
        use_pallas=use_pallas,
    )
    return (vq_out, z) if return_latents else vq_out


def conv_vqvae_apply(params, state, x, config: dict, *, training: bool = False,
                     rng=None, speaker_ids=None,
                     use_pallas: Optional[bool] = None):
    """Full forward.  x: (B, T, C_in) features (layout note: the reference
    receives (B, T, C) from its dataset and permutes to channels-first,
    convolutional_vq_vae.py:118 — our layout is natively (B, T, C))."""
    vq_out, z = conv_vqvae_encode(params, state, x, config,
                                  training=training, use_pallas=use_pallas,
                                  return_latents=True)
    jitter_key = rng if rng is not None else jax.random.PRNGKey(0)
    recon = deconvolutional_decoder_apply(
        params["decoder"], vq_out.quantized,
        training=training,
        num_residual_layers=config["num_residual_layers"],
        use_jitter=config["use_jitter"],
        jitter_probability=config["jitter_probability"],
        jitter_key=jitter_key,
        speaker_ids=speaker_ids,
        # reference gradient semantics by default (PARITY #34); set
        # jitter_gradient_detach: false for the flow-gradient extension
        jitter_detach=config.get("jitter_gradient_detach", True),
    )
    # Trim decoder output back to the input frame count
    # (reference convolutional_vq_vae.py:133-137).
    T_in = x.shape[1]
    recon = recon[:, :T_in, :]

    new_state = dict(state)
    if vq_out.new_state is not None:
        new_state["vq"] = vq_out.new_state

    return ConvVQVAEOutput(
        reconstructed_x=recon,
        vq_loss=vq_out.vq_loss,
        losses=vq_out.losses,
        perplexity=vq_out.perplexity,
        encoding_indices=vq_out.indices,
        quantized=vq_out.quantized,
        encodings=vq_out.encodings,
        distances=vq_out.distances,
        new_state=new_state,
        pre_vq_latents=jax.lax.stop_gradient(z),
    )
