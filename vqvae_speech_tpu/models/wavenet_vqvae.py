"""WaveNetVQVAE: feature encoder -> VQ -> WaveNet decoder on mu-law targets.

Capability-parity with reference src/models/wavenet_vq_vae.py:36-127 (the WIP
path unreachable from the reference's PipelineFactory, which only builds
deconvolutional pipelines — pipeline_factory.py:52-53; exposed here as a
working model).
"""
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vqvae_speech_tpu.nn import conv1d_init, conv1d
from vqvae_speech_tpu.models.encoder import (
    convolutional_encoder_init, convolutional_encoder_apply)
from vqvae_speech_tpu.models.vq import (
    vector_quantizer_init, vector_quantizer_apply)
from vqvae_speech_tpu.models.wavenet_decoder import (
    wavenet_decoder_init, wavenet_decoder_apply)


class WaveNetVQVAEOutput(NamedTuple):
    reconstructed_x: jax.Array  # (B, T_samples, quantize) logits
    vq_loss: jax.Array
    losses: dict
    perplexity: jax.Array
    encoding_indices: jax.Array
    new_state: Optional[dict]
    pre_vq_latents: Optional[jax.Array] = None  # (B, T', D) encoder output
    #   after the pre-VQ conv; feeds the revival extension's re-seed pool
    #   (train/revival.py)


def wavenet_vqvae_init(key, configuration: dict, num_speakers: int,
                       dtype=jnp.float32):
    k_enc, k_pre, k_vq, k_dec = jax.random.split(key, 4)
    in_filters = (configuration["input_features_filters"] * 3
                  if configuration["augment_input_features"]
                  else configuration["input_features_filters"])
    ema = configuration["decay"] > 0.0
    vq_params, vq_state = vector_quantizer_init(
        k_vq, configuration["num_embeddings"], configuration["embedding_dim"],
        ema, dtype)
    dec_params, wavenet_cfg = wavenet_decoder_init(
        k_dec, configuration, num_speakers, dtype)
    params = {
        "encoder": convolutional_encoder_init(
            k_enc, in_filters, configuration["num_hiddens"],
            configuration["num_residual_layers"],
            configuration["residual_channels"],
            configuration["use_kaiming_normal"], dtype),
        # NOTE reference quirk: its pre-VQ conv uses kernel_size=1 with
        # padding=1 (wavenet_vq_vae.py:53-59), which GROWS time by 2; we
        # reproduce k1 with the sane padding=0 and document the difference.
        "pre_vq_conv": conv1d_init(
            k_pre, configuration["num_hiddens"],
            configuration["embedding_dim"], 1, dtype=dtype),
        "vq": vq_params,
        "decoder": dec_params,
    }
    state = {"vq": vq_state}
    if configuration.get("codebook_revival", False):
        # usage EMA for the revival extension's dead-code detector
        # (train/revival.py), mirroring conv_vqvae_init
        K = configuration["num_embeddings"]
        state["revival"] = {"usage": jnp.full((K,), 1.0 / K, dtype)}
    return params, state, wavenet_cfg


def wavenet_vqvae_apply(params, state, wavenet_cfg, x_enc, x_dec_onehot,
                        speaker_ids, configuration: dict, *,
                        training: bool = False, rng=None,
                        use_pallas=None, decoder_compute_dtype=None):
    """x_enc: (B, T_feat, C_in) features; x_dec_onehot: (B, T_samp, quantize)
    teacher-forcing inputs (one-hot mu-law [:-1]); speaker_ids: (B,).

    ``decoder_compute_dtype=jnp.bfloat16`` runs the WaveNet decoder (the
    FLOP-dominant stage) in bf16; the encoder and the VQ search stay f32
    to preserve exact codebook-index semantics, and the logits are cast
    back to f32 for the loss."""
    z = convolutional_encoder_apply(params["encoder"], x_enc,
                                    configuration["num_residual_layers"])
    z = conv1d(params["pre_vq_conv"], z, padding=0)
    vq_out = vector_quantizer_apply(
        params["vq"], state["vq"], z,
        commitment_cost=configuration["commitment_cost"],
        decay=configuration["decay"], training=training,
        use_pallas=use_pallas)
    dec_params, x_dec, quantized = (params["decoder"], x_dec_onehot,
                                    vq_out.quantized)
    if decoder_compute_dtype is not None:
        dec_params = jax.tree_util.tree_map(
            lambda p: p.astype(decoder_compute_dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, dec_params)
        x_dec = x_dec.astype(decoder_compute_dtype)
        quantized = quantized.astype(decoder_compute_dtype)
    recon = wavenet_decoder_apply(
        dec_params, wavenet_cfg, x_dec, quantized,
        speaker_ids, configuration=configuration, training=training, rng=rng)
    recon = recon.astype(jnp.float32)
    new_state = dict(state)
    if vq_out.new_state is not None:
        new_state["vq"] = vq_out.new_state
    return WaveNetVQVAEOutput(
        reconstructed_x=recon,
        vq_loss=vq_out.vq_loss,
        losses=vq_out.losses,
        perplexity=vq_out.perplexity,
        encoding_indices=vq_out.indices,
        new_state=new_state,
        pre_vq_latents=z,
    )
