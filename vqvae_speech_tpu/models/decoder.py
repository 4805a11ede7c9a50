"""Deconvolutional decoder (upsample x2 back to feature rate).

Capability-parity with reference src/models/deconvolutional_decoder.py:39-137:
optional training-time jitter, optional 40-channel speaker conditioning
concat, conv k3/p1, nearest-neighbor x2 upsample, (weight-tied) residual
stack, then convT k3/p1 -> convT k3/p0 -> convT k2/p0.
"""
import jax
import jax.numpy as jnp

from vqvae_speech_tpu.nn import (
    conv1d_init,
    conv1d,
    conv_transpose1d_init,
    conv_transpose1d,
    residual_stack_init,
    residual_stack_apply,
    jitter,
    upsample_nearest,
)
from vqvae_speech_tpu.models.global_conditioning import (
    global_conditioning_init,
    global_conditioning_apply,
)

GIN_CHANNELS = 40  # reference hardcodes 40 (deconvolutional_decoder.py:56)


def deconvolutional_decoder_init(key, in_channels: int, out_channels: int,
                                 num_hiddens: int, num_residual_layers: int,
                                 num_residual_hiddens: int,
                                 use_weight_norm: bool = False,
                                 use_speaker_conditioning: bool = False,
                                 num_speakers: int = 0, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    in_ch = in_channels + GIN_CHANNELS if use_speaker_conditioning else in_channels
    params = {
        "conv_1": conv1d_init(ks[0], in_ch, num_hiddens, 3,
                              use_weight_norm=use_weight_norm, dtype=dtype),
        "residual_stack": residual_stack_init(
            ks[1], num_hiddens, num_hiddens, num_residual_layers,
            num_residual_hiddens, use_weight_norm, dtype),
        "conv_trans_1": conv_transpose1d_init(ks[2], num_hiddens, num_hiddens, 3,
                                              use_weight_norm=use_weight_norm,
                                              dtype=dtype),
        "conv_trans_2": conv_transpose1d_init(ks[3], num_hiddens, num_hiddens, 3,
                                              use_weight_norm=use_weight_norm,
                                              dtype=dtype),
        "conv_trans_3": conv_transpose1d_init(ks[4], num_hiddens, out_channels, 2,
                                              use_weight_norm=use_weight_norm,
                                              dtype=dtype),
    }
    if use_speaker_conditioning:
        params["speaker_embedding"] = global_conditioning_init(
            ks[5], num_speakers, GIN_CHANNELS, dtype=dtype)
    return params


def deconvolutional_decoder_apply(params, x, *, training: bool = False,
                                  num_residual_layers: int = 2,
                                  use_jitter: bool = False,
                                  jitter_probability: float = 0.12,
                                  jitter_key=None, speaker_ids=None,
                                  jitter_detach: bool = True):
    """x: (B, T, C) quantized latents -> (B, 2T+3, out_channels).

    Output time length: T -> conv_1 (same) -> x2 upsample (2T) -> convT k3 p1
    (2T) -> convT k3 p0 (2T+2) -> convT k2 p0 (2T+3).

    ``jitter_detach=True`` is the reference's gradient semantics (PARITY
    #34); ``False`` is the flow-gradient extension (see nn/layers.jitter).
    """
    if use_jitter and training:
        x = jitter(jitter_key, x, jitter_probability,
                   detach_replacements=jitter_detach)
    if "speaker_embedding" in params:
        g = global_conditioning_apply(params["speaker_embedding"], speaker_ids,
                                      x.shape[1])
        x = jnp.concatenate([x, g], axis=-1)
    x = conv1d(params["conv_1"], x, padding=1)
    x = upsample_nearest(x, 2)
    x = residual_stack_apply(params["residual_stack"], x, num_residual_layers)
    x = jax.nn.relu(conv_transpose1d(params["conv_trans_1"], x, padding=1))
    x = jax.nn.relu(conv_transpose1d(params["conv_trans_2"], x, padding=0))
    return conv_transpose1d(params["conv_trans_3"], x, padding=0)
