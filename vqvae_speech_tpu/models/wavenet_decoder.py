"""WaveNetDecoder: jittered latents -> conv k2 mixer -> conditioned WaveNet.

Capability-parity with reference src/models/wavenet_decoder.py:38-88: optional
jitter on the latent sequence, a kernel-2 conv (64 -> 768) mixing neighboring
latents, then the r9y9-style WaveNet with local conditioning = mixed latents
(upsample_scales [2,2,2,2,2,12] = 768x to sample rate) and global
conditioning = speaker id.
"""
import jax
import jax.numpy as jnp

from vqvae_speech_tpu.nn import conv1d_init, conv1d, jitter
from vqvae_speech_tpu.models.wavenet import (
    WaveNetConfig, wavenet_init, wavenet_apply)

# Reference wavenet_decoder.py:76 passes [2,2,2,2,2,12] with a "# 768"
# comment, but the actual product is 384 — we reproduce the code's behavior.
UPSAMPLE_SCALES = (2, 2, 2, 2, 2, 12)  # prod = 384


def wavenet_config_from(configuration: dict, num_speakers: int) -> WaveNetConfig:
    return WaveNetConfig(
        out_channels=configuration["quantize"],
        layers=configuration["n_layers"],
        stacks=configuration["n_loop"],
        residual_channels=configuration["residual_channels"],
        gate_channels=configuration["gate_channels"],
        skip_out_channels=configuration["skip_out_channels"],
        kernel_size=configuration["filter_size"],
        cin_channels=configuration["local_condition_dim"],
        gin_channels=configuration["global_condition_dim"],
        n_speakers=num_speakers,
        upsample_conditional_features=True,
        upsample_scales=UPSAMPLE_SCALES,
    )


def wavenet_decoder_init(key, configuration: dict, num_speakers: int,
                         dtype=jnp.float32):
    k_conv, k_wn = jax.random.split(key)
    cfg = wavenet_config_from(configuration, num_speakers)
    params = {
        "conv_1": conv1d_init(
            k_conv, configuration["embedding_dim"],
            configuration["local_condition_dim"], 2,
            use_weight_norm=configuration["use_kaiming_normal"], dtype=dtype),
        "wavenet": wavenet_init(k_wn, cfg, dtype),
    }
    return params, cfg


def wavenet_decoder_apply(params, cfg: WaveNetConfig, y, local_condition,
                          global_condition, *, configuration: dict,
                          training: bool = False, rng=None):
    """y: (B, T, quantize) one-hot audio; local_condition: (B, T_lat, D)
    latents; global_condition: (B,) speaker ids."""
    if configuration.get("use_jitter") and training:
        k_jit, rng = jax.random.split(rng)
        local_condition = jitter(k_jit, local_condition,
                                 configuration["jitter_probability"])
    # kernel-2 mixer (torch default padding 0 -> T_lat - 1 outputs)
    local_condition = conv1d(params["conv_1"], local_condition, padding=0)
    return wavenet_apply(params["wavenet"], cfg, y, c=local_condition,
                         g=global_condition, training=training, rng=rng)
