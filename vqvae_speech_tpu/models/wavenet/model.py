"""WaveNet vocoder with local/global conditioning — TPU-native batch forward.

Capability-parity with the vendored r9y9 WaveNet
(reference src/wavenet_vocoder/wavenet.py:87-264 and
src/wavenet_vocoder/modules.py:87-217):

* first 1x1 conv -> ``layers`` ResidualConv1dGLU blocks with dilation
  ``2**(layer % (layers//stacks))`` -> skip-sum (legacy sqrt(0.5) scaling) ->
  ReLU -> 1x1 -> ReLU -> 1x1,
* gated unit: dilated causal conv -> split(a, b) -> +local-cond 1x1 and
  +global-cond 1x1 projections -> tanh(a)*sigmoid(b) -> skip/residual 1x1s,
  ``(x+res)*sqrt(0.5)``,
* speaker embedding (std 0.1) for global conditioning,
* ConvTranspose2d (freq_kernel x scale, stride (1, scale)) + ReLU stack
  upsampling local conditioning to sample rate.

TPU re-design notes: activations are (B, T, C) so every conv is an MXU
matmul over the channel axis; causal convs use LEFT padding ``(k-1)*d``
(numerically identical to the reference's symmetric-pad-then-trim at
modules.py:181-183, verified in tests); dropout/PRNG is explicit.
"""
import math
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from vqvae_speech_tpu.nn.conv import conv1d, conv_weight


@dataclass(frozen=True)
class WaveNetConfig:
    out_channels: int = 256
    layers: int = 20
    stacks: int = 2
    residual_channels: int = 512
    gate_channels: int = 512
    skip_out_channels: int = 512
    kernel_size: int = 3
    dropout: float = 1 - 0.95
    cin_channels: int = -1
    gin_channels: int = -1
    n_speakers: Optional[int] = None
    upsample_conditional_features: bool = False
    upsample_scales: Optional[Sequence[int]] = None
    freq_axis_kernel_size: int = 3
    scalar_input: bool = False
    use_speaker_embedding: bool = True
    legacy: bool = True

    @property
    def layers_per_stack(self):
        assert self.layers % self.stacks == 0
        return self.layers // self.stacks

    def dilation(self, layer):
        return 2 ** (layer % self.layers_per_stack)


def receptive_field_size(total_layers, num_cycles, kernel_size,
                         dilation=lambda x: 2**x):
    """Receptive field in samples (reference wavenet.py:66-84)."""
    assert total_layers % num_cycles == 0
    layers_per_cycle = total_layers // num_cycles
    dilations = [dilation(i % layers_per_cycle) for i in range(total_layers)]
    return (kernel_size - 1) * sum(dilations) + 1


# -------------------- init --------------------


def _conv_init(key, in_ch, out_ch, kernel_size, dropout=0.0, std_mul=1.0,
               dtype=jnp.float32):
    """r9y9/DeepVoice3-style weight-norm conv init: v ~ N(0, std) with
    std = sqrt(std_mul*(1-dropout)/(kernel*in_ch)), g = ||v||, bias zero."""
    std = math.sqrt((std_mul * (1.0 - dropout)) / (kernel_size * in_ch))
    v = std * jax.random.normal(key, (kernel_size, in_ch, out_ch), dtype)
    g = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1)))
    return {"v": v, "g": g, "b": jnp.zeros((out_ch,), dtype)}


def _residual_glu_init(key, cfg: WaveNetConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    gate_out = cfg.gate_channels // 2
    p = {
        "conv": _conv_init(ks[0], cfg.residual_channels, cfg.gate_channels,
                           cfg.kernel_size, dropout=cfg.dropout, dtype=dtype),
        "conv1x1_out": _conv_init(ks[1], gate_out, cfg.residual_channels, 1,
                                  dtype=dtype),
        "conv1x1_skip": _conv_init(ks[2], gate_out, cfg.skip_out_channels, 1,
                                   dtype=dtype),
    }
    if cfg.cin_channels > 0:
        p["conv1x1c"] = _conv_init(ks[3], cfg.cin_channels, cfg.gate_channels,
                                   1, dtype=dtype)
    if cfg.gin_channels > 0:
        p["conv1x1g"] = _conv_init(ks[4], cfg.gin_channels, cfg.gate_channels,
                                   1, dtype=dtype)
    return p


def wavenet_init(key, cfg: WaveNetConfig, dtype=jnp.float32):
    n_extra = 4
    ks = jax.random.split(key, cfg.layers + n_extra + 2)
    in_ch = 1 if cfg.scalar_input else cfg.out_channels
    params = {
        "first_conv": _conv_init(ks[0], in_ch, cfg.residual_channels, 1,
                                 dtype=dtype),
        "conv_layers": [
            _residual_glu_init(ks[1 + i], cfg, dtype)
            for i in range(cfg.layers)],
        "last_conv_1": _conv_init(ks[cfg.layers + 1], cfg.skip_out_channels,
                                  cfg.skip_out_channels, 1, dtype=dtype),
        "last_conv_2": _conv_init(ks[cfg.layers + 2], cfg.skip_out_channels,
                                  cfg.out_channels, 1, dtype=dtype),
    }
    if cfg.gin_channels > 0 and cfg.use_speaker_embedding:
        assert cfg.n_speakers is not None
        params["embed_speakers"] = {
            "table": 0.1 * jax.random.normal(
                ks[cfg.layers + 3], (cfg.n_speakers, cfg.gin_channels), dtype)}
    if cfg.upsample_conditional_features:
        up = []
        for s in cfg.upsample_scales:
            kh = cfg.freq_axis_kernel_size
            # single-channel 2D transposed conv kernel (kh, kw=s).
            # Reference semantics (modules.py:53-62): the weight is FILLED
            # with 1/freq_axis_kernel_size and the bias zeroed, so the
            # initial upsample is an amplitude-preserving freq-axis
            # average and the post-stage ReLU is benign ("this should
            # avoid non-negative upsampling output", wavenet.py:191-192).
            # A random init here attenuates the conditioning ~2x per
            # ReLU stage (~200x over six stages); training then shuts the
            # starved channel completely — once any stage's bias drifts
            # below the tiny signal floor, ReLU outputs exact zeros, the
            # LC gradient is identically zero, and the codes channel is
            # severed forever (measured: wavenet_vqvae_e2e_codesonly
            # checkpoint, upsampled-LC nonzero fraction 0.0000).
            v = jnp.full((kh, s, 1, 1), 1.0 / kh, dtype)
            g = jnp.sqrt(jnp.sum(jnp.square(v)))
            up.append({"v": v, "g": g.reshape(1), "b": jnp.zeros((1,), dtype)})
        params["upsample_conv"] = up
    return params


# -------------------- apply --------------------


def _causal_conv(p, x, dilation, kernel_size):
    """Left-padded causal dilated conv on (B, T, C).  Identical to the
    reference's symmetric padding (k-1)*d followed by right trim
    (modules.py:129-135 + 181-183)."""
    w = conv_weight(p)
    pad = (kernel_size - 1) * dilation
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,),
        padding=[(pad, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)
    return y + p["b"].astype(y.dtype)


def _residual_glu_apply(p, x, c, g, cfg: WaveNetConfig, dilation,
                        training=False, dropout_rng=None):
    residual = x
    if training and cfg.dropout > 0 and dropout_rng is not None:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(dropout_rng, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0)
    x = _causal_conv(p["conv"], x, dilation, cfg.kernel_size)
    a, b = jnp.split(x, 2, axis=-1)
    if c is not None:
        ch = conv1d(p["conv1x1c"], c)
        ca, cb = jnp.split(ch, 2, axis=-1)
        a, b = a + ca, b + cb
    if g is not None:
        gh = conv1d(p["conv1x1g"], g)
        ga, gb = jnp.split(gh, 2, axis=-1)
        a, b = a + ga, b + gb
    x = jnp.tanh(a) * jax.nn.sigmoid(b)
    s = conv1d(p["conv1x1_skip"], x)
    x = conv1d(p["conv1x1_out"], x)
    return (x + residual) * math.sqrt(0.5), s


def _upsample_lc(params, c, cfg: WaveNetConfig):
    """Local-conditioning upsampling: stack of single-channel ConvTranspose2d
    (freq_k x s, stride (1, s), freq padding (freq_k-1)//2) + ReLU
    (reference wavenet.py:181-195, 240-247).  c: (B, T, C) -> (B, T*prod(s), C).
    """
    # image layout: (B, F=C, W=T, 1 channel)
    x = jnp.transpose(c, (0, 2, 1))[..., None]
    for p, s in zip(params["upsample_conv"], cfg.upsample_scales):
        v = p["v"]
        norm = jnp.sqrt(jnp.sum(jnp.square(v)))
        w = (p["g"][0] * v / norm)
        kh = w.shape[0]
        freq_pad = (cfg.freq_axis_kernel_size - 1) // 2
        # Subpixel form: kernel width == stride == s means each output
        # sample draws exactly ONE input frame — the transposed conv is a
        # stride-1 correlation with a (kh, 1) kernel producing s outputs
        # per frame, then an interleave reshape.  Same math to float ulp;
        # avoids the lhs_dilation backward, whose TPU compile time is
        # superlinear in the output length (see clarinet/modules.py).
        ker = w[::-1, :, 0, 0][:, None, None, :]       # (kh, 1, 1, s)
        y = lax.conv_general_dilated(
            x, ker.astype(x.dtype), window_strides=(1, 1),
            padding=[(freq_pad, freq_pad), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        B, F, T = y.shape[0], y.shape[1], y.shape[2]
        x = y.reshape(B, F, T * s, 1)
        x = jax.nn.relu(x + p["b"].astype(x.dtype))
    return jnp.transpose(x[..., 0], (0, 2, 1))


def _expand_global(params, g, B, T, cfg: WaveNetConfig):
    if g is None:
        return None
    if "embed_speakers" in params and g.ndim <= 2:
        emb = params["embed_speakers"]["table"][
            g.reshape(B).astype(jnp.int32)]       # (B, gin)
        g = emb[:, None, :]                        # (B, 1, gin)
    return jnp.broadcast_to(g, (B, T, g.shape[-1]))


def wavenet_apply(params, cfg: WaveNetConfig, x, c=None, g=None,
                  softmax=False, training=False, rng=None):
    """x: (B, T, in) one-hot audio (or (B, T, 1) scalar); c: (B, Tc, cin)
    local conditioning (upsampled here if configured); g: (B,) speaker ids or
    (B, 1, gin) features.  Returns (B, T, out_channels)."""
    B, T = x.shape[0], x.shape[1]
    g_btc = _expand_global(params, g, B, T, cfg)
    if c is not None and cfg.upsample_conditional_features:
        c = _upsample_lc(params, c, cfg)
        # allow LC upsampled beyond the audio length (e.g. 24 latents x 384 =
        # 9216 frames conditioning 7680 samples) — trim to T.  The reference
        # asserts exact equality (wavenet.py:247), which makes its WaveNet
        # decoder config unusable; trimming makes the path trainable.
        assert c.shape[1] >= T, (c.shape, T)
        c = c[:, :T]

    x = conv1d(params["first_conv"], x)
    skips = None
    rngs = (jax.random.split(rng, cfg.layers) if rng is not None
            else [None] * cfg.layers)
    for layer, p in enumerate(params["conv_layers"]):
        x, h = _residual_glu_apply(p, x, c, g_btc, cfg, cfg.dilation(layer),
                                   training, rngs[layer])
        if skips is None:
            skips = h
        else:
            skips = skips + h
            if cfg.legacy:
                skips = skips * math.sqrt(0.5)

    x = jax.nn.relu(skips)
    x = jax.nn.relu(conv1d(params["last_conv_1"], x))
    x = conv1d(params["last_conv_2"], x)
    return jax.nn.softmax(x, axis=-1) if softmax else x
