"""ClariNet building blocks: causal/SAME convs, gated ResBlock, LC upsampling.

Capability-parity with reference src/clarinet/modules.py:34-98 (ksw0306
vendored), channels-last for TPU:

* `Conv`: causal mode pads left ``d*(k-1)``; SAME mode pads symmetric
  ``d*(k-1)//2`` (the reference pads both sides then trims the right —
  identical result),
* `ResBlock`: separate filter/gate dilated convs + 1x1 conditioning
  projections, tanh*sigmoid, res/skip 1x1s, ``(x+res)*sqrt(0.5)``,
* upsampling: ConvTranspose2d(1,1,(3,2s),stride=(1,s),padding=(1,s//2)) +
  LeakyReLU(0.4) per scale (reference src/clarinet/wavenet.py:69-76).

All convs are weight-normalized with kaiming-normal direction init
(reference wraps weight_norm then kaiming_normal_, modules.py:46-47).
"""
import math

import jax
import jax.numpy as jnp
from jax import lax

from vqvae_speech_tpu.nn.conv import conv1d_init, conv_weight
from vqvae_speech_tpu.nn.init import kaiming_normal


def conv_init(key, in_ch, out_ch, kernel_size, dtype=jnp.float32):
    return conv1d_init(key, in_ch, out_ch, kernel_size, bias=True,
                       use_weight_norm=True, dtype=dtype)


def conv_apply(p, x, kernel_size, dilation=1, causal=True, mode="SAME"):
    """x: (B, T, C)."""
    w = conv_weight(p)
    if causal and mode == "SAME":
        pad = (dilation * (kernel_size - 1), 0)
    elif mode == "SAME":
        h = dilation * (kernel_size - 1) // 2
        pad = (h, h)
    else:
        pad = (0, 0)
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,), padding=[pad],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)
    return y + p["b"].astype(y.dtype)


def resblock_init(key, in_ch, out_ch, skip_ch, kernel_size, cin_channels,
                  dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    return {
        "filter_conv": conv_init(ks[0], in_ch, out_ch, kernel_size, dtype),
        "gate_conv": conv_init(ks[1], in_ch, out_ch, kernel_size, dtype),
        "res_conv": conv_init(ks[2], out_ch, in_ch, 1, dtype),
        "skip_conv": conv_init(ks[3], out_ch, skip_ch, 1, dtype),
        "filter_conv_c": conv_init(ks[4], cin_channels, out_ch, 1, dtype),
        "gate_conv_c": conv_init(ks[5], cin_channels, out_ch, 1, dtype),
    }


def resblock_apply(p, x, c, kernel_size, dilation, causal=True):
    h_f = conv_apply(p["filter_conv"], x, kernel_size, dilation, causal)
    h_g = conv_apply(p["gate_conv"], x, kernel_size, dilation, causal)
    if c is not None:
        h_f = h_f + conv_apply(p["filter_conv_c"], c, 1)
        h_g = h_g + conv_apply(p["gate_conv_c"], c, 1)
    out = jnp.tanh(h_f) * jax.nn.sigmoid(h_g)
    res = conv_apply(p["res_conv"], out, 1)
    skip = conv_apply(p["skip_conv"], out, 1)
    return (x + res) * math.sqrt(0.5), skip


def upsample_init(key, upsample_scales, dtype=jnp.float32):
    params = []
    ks = jax.random.split(key, len(upsample_scales))
    for k, s in zip(ks, upsample_scales):
        shape = (3, 2 * s, 1, 1)
        v = kaiming_normal(k, shape, fan_in=3 * 2 * s, dtype=dtype)
        g = jnp.sqrt(jnp.sum(jnp.square(v))).reshape(1)
        params.append({"v": v, "g": g, "b": jnp.zeros((1,), dtype)})
    return params


def _subpixel_upsample_kernel(w2, s):
    """Re-express ConvTranspose2d(kernel (3, 2s), stride (1, s),
    padding (1, s//2)) as ONE stride-1 correlation with kernel (3, 3)
    producing s outputs per frame (then interleave-reshape).

    Derivation: the transposed conv's output at n = u*s + j draws
    x[u - t'] with coefficient w[dh, t'*s + j + s//2] for t' in {-1,0,1}
    (at most two of which are in-range per j), so a 3-tap frame-axis
    correlation kernel K[dh, m, j] = w_flipH[dh, (1-m)*s + j + s//2]
    reproduces it exactly (verified to float ulp in tests).

    WHY: on this image's TPU backend the BACKWARD of the lhs_dilation
    (zero-stuffed) conv compiles pathologically slowly — superlinear in
    the output length (>10 min for the upsampler alone at T=15872, which
    dominated every vocoder training compile).  The subpixel form is a
    plain conv: seconds to compile, and MXU-friendlier.
    """
    import numpy as np

    idx = np.zeros((3, s), dtype=np.int32)
    mask = np.zeros((3, s), dtype=bool)
    for m in range(3):
        for j in range(s):
            k = (1 - m) * s + j + s // 2
            if 0 <= k < 2 * s:
                idx[m, j] = k
                mask[m, j] = True
    ker = w2[::-1][:, jnp.asarray(idx.reshape(-1))].reshape(3, 3, s)
    ker = ker * jnp.asarray(mask, ker.dtype)[None]
    return ker[:, :, None, :]                        # (H=3, W=3, I=1, O=s)


def upsample_apply(params, c, upsample_scales, negative_slope=0.4):
    """c: (B, T, C) -> (B, T*prod(scales), C); parity with the reference's
    per-scale ConvTranspose2d + LeakyReLU(0.4) stack
    (src/clarinet/wavenet.py:69-76).  Even scales run the subpixel
    formulation (see _subpixel_upsample_kernel); odd scales keep the
    transposed conv (their output length differs by one)."""
    x = jnp.transpose(c, (0, 2, 1))[..., None]  # (B, F=C, W=T, 1)
    for p, s in zip(params, upsample_scales):
        v = p["v"]
        w = p["g"][0] * v / jnp.sqrt(jnp.sum(jnp.square(v)))
        if s % 2 == 0:
            ker = _subpixel_upsample_kernel(w[:, :, 0, 0], s)
            y = lax.conv_general_dilated(
                x, ker.astype(x.dtype), window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
            B, F, T = y.shape[0], y.shape[1], y.shape[2]
            x = y.reshape(B, F, T * s, 1)
        else:
            kh, kw = w.shape[0], w.shape[1]
            pad_h, pad_w, stride_w = 1, s // 2, s
            w_flipped = jnp.flip(w, axis=(0, 1))
            x = lax.conv_general_dilated(
                x, w_flipped.astype(x.dtype), window_strides=(1, 1),
                padding=[(kh - 1 - pad_h, kh - 1 - pad_h),
                         (kw - 1 - pad_w, kw - 1 - pad_w)],
                lhs_dilation=(1, stride_w),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
        x = jax.nn.leaky_relu(x + p["b"].astype(x.dtype), negative_slope)
    return jnp.transpose(x[..., 0], (0, 2, 1))
