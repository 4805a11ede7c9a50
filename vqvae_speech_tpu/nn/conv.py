"""1-D convolution primitives in TPU-friendly (B, T, C) layout.

The reference builds `nn.Conv1d` / `nn.ConvTranspose1d` in channels-first
(B, C, T) layout (reference: src/modules/conv1d_builder.py:32-44,
src/modules/conv_transpose1d_builder.py:32-44).  On TPU the feature axis must
be the minor (lane) dimension to map onto the MXU, so this framework keeps
activations as (B, T, C) and kernels as (K, Cin, Cout); XLA lowers
`conv_general_dilated` with ('NWC', 'WIO', 'NWC') dimension numbers straight
onto the systolic array.

Weight-norm (`use_weight_norm=True`) stores the PyTorch `weight_norm(dim=0)`
reparameterization explicitly: params hold direction `v` (K, Cin, Cout) and
per-output-channel magnitude `g` (Cout,); the effective kernel is
``g * v / ||v||`` with the norm over (K, Cin).
"""
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from vqvae_speech_tpu.nn.init import torch_conv_uniform, kaiming_normal

_DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")


def _init_kernel(key, kernel_size, in_ch, out_ch, use_weight_norm, dtype):
    fan_in = in_ch * kernel_size
    shape = (kernel_size, in_ch, out_ch)
    if use_weight_norm:
        # Reference quirk note: in PyTorch, wrapping with weight_norm *before*
        # calling kaiming_normal_ on `.weight` makes the kaiming init a no-op
        # (v/g keep the default init and recompute weight on forward,
        # reference src/modules/conv1d_builder.py:41-43).  Here we do the
        # intended thing: kaiming-normal init of the direction v.
        kv, _ = jax.random.split(key)
        v = kaiming_normal(kv, shape, fan_in, dtype)
        g = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1)))  # norm over (K, Cin)
        return {"v": v, "g": g}
    return {"w": torch_conv_uniform(key, shape, fan_in, dtype)}


def conv_weight(params):
    """Materialize the effective (K, Cin, Cout) kernel from params."""
    if "w" in params:
        return params["w"]
    v = params["v"]
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
    return params["g"][None, None, :] * v / norm


def conv1d_init(
    key,
    in_ch: int,
    out_ch: int,
    kernel_size: int,
    bias: bool = True,
    use_weight_norm: bool = False,
    dtype=jnp.float32,
):
    kw, kb = jax.random.split(key)
    params = _init_kernel(kw, kernel_size, in_ch, out_ch, use_weight_norm, dtype)
    if bias:
        params["b"] = torch_conv_uniform(kb, (out_ch,), in_ch * kernel_size, dtype)
    return params


def conv1d(
    params,
    x,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    precision: Optional[lax.Precision] = None,
):
    """x: (B, T, Cin) -> (B, T', Cout); `padding` is symmetric like torch."""
    w = conv_weight(params)
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMENSION_NUMBERS,
        precision=precision,
        preferred_element_type=x.dtype,
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def conv_transpose1d_init(
    key,
    in_ch: int,
    out_ch: int,
    kernel_size: int,
    bias: bool = True,
    use_weight_norm: bool = False,
    dtype=jnp.float32,
):
    # torch ConvTranspose1d weight is (Cin, Cout, K) with fan_in = Cout*K for
    # the default init; we store (K, Cout, Cin) -> use as flipped regular conv.
    kw, kb = jax.random.split(key)
    fan_in = out_ch * kernel_size
    shape = (kernel_size, out_ch, in_ch)  # (K, "in"=Cout, "out"=Cin) pre-flip
    if use_weight_norm:
        kv, _ = jax.random.split(kw)
        v = kaiming_normal(kv, shape, in_ch * kernel_size, dtype)
        g = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1)))
        params = {"v": v, "g": g}
    else:
        params = {"w": torch_conv_uniform(kw, shape, fan_in, dtype)}
    if bias:
        params["b"] = torch_conv_uniform(kb, (out_ch,), fan_in, dtype)
    return params


def conv_transpose1d(
    params,
    x,
    stride: int = 1,
    padding: int = 0,
    precision: Optional[lax.Precision] = None,
):
    """Transposed conv matching torch ConvTranspose1d output length
    ``(T-1)*stride - 2*padding + K``.

    Implemented as an input-dilated regular convolution with the spatially
    flipped kernel — the standard XLA lowering, which the TPU backend fuses
    onto the MXU (no scatter).
    """
    w = params_weight = conv_weight(params)  # (K, Cout, Cin) storage
    k = w.shape[0]
    # flip spatial axis; treat stored ("in"=Cout) as conv output channels.
    w_flipped = jnp.flip(params_weight, axis=0).transpose(0, 2, 1)  # (K, Cin, Cout)
    pad = k - 1 - padding
    y = lax.conv_general_dilated(
        x,
        w_flipped.astype(x.dtype),
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMENSION_NUMBERS,
        precision=precision,
        preferred_element_type=x.dtype,
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y
