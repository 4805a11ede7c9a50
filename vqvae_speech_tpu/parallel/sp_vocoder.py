"""Sequence-parallel (time-sharded) vocoder forward over an ICI mesh axis.

SURVEY.md §5 names time-axis ``shard_map`` as the long-context extension the
reference cannot express (its only parallelism is nn.DataParallel,
src/experiments/pipeline_factory.py:61).  For very long utterances the
WaveNet-family forward is a chain of CAUSAL dilated convs, which shard
cleanly over time:

* split T contiguously across the mesh axis,
* each dilated conv needs the previous shard's last ``d*(k-1)`` samples — a
  halo moved right by ONE ``ppermute`` hop per conv (ICI-neighbor traffic,
  no all-gathers),
* the first shard receives zeros from the open ``ppermute`` ring end, which
  is exactly the causal left zero-padding — so the sharded forward equals
  the global forward (tested on the 8-device CPU mesh),
* all 1x1 convs, gates and skip sums are purely local.

Communication per token is O(layers * halo/T_local) — negligible once
T_local >> receptive field; the requirement ``halo <= T_local`` is asserted.
"""
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vqvae_speech_tpu.nn.conv import conv_weight
from vqvae_speech_tpu.models.clarinet.modules import conv_apply


def _halo_causal_conv(p, x, kernel_size, dilation, axis_name, num_shards):
    """Causal dilated conv on a T-sharded (B, T_local, C) block.

    Pulls the left context from the previous shard (zeros on shard 0 ==
    the causal zero pad), then convolves VALID — output is exactly
    (B, T_local, C_out), bit-compatible with the global causal conv.
    """
    halo = dilation * (kernel_size - 1)
    if halo == 0:
        return conv_apply(p, x, kernel_size, dilation)
    if halo > x.shape[1]:
        raise ValueError(
            f"halo {halo} exceeds the local block of {x.shape[1]} samples; "
            f"use fewer shards or longer sequences")
    tail = x[:, x.shape[1] - halo:, :]
    prev = lax.ppermute(tail, axis_name,
                        [(i, i + 1) for i in range(num_shards - 1)])
    xx = jnp.concatenate([prev, x], axis=1)
    w = conv_weight(p)
    y = lax.conv_general_dilated(
        xx, w.astype(xx.dtype), window_strides=(1,), padding=[(0, 0)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=xx.dtype)
    return y + p["b"].astype(y.dtype)


def _sp_resblock(p, x, c, kernel_size, dilation, axis_name, num_shards):
    """Gated ResBlock with halo-exchange dilated convs (the 1x1
    conditioning/res/skip projections are local)."""
    h_f = _halo_causal_conv(p["filter_conv"], x, kernel_size, dilation,
                            axis_name, num_shards)
    h_g = _halo_causal_conv(p["gate_conv"], x, kernel_size, dilation,
                            axis_name, num_shards)
    if c is not None:
        h_f = h_f + conv_apply(p["filter_conv_c"], c, 1)
        h_g = h_g + conv_apply(p["gate_conv_c"], c, 1)
    out = jnp.tanh(h_f) * jax.nn.sigmoid(h_g)
    res = conv_apply(p["res_conv"], out, 1)
    skip = conv_apply(p["skip_conv"], out, 1)
    return (x + res) * math.sqrt(0.5), skip


def sp_gaussian_wavenet_core(params, cfg, x, c_up, mesh, axis: str = "data"):
    """Time-sharded ClariNet teacher core (models/clarinet/wavenet.py:
    gaussian_wavenet_core): x (B, T, 1), c_up (B, T, cin) global arrays,
    T sharded over ``mesh`` axis ``axis``; returns (B, T, out_channels)
    with the same sharding.  Requires T % axis_size == 0 and
    T/axis_size >= the receptive field of the deepest dilation."""
    num_shards = mesh.shape[axis]

    def core(p, x_loc, c_loc):
        h = jax.nn.relu(_halo_causal_conv(
            p["front_conv"], x_loc, cfg.front_channels, 1, axis, num_shards))
        skip = 0.0
        for i, rp in enumerate(p["res_blocks"]):
            h, s = _sp_resblock(rp, h, c_loc, cfg.kernel_size,
                                cfg.dilation(i), axis, num_shards)
            skip = skip + s
        out = jax.nn.relu(skip)
        out = jax.nn.relu(conv_apply(p["final_conv_1"], out, 1))
        return conv_apply(p["final_conv_2"], out, 1)

    seq = P(None, axis, None)
    return shard_map(core, mesh=mesh,
                     in_specs=(P(), seq, seq),
                     out_specs=seq)(params, x, c_up)


def sp_teacher_loss(params, cfg, x, c_up, mesh, axis: str = "data"):
    """Sequence-parallel Gaussian NLL (train/vocoder.py teacher loss) over
    a time-sharded forward — the long-utterance training objective."""
    from vqvae_speech_tpu.models.clarinet.loss import gaussian_loss

    y_hat = sp_gaussian_wavenet_core(params, cfg, x, c_up, mesh, axis)
    return jnp.mean(gaussian_loss(y_hat[:, :-1], x[:, 1:]))
