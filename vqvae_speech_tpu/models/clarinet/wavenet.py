"""ClariNet Gaussian WaveNet teacher (mean + log_std output).

Capability-parity with reference src/clarinet/wavenet.py:30-127: front causal
conv (kernel 32) + num_blocks x num_layers gated ResBlocks with dilation
``kernel_size**n`` + ReLU/1x1 head with out_channels=2 (mean, log_std), and
LC upsampling (16x16 = hop 256).

The reference's `generate` re-runs the FULL receptive-field window per sample
on the batch path (src/clarinet/wavenet.py:83-103 — O(T * R) work with a
GPU->CPU sync per sample).  The TPU re-design generates with one `lax.scan`
over per-layer ring buffers and on-device Gaussian sampling — O(T) work, zero
host syncs.
"""
import math
from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from vqvae_speech_tpu.models.clarinet.modules import (
    conv_init, conv_apply, resblock_init, resblock_apply,
    upsample_init, upsample_apply)
from vqvae_speech_tpu.nn.conv import conv_weight


@dataclass(frozen=True)
class GaussianWaveNetConfig:
    out_channels: int = 2
    num_blocks: int = 4
    num_layers: int = 6
    front_channels: int = 32       # front conv kernel size (reference :47)
    residual_channels: int = 128
    gate_channels: int = 256
    skip_channels: int = 128
    kernel_size: int = 3
    cin_channels: int = 80
    upsample_scales: Sequence[int] = (16, 16)
    causal: bool = True

    def dilation(self, i):
        return self.kernel_size ** (i % self.num_layers)

    @property
    def total_layers(self):
        return self.num_blocks * self.num_layers

    def receptive_field_size(self):
        dil = [self.dilation(i) for i in range(self.total_layers)]
        return (self.kernel_size - 1) * sum(dil) + self.front_channels


def gaussian_wavenet_init(key, cfg: GaussianWaveNetConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.total_layers + 4)
    return {
        "front_conv": conv_init(ks[0], 1, cfg.residual_channels,
                                cfg.front_channels, dtype),
        "res_blocks": [
            resblock_init(ks[1 + i], cfg.residual_channels,
                          cfg.gate_channels, cfg.skip_channels,
                          cfg.kernel_size, cfg.cin_channels, dtype)
            for i in range(cfg.total_layers)],
        "final_conv_1": conv_init(ks[-3], cfg.skip_channels,
                                  cfg.skip_channels, 1, dtype),
        "final_conv_2": conv_init(ks[-2], cfg.skip_channels,
                                  cfg.out_channels, 1, dtype),
        "upsample_conv": upsample_init(ks[-1], cfg.upsample_scales, dtype),
    }


def gaussian_wavenet_upsample(params, c, cfg: GaussianWaveNetConfig):
    return upsample_apply(params["upsample_conv"], c, cfg.upsample_scales)


def gaussian_wavenet_core(params, cfg: GaussianWaveNetConfig, x, c_up):
    """x: (B, T, 1) waveform; c_up: (B, T, cin) upsampled conditioning."""
    h = jax.nn.relu(conv_apply(params["front_conv"], x, cfg.front_channels,
                               causal=cfg.causal))
    skip = 0.0
    for i, p in enumerate(params["res_blocks"]):
        h, s = resblock_apply(p, h, c_up, cfg.kernel_size, cfg.dilation(i),
                              cfg.causal)
        skip = skip + s
    out = jax.nn.relu(skip)
    out = jax.nn.relu(conv_apply(params["final_conv_1"], out, 1))
    return conv_apply(params["final_conv_2"], out, 1)


def gaussian_wavenet_apply(params, cfg: GaussianWaveNetConfig, x, c):
    """Upsample c then run the core (reference forward, wavenet.py:77-80)."""
    c_up = gaussian_wavenet_upsample(params, c, cfg)
    return gaussian_wavenet_core(params, cfg, x, c_up)


def gaussian_wavenet_core_fused(params, cfg: GaussianWaveNetConfig, x, c_up,
                                tile=2048, interpret=False):
    """Batch-1 core with every ``num_layers``-deep resblock chain fused into
    one Pallas launch (ops/fused_resblock.py, tiled form: constant VMEM at
    any T, zero recompute).  Front conv and the two head 1x1s — a rounding
    error of the FLOPs — stay XLA.  Skip accumulation runs in f32 inside
    the kernel (the XLA path accumulates in the compute dtype), so under
    bf16 serving this path is slightly MORE precise, not less.

    Measured (fused_resblock_bench/summary.json): 1.216x over the XLA conv
    chain at batch 1, the IAF student's latency-bound serving case.
    Reference structure: src/clarinet/wavenet.py:30-127 stacked per
    src/clarinet/wavenet_iaf.py:30-126.
    """
    from vqvae_speech_tpu.ops.fused_resblock import (
        fused_block_chain_tiled, stack_block_weights)

    if x.shape[0] != 1:
        raise ValueError("fused core is the batch-1 (single-stream) path; "
                         f"got batch {x.shape[0]}")
    if not cfg.causal:
        raise ValueError("fused core implements the causal chain only")
    h = jax.nn.relu(conv_apply(params["front_conv"], x, cfg.front_channels,
                               causal=cfg.causal))
    nl = cfg.num_layers
    T = h.shape[1]
    # single tile for short inputs; never below the causal-tail minimum
    max_tail = (cfg.kernel_size - 1) * cfg.kernel_size ** (nl - 1)
    tile = max(min(tile, _round_up8(T)), max_tail)
    skip = jnp.zeros((T, cfg.skip_channels), jnp.float32)
    for b in range(cfg.num_blocks):
        stacked = stack_block_weights(
            params["res_blocks"][b * nl:(b + 1) * nl],
            compute_dtype=h.dtype)
        h0, s = fused_block_chain_tiled(
            h[0], c_up[0, :T], stacked, layers=nl,
            kernel_size=cfg.kernel_size, tile=tile, interpret=interpret)
        h = h0[None]
        skip = skip + s
    out = jax.nn.relu(skip[None].astype(x.dtype))
    out = jax.nn.relu(conv_apply(params["final_conv_1"], out, 1))
    return conv_apply(params["final_conv_2"], out, 1)


def _round_up8(n):
    return -(-n // 8) * 8


# -------------------- scan-based autoregressive generation --------------------


@partial(jax.jit, static_argnames=("cfg", "num_samples"))
def gaussian_wavenet_generate(params, cfg: GaussianWaveNetConfig, rng,
                              num_samples: int, c, log_std_min: float = -7.0,
                              scale_factor: float = 1.0):
    """Generate (B, num_samples) waveform from conditioning c (B, Tc, cin).

    Ring-buffer scan replacing the reference's O(T*R) sliding-window loop.
    """
    c_up = gaussian_wavenet_upsample(params, c, cfg)
    B = c_up.shape[0]
    T = num_samples
    assert c_up.shape[1] >= T

    w_front = conv_weight(params["front_conv"])       # (32, 1, C_res)
    b_front = params["front_conv"]["b"]
    w_f1 = conv_weight(params["final_conv_1"])[0]
    b_f1 = params["final_conv_1"]["b"]
    w_f2 = conv_weight(params["final_conv_2"])[0]
    b_f2 = params["final_conv_2"]["b"]

    layer_w = []
    cond_f, cond_g = [], []
    for p in params["res_blocks"]:
        layer_w.append({
            "wf": conv_weight(p["filter_conv"]), "bf": p["filter_conv"]["b"],
            "wg": conv_weight(p["gate_conv"]), "bg": p["gate_conv"]["b"],
            "wr": conv_weight(p["res_conv"])[0], "br": p["res_conv"]["b"],
            "ws": conv_weight(p["skip_conv"])[0], "bs": p["skip_conv"]["b"],
        })
        # hoist conditioning projections: one matmul over all T per layer
        cond_f.append(conv_apply(p["filter_conv_c"], c_up[:, :T], 1))
        cond_g.append(conv_apply(p["gate_conv_c"], c_up[:, :T], 1))
    cond_f = jnp.stack(cond_f)  # (L, B, T, gate)
    cond_g = jnp.stack(cond_g)

    K = cfg.front_channels
    front_buf = jnp.zeros((B, K, 1))  # raw-sample history for the front conv
    bufs = [jnp.zeros((B, (cfg.kernel_size - 1) * cfg.dilation(i),
                       cfg.residual_channels))
            for i in range(cfg.total_layers)]

    def step(carry, t):
        front, bufs, key = carry
        key, k_s = jax.random.split(key)
        # front conv: causal k=K over raw-sample ring buffer
        acc = jnp.zeros((B, w_front.shape[2]))
        for j in range(K):
            lag = K - 1 - j
            slot = jnp.mod(t - lag, K)
            tap = jax.lax.dynamic_index_in_dim(front, slot, axis=1,
                                               keepdims=False)
            tap = jnp.where(t - lag >= 0, tap, jnp.zeros_like(tap))
            acc = acc + tap @ w_front[j]
        h = jax.nn.relu(acc + b_front)

        skip = 0.0
        new_bufs = []
        for i, lw in enumerate(layer_w):
            L = bufs[i].shape[1]
            d = cfg.dilation(i)
            hf = h @ lw["wf"][cfg.kernel_size - 1]
            hg = h @ lw["wg"][cfg.kernel_size - 1]
            for j in range(cfg.kernel_size - 1):
                lag = (cfg.kernel_size - 1 - j) * d
                slot = jnp.mod(t - lag, L)
                tap = jax.lax.dynamic_index_in_dim(bufs[i], slot, axis=1,
                                                   keepdims=False)
                tap = jnp.where(t - lag >= 0, tap, jnp.zeros_like(tap))
                hf = hf + tap @ lw["wf"][j]
                hg = hg + tap @ lw["wg"][j]
            hf = hf + lw["bf"] + cond_f[i, :, t]
            hg = hg + lw["bg"] + cond_g[i, :, t]
            out = jnp.tanh(hf) * jax.nn.sigmoid(hg)
            res = out @ lw["wr"] + lw["br"]
            s = out @ lw["ws"] + lw["bs"]
            new_bufs.append(jax.lax.dynamic_update_index_in_dim(
                bufs[i], h, jnp.mod(t, L), axis=1))
            h = (h + res) * math.sqrt(0.5)
            skip = skip + s

        o = jax.nn.relu(skip)
        o = jax.nn.relu(o @ w_f1 + b_f1)
        o = o @ w_f2 + b_f2                       # (B, 2): mean, log_std
        mean, log_std = o[:, 0], jnp.maximum(o[:, 1], log_std_min)
        sample = mean + jnp.exp(log_std) * jax.random.normal(k_s, mean.shape)
        sample = jnp.clip(sample, -scale_factor, scale_factor)
        # the sample emitted at step t is the waveform input x[t+1]
        new_front = jax.lax.dynamic_update_index_in_dim(
            front, sample[:, None], jnp.mod(t + 1, K), axis=1)
        return (new_front, new_bufs, key), sample

    # note: sample at step t becomes the input at step t+1 via the front
    # ring buffer (x[t] position in the buffer holds the emitted sample).
    (_, _, _), samples = jax.lax.scan(step, (front_buf, bufs, rng),
                                      jnp.arange(T))
    return jnp.swapaxes(samples, 0, 1)
