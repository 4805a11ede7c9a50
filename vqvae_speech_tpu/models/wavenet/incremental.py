"""Autoregressive WaveNet decode as a single on-device `lax.scan`.

The reference's fast-generation path is a T-step Python loop that runs every
layer's ring-buffer conv with `F.linear`, then round-trips to the CPU for
`np.random.choice` sampling EVERY sample
(reference src/wavenet_vocoder/wavenet.py:266-395 and
src/wavenet_vocoder/conv.py:43-72).  Here the whole generation is ONE compiled
scan:

* per-layer circular buffers in the scan carry (capacity ``(k-1)*dilation``),
  written/read with dynamic slices — no per-step shifting,
* the local-conditioning 1x1 projections are hoisted OUT of the loop: one
  big MXU matmul over all T steps before the scan (the reference re-projects
  c every step), and the global-conditioning projection is computed once,
* on-device sampling with `jax.random` (categorical or discretized
  mix-logistic) — zero host syncs for the entire utterance.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp

from vqvae_speech_tpu.nn.conv import conv1d, conv_weight
from vqvae_speech_tpu.models.wavenet.model import (
    WaveNetConfig, _upsample_lc, _expand_global)
from vqvae_speech_tpu.models.wavenet.mixture import (
    sample_from_discretized_mix_logistic)


def _init_buffers(cfg: WaveNetConfig, B, dtype):
    bufs = []
    for layer in range(cfg.layers):
        L = (cfg.kernel_size - 1) * cfg.dilation(layer)
        bufs.append(jnp.zeros((B, max(L, 1), cfg.residual_channels), dtype))
    return bufs


def _quantize_int8(w, axes):
    """Weight-only int8: per-output-channel absmax scales over ``axes``.

    Exact factorization: w == w_i8 * scale broadcast on the last axis, so
    ``x @ w == (x @ w_i8) * scale`` — the matmul reads int8 from HBM (4x less
    traffic than f32) and the scale applies to the tiny output row.
    """
    absmax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale.reshape(1, -1).astype(jnp.float32)


INT8_BLOCK = 128  # one MXU contraction pass


def _quantize_int8_block(w):
    """Blockwise weight-only int8: absmax scales per (128-input-block,
    output channel) on the LAST TWO axes of ``w`` — i.e. per (tap, block,
    out) for a (k, C, G) conv kernel, per (block, out) for a 2-D
    projection.  ~2x lower quantization error than per-output scales
    (measured: rel-RMS 0.023 -> 0.011 at vctk conv shapes) at the same HBM
    traffic: the MXU processes a C=768 contraction as 6 chained 128-passes
    either way, so the blockwise partial sums are free — only the (tiny)
    per-block scale multiplies are added.

    Input dim must divide by 128 (true for every channel width in this
    framework: 768/1536/256/128); callers fall back to `_quantize_int8`
    otherwise.
    """
    C = w.shape[-2]
    block = INT8_BLOCK if C % INT8_BLOCK == 0 else C
    nb = C // block
    wb = w.reshape(w.shape[:-2] + (nb, block, w.shape[-1]))
    absmax = jnp.max(jnp.abs(wb), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    w_i8 = jnp.clip(jnp.round(wb / scale), -127, 127).astype(jnp.int8)
    # weights stay in the dense (…, C, G) layout (same HBM bytes); scales
    # are (…, nb, G)
    return (w_i8.reshape(w.shape),
            scale.squeeze(-2).astype(jnp.float32))


def _block_matmul(x, w_i8, scale, out_dtype):
    """x (B, C) @ blockwise-quantized w (C, G): per-block partial matmuls,
    each dequantized by its own (G,) scale row, then summed."""
    B, C = x.shape
    nb = scale.shape[0]
    xb = x.reshape(B, nb, C // nb)
    wb = w_i8.reshape(nb, C // nb, -1).astype(x.dtype)
    partial = jnp.einsum("bnk,nkg->nbg", xb, wb,
                         preferred_element_type=jnp.float32)
    return jnp.einsum("nbg,ng->bg", partial, scale).astype(out_dtype)


def _mm(x, lw, key):
    """x @ lw[key], dequantizing on the fly for int8-quantized weights."""
    w = lw[key]
    if key + "_bscale" in lw:
        return _block_matmul(x, w, lw[key + "_bscale"], x.dtype)
    if w.dtype == jnp.int8:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * lw[key + "_scale"]).astype(x.dtype)
    return x @ w


def cast_floating(params, compute_dtype):
    """Cast every floating leaf to ``compute_dtype`` (weight-streaming dtype)."""
    if compute_dtype is None:
        return params
    return jax.tree_util.tree_map(
        lambda v: v.astype(compute_dtype)
        if jnp.issubdtype(v.dtype, jnp.floating) else v, params)


def hoist_conditioning(params, cfg: WaveNetConfig, c, g, B, T):
    """Pre-project local+global conditioning to per-layer gate rows.

    One big MXU matmul over all T steps per layer, instead of the
    reference's per-step re-projection (wavenet.py:335-346).  ``c`` must
    already be upsampled/trimmed to (B, T, cin).  Returns a list with one
    (B, T, gate) array (or None) per layer.
    """
    g_b1c = _expand_global(params, g, B, 1, cfg)
    cond = []
    for p in params["conv_layers"]:
        ct = None
        if c is not None and "conv1x1c" in p:
            ct = conv1d(p["conv1x1c"], c)              # (B, T, gate)
        if g_b1c is not None and "conv1x1g" in p:
            gh = conv1d(p["conv1x1g"], g_b1c)[:, 0]     # (B, gate)
            ct = gh[:, None, :] + ct if ct is not None else \
                jnp.broadcast_to(gh[:, None, :], (B, T, gh.shape[-1]))
        cond.append(ct)  # (B, T, gate) or None
    return cond


def prepare_decode_weights(params, cfg: WaveNetConfig, weight_quant=None):
    """Materialize all weight-norm kernels ONCE (outside the scan body),
    optionally int8-quantizing the GLU-stack weights (weight-only).

    ``weight_quant='int8'`` — per-output-channel scales (the round-2 path);
    ``'int8_block'`` — scales per (tap, 128-input-block, output): ~2x lower
    quantization error at the same HBM traffic (the MXU chains 128-wide
    contraction passes either way)."""
    assert weight_quant in (None, "int8", "int8_block"), weight_quant
    prep = {"w_first": conv_weight(params["first_conv"])[0],
            "b_first": params["first_conv"]["b"],
            "w_last1": conv_weight(params["last_conv_1"])[0],
            "b_last1": params["last_conv_1"]["b"],
            "w_last2": conv_weight(params["last_conv_2"])[0],
            "b_last2": params["last_conv_2"]["b"]}
    layer_weights = []
    for p in params["conv_layers"]:
        lw = {"conv_w": conv_weight(p["conv"]), "conv_b": p["conv"]["b"],
              "skip_w": conv_weight(p["conv1x1_skip"])[0],
              "skip_b": p["conv1x1_skip"]["b"],
              "out_w": conv_weight(p["conv1x1_out"])[0],
              "out_b": p["conv1x1_out"]["b"]}
        if weight_quant == "int8":
            lw["conv_w"], lw["conv_w_scale"] = _quantize_int8(
                lw["conv_w"], axes=(0, 1))
            lw["skip_w"], lw["skip_w_scale"] = _quantize_int8(
                lw["skip_w"], axes=(0,))
            lw["out_w"], lw["out_w_scale"] = _quantize_int8(
                lw["out_w"], axes=(0,))
        elif weight_quant == "int8_block":
            lw["conv_w"], lw["conv_w_bscale"] = _quantize_int8_block(
                lw["conv_w"])
            lw["skip_w"], lw["skip_w_bscale"] = _quantize_int8_block(
                lw["skip_w"])
            lw["out_w"], lw["out_w_bscale"] = _quantize_int8_block(
                lw["out_w"])
        layer_weights.append(lw)
    prep["layers"] = tuple(layer_weights)
    return prep


def _step_layer(lw, x_t, buf, t, cond_t, cfg: WaveNetConfig, dilation):
    """One GLU layer at one timestep.

    lw: dict of pre-materialized layer weights; x_t: (B, C_res) current
    input; buf: (B, L, C_res) circular history (slot s holds the most recent
    x with time ≡ s mod L); cond_t: (B, gate) pre-projected local+global
    conditioning at t, or None.
    Returns (out (B, C_res), skip (B, C_skip), new_buf).
    """
    k = cfg.kernel_size
    L = buf.shape[1]
    w = lw["conv_w"]                    # (k, C_res, gate)
    blockq = "conv_w_bscale" in lw
    quant = w.dtype == jnp.int8 and not blockq

    def tap_mm(v, j):
        if blockq:          # per-tap dequant with per-block scales
            return _block_matmul(v, w[j], lw["conv_w_bscale"][j], v.dtype)
        return v @ (w[j].astype(v.dtype) if quant else w[j])

    # taps: x[t - (k-1-j)*d] for j = 0..k-1 (j = k-1 is the current input)
    acc = tap_mm(x_t, k - 1)
    for j in range(k - 1):
        lag = (k - 1 - j) * dilation
        slot = jnp.mod(t - lag, L)
        tap = jax.lax.dynamic_index_in_dim(buf, slot, axis=1, keepdims=False)
        # zero history before generation started
        tap = jnp.where(t - lag >= 0, tap, jnp.zeros_like(tap))
        acc = acc + tap_mm(tap, j)
    if quant:
        acc = (acc * lw["conv_w_scale"]).astype(x_t.dtype)
    acc = acc + lw["conv_b"]
    if cond_t is not None:
        acc = acc + cond_t
    a, b = jnp.split(acc, 2, axis=-1)
    h = jnp.tanh(a) * jax.nn.sigmoid(b)
    skip = _mm(h, lw, "skip_w") + lw["skip_b"]
    out = _mm(h, lw, "out_w") + lw["out_b"]
    new_buf = jax.lax.dynamic_update_index_in_dim(
        buf, x_t, jnp.mod(t, L), axis=1)
    return (out + x_t) * math.sqrt(0.5), skip, new_buf


@partial(jax.jit, static_argnames=("cfg", "T", "sample", "compute_dtype",
                                   "weight_quant", "use_fused_stack"))
def wavenet_incremental_generate(params, cfg: WaveNetConfig, rng, T: int,
                                 c=None, g=None, initial_input=None,
                                 sample: bool = True,
                                 log_scale_min: float = -50.0,
                                 compute_dtype=None,
                                 weight_quant: str = None,
                                 use_fused_stack: bool = False):
    """Generate T samples autoregressively.

    c: (B, Tc, cin) local conditioning (upsampled here when configured);
    g: (B,) speaker ids.  Returns (outputs (B, T, out_channels),
    sampled (B, T) int32 bins or (B, T) floats for scalar_input).

    Batch-1 decode is bound by streaming the layer stack from HBM every
    step.  ``compute_dtype=jnp.bfloat16`` halves that traffic; additionally
    ``weight_quant='int8'`` stores the GLU-stack weights as int8 with
    per-output-channel scales (weight-only quantization — activations and
    logits stay high precision), quartering the traffic vs f32 and pushing
    single-stream synthesis past the bf16 streaming floor.  Batch multiple
    utterances to amortize the weight reads for serving throughput.
    """
    assert weight_quant in (None, "int8", "int8_block"), weight_quant
    if use_fused_stack:
        # Pallas fused GLU layer stack (ops/wavenet_step.py), f32 only.
        # An int8 composition was built and measured in rounds 1-2 and
        # REMOVED: the plain int8 scan already runs at ~95% of the HBM
        # weight-streaming floor (RESULTS.md roofline), so the kernel's
        # grid overhead can only lose — use weight_quant='int8' alone for
        # the fastest single-stream decode.
        assert compute_dtype is None
        assert weight_quant is None, (
            "use_fused_stack composes with f32 only; the int8 scan path is "
            "already at the weight-streaming floor (see RESULTS.md)")
    params = cast_floating(params, compute_dtype)
    # activation dtype follows the parameters
    act_dtype = params["first_conv"]["b"].dtype
    if c is not None:
        c = c.astype(act_dtype)
    if c is not None:
        B = c.shape[0]
        if cfg.upsample_conditional_features:
            c = _upsample_lc(params, c, cfg)
        assert c.shape[1] >= T
        c = c[:, :T]
    else:
        B = 1 if initial_input is None else initial_input.shape[0]

    # Hoist conditioning projections out of the scan: one matmul over all T.
    cond = hoist_conditioning(params, cfg, c, g, B, T)
    # stack layers with conditioning into one scanned array where present
    have_cond = [ct is not None for ct in cond]
    cond_stack = (jnp.stack([ct for ct in cond if ct is not None], axis=0)
                  if any(have_cond) else None)  # (Lc, B, T, gate)

    in_ch = 1 if cfg.scalar_input else cfg.out_channels
    dtype = act_dtype
    if initial_input is None:
        x0 = jnp.zeros((B, in_ch), dtype)
        if not cfg.scalar_input:
            x0 = x0.at[:, 127].set(1.0)  # mulaw mid bin (reference :345-348)
    else:
        x0 = initial_input.reshape(B, in_ch).astype(dtype)

    # Materialize all weight-norm kernels ONCE (outside the scan body).
    prep = prepare_decode_weights(params, cfg, weight_quant=weight_quant)
    w_first, b_first = prep["w_first"], prep["b_first"]
    w_last1, b_last1 = prep["w_last1"], prep["b_last1"]
    w_last2, b_last2 = prep["w_last2"], prep["b_last2"]
    layer_weights = prep["layers"]
    fused_w = None
    if use_fused_stack:
        fused_w = {
            "wtap": jnp.stack([lw["conv_w"] for lw in layer_weights]),
            "bias": jnp.stack([lw["conv_b"] for lw in layer_weights]),
            "wskip": jnp.stack([lw["skip_w"] for lw in layer_weights]),
            "bskip": jnp.stack([lw["skip_b"] for lw in layer_weights]),
            "wout": jnp.stack([lw["out_w"] for lw in layer_weights]),
            "bout": jnp.stack([lw["out_b"] for lw in layer_weights]),
        }
    def step(carry, t):
        x_in, bufs, key = carry
        key, k_sample = jax.random.split(key)
        x = x_in @ w_first + b_first
        if use_fused_stack:
            from vqvae_speech_tpu.ops.wavenet_step import fused_glu_stack_step

            k = cfg.kernel_size
            # gather every layer's history taps up front (independent reads)
            taps = []
            for layer in range(cfg.layers):
                d = cfg.dilation(layer)
                L = bufs[layer].shape[1]
                row = []
                for j in range(k - 1):
                    lag = (k - 1 - j) * d
                    tap = jax.lax.dynamic_index_in_dim(
                        bufs[layer], jnp.mod(t - lag, L), axis=1,
                        keepdims=False)
                    row.append(jnp.where(t - lag >= 0, tap,
                                         jnp.zeros_like(tap)))
                taps.append(jnp.stack(row))
            taps = jnp.stack(taps)                       # (L, k-1, B, C)
            cond_rows = []
            ci = 0
            for layer in range(cfg.layers):
                if have_cond[layer]:
                    cond_rows.append(cond_stack[ci, :, t])
                    ci += 1
                else:
                    cond_rows.append(
                        jnp.zeros((B, cfg.gate_channels), x.dtype))
            cond_all = jnp.stack(cond_rows)              # (L, B, gate)
            x, skips, x_all = fused_glu_stack_step(
                x, taps, cond_all, fused_w["wtap"], fused_w["bias"],
                fused_w["wskip"], fused_w["bskip"], fused_w["wout"],
                fused_w["bout"], legacy=cfg.legacy)
            new_bufs = [
                jax.lax.dynamic_update_index_in_dim(
                    bufs[layer], x_all[layer],
                    jnp.mod(t, bufs[layer].shape[1]), axis=1)
                for layer in range(cfg.layers)]
        else:
            skips = None
            new_bufs = []
            ci = 0
            for layer, lw in enumerate(layer_weights):
                if have_cond[layer]:
                    cond_t = cond_stack[ci, :, t]
                    ci += 1
                else:
                    cond_t = None
                x, h, nb = _step_layer(lw, x, bufs[layer], t, cond_t, cfg,
                                       cfg.dilation(layer))
                new_bufs.append(nb)
                if skips is None:
                    skips = h
                else:
                    skips = skips + h
                    if cfg.legacy:
                        skips = skips * math.sqrt(0.5)
        out = jax.nn.relu(skips)
        out = jax.nn.relu(out @ w_last1 + b_last1)
        # logits in f32 regardless of compute dtype (stable sampling)
        out = (out @ w_last2 + b_last2).astype(jnp.float32)

        if cfg.scalar_input:
            if sample:
                nxt = sample_from_discretized_mix_logistic(
                    k_sample, out[:, None, :], log_scale_min)[:, 0]
            else:
                nxt = out[:, 0]
            next_in = nxt[:, None]
            emitted = nxt
        else:
            if sample:
                idx = jax.random.categorical(k_sample, out, axis=-1)
            else:
                idx = jnp.argmax(out, axis=-1)
            next_in = jax.nn.one_hot(idx, cfg.out_channels, dtype=x_in.dtype)
            emitted = idx.astype(jnp.int32)
        return (next_in, new_bufs, key), (out, emitted)

    bufs = _init_buffers(cfg, B, x0.dtype)
    (_, _, _), (outs, emitted) = jax.lax.scan(
        step, (x0, bufs, rng), jnp.arange(T))
    # scan stacks on axis 0: (T, B, ...) -> (B, T, ...)
    return jnp.swapaxes(outs, 0, 1), jnp.swapaxes(emitted, 0, 1)
