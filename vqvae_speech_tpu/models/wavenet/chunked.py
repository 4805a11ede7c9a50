"""Resumable chunked AR WaveNet decode for continuous-batching serving.

The bucketed AR server (serve.py:BucketedSynthesisServer) compiles one
whole-utterance scan per (bucket, batch): every request in a launch rides
the full T of its bucket, so mixed-length batches pay head-of-line blocking
and bucket padding, and a queued request waits for the whole current launch.
Continuous batching — the LLM-serving idea, applied to the WaveNet decode
loop the reference runs one Python step at a time
(reference src/wavenet_vocoder/wavenet.py:266-395) — instead keeps B
device-resident decode SLOTS and advances all of them K samples per
compiled launch; requests join and retire at chunk boundaries, so the batch
stays full under mixed-length traffic.

TPU-idiomatic mechanics (and one measured lesson):

* ONE compiled program for the server's lifetime (static (B, K) shapes);
  admission is a donated ``.at[slot]`` update of the state arrays, never a
  recompile;
* **shared global clock.**  A first implementation carried a per-slot clock
  and indexed every ring buffer with per-slot positions — which lowers to
  real gathers/scatters in all ``layers`` buffers every step and measured
  ~100x slower than the whole-utterance scan on TPU.  Instead the server
  keeps ONE global clock ``g``; every slot's ring position is the shared
  scalar ``mod(g, L)`` (fast dynamic slices, identical to the standalone
  scan), and per-slot-ness reduces to an admission offset ``start (B,)``:
  causal masking uses the slot's age ``g - lag >= start`` and conditioning
  rows are fetched with ONE ``take_along_axis`` per step at the slot-local
  time ``g - start``.  Ring semantics are phase-invariant, so the math is
  bit-identical to a slot-local clock;
* per-slot PRNG chains — a request's sampled stream is a function of its
  own admission key and slot-local step only, independent of batch
  composition (the bucketed server's shared-key categorical is
  composition-dependent by construction);
* conditioning is upsampled + projected to per-layer gate rows at ADMISSION
  at batch 1 — exactly the standalone hoisting
  (incremental.py:hoist_conditioning) — so a slot's stream is bit-identical
  to a standalone batch-1 greedy decode of the same request.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp

from vqvae_speech_tpu.models.wavenet.model import (
    WaveNetConfig, _upsample_lc)
from vqvae_speech_tpu.models.wavenet.incremental import (
    _block_matmul, cast_floating, hoist_conditioning,
    prepare_decode_weights)
from vqvae_speech_tpu.models.wavenet.mixture import (
    sample_from_discretized_mix_logistic)

__all__ = ["init_decode_slots", "admit_slot", "decode_chunk",
           "slot_conditioning"]


def init_decode_slots(params, cfg: WaveNetConfig, slots: int, max_t: int,
                      compute_dtype=None, weight_quant=None):
    """Build the device-resident server state.

    Returns ``(prep, state)``:
    prep  — prepared (weight-norm-materialized, optionally int8) weights,
            uploaded once and shared by every chunk launch;
    state — per-slot arrays: ``x`` (B, in_ch) next input, ``g`` () shared
            clock, ``start`` (B,) per-slot admission clock, ``keys`` (B, 2)
            per-slot PRNG chains, ``bufs`` per-layer ring buffers, and
            ``cond`` (B, max_t, layers, gate) pre-projected conditioning
            rows (zeros until admission; absent when unconditioned).
    """
    params = cast_floating(params, compute_dtype)
    act_dtype = params["first_conv"]["b"].dtype
    prep = prepare_decode_weights(params, cfg, weight_quant=weight_quant)

    in_ch = 1 if cfg.scalar_input else cfg.out_channels
    x0 = jnp.zeros((slots, in_ch), act_dtype)
    if not cfg.scalar_input:
        x0 = x0.at[:, 127].set(1.0)   # mulaw mid bin (reference :345-348)
    bufs = []
    for layer in range(cfg.layers):
        L = (cfg.kernel_size - 1) * cfg.dilation(layer)
        bufs.append(jnp.zeros((slots, max(L, 1), cfg.residual_channels),
                              act_dtype))
    state = {
        "x": x0,
        "g": jnp.zeros((), jnp.int32),
        "start": jnp.zeros((slots,), jnp.int32),
        "keys": jnp.zeros((slots, 2), jnp.uint32),
        "bufs": tuple(bufs),
    }
    if cfg.cin_channels > 0 or cfg.gin_channels > 0:
        state["cond"] = jnp.zeros(
            (slots, max_t, cfg.layers, cfg.gate_channels), act_dtype)
    return prep, state


@partial(jax.jit, static_argnames=("cfg", "max_t", "compute_dtype"))
def slot_conditioning(params, cfg: WaveNetConfig, c, g, max_t: int,
                      compute_dtype=None):
    """Per-layer conditioning rows for ONE request.

    c: (max_frames, cin) local conditioning zero-PADDED to the server's
    frame capacity (static shape — one compiled program serves every
    admission; the subpixel upsamplers draw exactly one input frame per
    output, so padding never leaks into the true range) or None; g: scalar
    speaker id or None.  Upsamples and projects at batch 1 — the same
    hoisting the standalone scan performs — returns (max_t, layers, gate).
    """
    params = cast_floating(params, compute_dtype)
    act_dtype = params["first_conv"]["b"].dtype
    if c is not None:
        c = jnp.asarray(c)[None].astype(act_dtype)
        if cfg.upsample_conditional_features:
            c = _upsample_lc(params, c, cfg)
        c = c[:, :max_t]
    g = None if g is None else jnp.asarray([g], jnp.int32)
    T = int(c.shape[1]) if c is not None else max_t
    assert T <= max_t, (T, max_t)
    cond = hoist_conditioning(params, cfg, c, g, 1, T)
    rows = []
    for ct in cond:
        if ct is None:
            ct = jnp.zeros((1, T, cfg.gate_channels), act_dtype)
        rows.append(ct)
    out = jnp.stack([r[0] for r in rows], axis=1)     # (T, layers, gate)
    if T < max_t:
        out = jnp.pad(out, ((0, max_t - T), (0, 0), (0, 0)))
    return out


@partial(jax.jit, donate_argnums=(0,))
def admit_slot(state, slot, cond_rows, key):
    """Admit a request into slot ``slot``: pin its admission clock to the
    shared clock, seed its PRNG chain, reset its next-input, and install
    its conditioning rows.  Ring buffers need no reset — causal masking by
    slot age (g - lag >= start) makes pre-admission rows unreadable.
    Donated: updates happen in place on the server state."""
    x = state["x"].at[slot].set(0.0)
    if state["x"].shape[-1] > 1:                        # one-hot input mode
        x = x.at[slot, 127].set(1.0)
    new = {
        "x": x,
        "g": state["g"],
        "start": state["start"].at[slot].set(state["g"]),
        "keys": state["keys"].at[slot].set(key),
        "bufs": state["bufs"],
    }
    if "cond" in state:
        new["cond"] = state["cond"].at[slot].set(cond_rows)
    return new


@partial(jax.jit, donate_argnums=(1,),
         static_argnames=("cfg", "K", "sample", "log_scale_min"))
def decode_chunk(prep, state, cfg: WaveNetConfig, K: int,
                 sample: bool = True, log_scale_min: float = -50.0):
    """Advance every slot K samples.  Returns ``(new_state, emitted)`` with
    emitted (B, K) int32 bins (or float samples for scalar_input); the
    caller slices each slot's span by its own progress (g - start).  State
    is donated — the launch updates the server state in place."""
    max_t = state["cond"].shape[1] if "cond" in state else None
    start = state["start"]

    def step(carry, _):
        x_in, bufs, g, keys = carry
        if sample:
            keys2 = jax.vmap(jax.random.split)(keys)    # (B, 2, 2)
            keys_next, k_sample = keys2[:, 0], keys2[:, 1]
        else:
            keys_next = keys
        x = x_in @ prep["w_first"] + prep["b_first"]

        cond_all = None
        if max_t is not None:
            tc = jnp.clip(g - start, 0, max_t - 1)      # (B,) slot-local t
            cond_all = jnp.take_along_axis(
                state["cond"], tc[:, None, None, None], axis=1)[:, 0]
            # (B, layers, gate)

        skips = None
        new_bufs = []
        k = cfg.kernel_size
        for layer, lw in enumerate(prep["layers"]):
            d = cfg.dilation(layer)
            buf = bufs[layer]
            L = buf.shape[1]
            w = lw["conv_w"]
            blockq = "conv_w_bscale" in lw
            quant = w.dtype == jnp.int8 and not blockq

            def tap_mm(v, j, w=w, lw=lw, blockq=blockq, quant=quant):
                if blockq:
                    return _block_matmul(v, w[j], lw["conv_w_bscale"][j],
                                         v.dtype)
                return v @ (w[j].astype(v.dtype) if quant else w[j])

            acc = tap_mm(x, k - 1)
            for j in range(k - 1):
                lag = (k - 1 - j) * d
                # SHARED ring position: a plain dynamic slice, like the
                # standalone scan — not a per-slot gather
                tap = jax.lax.dynamic_index_in_dim(
                    buf, jnp.mod(g - lag, L), axis=1, keepdims=False)
                # causal mask by slot age: rows written before this slot's
                # admission (or before generation started) read as zero
                alive = (g - lag >= start)[:, None]
                tap = jnp.where(alive, tap, jnp.zeros_like(tap))
                acc = acc + tap_mm(tap, j)
            if quant:
                acc = (acc * lw["conv_w_scale"]).astype(x.dtype)
            acc = acc + lw["conv_b"]
            if cond_all is not None:
                acc = acc + cond_all[:, layer]
            a, b = jnp.split(acc, 2, axis=-1)
            h = jnp.tanh(a) * jax.nn.sigmoid(b)

            def mm(v, key_, lw=lw):
                wk = lw[key_]
                if key_ + "_bscale" in lw:
                    return _block_matmul(v, wk, lw[key_ + "_bscale"],
                                         v.dtype)
                if wk.dtype == jnp.int8:
                    y = jnp.dot(v, wk.astype(v.dtype),
                                preferred_element_type=jnp.float32)
                    return (y * lw[key_ + "_scale"]).astype(v.dtype)
                return v @ wk

            skip = mm(h, "skip_w") + lw["skip_b"]
            out_l = mm(h, "out_w") + lw["out_b"]
            new_bufs.append(jax.lax.dynamic_update_index_in_dim(
                buf, x, jnp.mod(g, L), axis=1))
            x = (out_l + x) * math.sqrt(0.5)
            if skips is None:
                skips = skip
            else:
                skips = skips + skip
                if cfg.legacy:
                    skips = skips * math.sqrt(0.5)

        out = jax.nn.relu(skips)
        out = jax.nn.relu(out @ prep["w_last1"] + prep["b_last1"])
        # logits in f32 regardless of compute dtype (stable sampling)
        out = (out @ prep["w_last2"] + prep["b_last2"]).astype(jnp.float32)

        if cfg.scalar_input:
            if sample:
                nxt = jax.vmap(
                    lambda kk, o: sample_from_discretized_mix_logistic(
                        kk, o[None, None, :], log_scale_min)[0, 0]
                )(k_sample, out)
            else:
                nxt = out[:, 0]
            next_in = nxt[:, None].astype(x_in.dtype)
            emitted = nxt.astype(jnp.float32)
        else:
            if sample:
                idx = jax.vmap(jax.random.categorical)(k_sample, out)
            else:
                idx = jnp.argmax(out, axis=-1)
            next_in = jax.nn.one_hot(idx, cfg.out_channels,
                                     dtype=x_in.dtype)
            emitted = idx.astype(jnp.int32)
        return (next_in, tuple(new_bufs), g + 1, keys_next), emitted

    carry = (state["x"], state["bufs"], state["g"], state["keys"])
    (x, bufs, g, keys), emitted = jax.lax.scan(step, carry, None, length=K)
    new_state = {"x": x, "bufs": bufs, "g": g, "start": start,
                 "keys": keys}
    if "cond" in state:
        new_state["cond"] = state["cond"]
    return new_state, jnp.swapaxes(emitted, 0, 1)
