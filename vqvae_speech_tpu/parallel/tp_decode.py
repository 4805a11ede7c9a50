"""Tensor-parallel (channel-sharded) autoregressive WaveNet decode.

Single-stream AR decode is bound by streaming the GLU layer stack from HBM
every step (RESULTS.md roofline: 95% of the streaming floor at int8).  The
only way past that wall with unchanged numbers-per-weight is MORE HBM — so
this module shards the layer stack over the mesh's ``model`` axis: each
chip streams 1/M of the weights per step and contributes partial skip/res
projections combined with one ``psum`` pair per layer over ICI.

Sharding layout (per GLU layer, reference conv (k, C_res, gate)):

* gate columns are pre-permuted to ``[a_0 b_0 | a_1 b_1 | ...]`` so each
  chip's contiguous shard holds matching tanh/sigmoid halves — the GLU
  nonlinearity needs no communication,
* ``skip_w``/``out_w`` rows (indexed by h = tanh(a)*sig(b)) shard
  naturally; their matmuls produce partials summed with ``psum``,
* the carried sample ``x_t``, ring buffers, first/last convs and sampling
  are replicated (identical on every chip — the psums keep them in sync).

Communication: 2 psums of (B, C_res)/(B, C_skip) per layer per sample —
rides ICI, overlapping the next layer's weight streaming.  Validated for
exactness against the single-device scan on the virtual CPU mesh
(tests/test_parallel.py); real-chip speedup requires a real multi-chip
ICI domain, which this image does not have.

Reference loop being scaled: src/wavenet_vocoder/wavenet.py:266-395.
"""
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vqvae_speech_tpu.nn.conv import conv1d, conv_weight
from vqvae_speech_tpu.models.wavenet.model import (
    WaveNetConfig, _upsample_lc, _expand_global)


def _gate_permutation(gate: int, m: int):
    """Column order [a_0 b_0 | a_1 b_1 | ...]: chip i's contiguous block of
    size gate/m holds the i-th slice of BOTH GLU halves."""
    half = gate // 2
    h = half // m
    order = []
    for i in range(m):
        order.extend(range(i * h, (i + 1) * h))                  # a_i
        order.extend(range(half + i * h, half + (i + 1) * h))    # b_i
    return jnp.asarray(order, jnp.int32)


def prepare_tp_decode(params, cfg: WaveNetConfig, mesh,
                      weight_quant: str = None, axis: str = "model"):
    """One-time host-side preparation for tensor-parallel AR decode.

    Permutes/stacks (and optionally int8-quantizes) the layer stack ONCE and
    returns ``generate(rng, T, c=None, g=None, sample=False)`` which caches
    one compiled shard_map program per (T, B, sample) launch shape — the
    compile-once-per-bucket contract ``BucketedSynthesisServer`` relies on
    (re-preparing weights and rebuilding the jit every call would recompile
    on every launch).

    Requires ``gate_channels % (2*axis_size) == 0`` and, for the skip/out
    shards, ``(gate_channels//2) % axis_size == 0``.  f32 path (the int8 /
    fused options compose with TP in principle but are not wired here).
    ``weight_quant='int8'`` composes weight-only int8 (per-output-channel
    scales, same scheme as the single-chip scan) with the sharding — each
    chip streams 1/M of the int8 stack, the production single-stream
    configuration.  ``generate`` returns (outputs (B, T, out_channels),
    emitted) like the single-chip scan; greedy streams are bit-checked
    against it in tests.
    """
    assert weight_quant in (None, "int8"), weight_quant
    m = mesh.shape[axis]
    gate = cfg.gate_channels
    assert gate % (2 * m) == 0, (gate, m)
    perm = _gate_permutation(gate, m)

    # materialize + permute the layer stack once (host side of the jit)
    wtap, btap, wskip, bskip, wout, bout = [], [], [], [], [], []
    for p in params["conv_layers"]:
        w = conv_weight(p["conv"])[:, :, perm]       # (k, C_res, gate)
        wtap.append(w)
        btap.append(p["conv"]["b"][perm])
        wskip.append(conv_weight(p["conv1x1_skip"])[0])   # (half, S)
        bskip.append(p["conv1x1_skip"]["b"])
        wout.append(conv_weight(p["conv1x1_out"])[0])     # (half, C_res)
        bout.append(p["conv1x1_out"]["b"])
    wtap = jnp.stack(wtap)
    btap = jnp.stack(btap)
    wskip = jnp.stack(wskip)
    bskip = jnp.stack(bskip)
    wout = jnp.stack(wout)
    bout = jnp.stack(bout)
    wtap_scale = wskip_scale = wout_scale = None
    if weight_quant == "int8":
        from vqvae_speech_tpu.models.wavenet.incremental import _quantize_int8
        # per-output-column scales are permutation-equivariant, so the
        # sharded quantization matches the single-chip scan's exactly;
        # column scales shard with wtap's columns, while wskip/wout scales
        # (per output, rows sharded) replicate and apply AFTER the psum.
        wtap, wtap_scale = _quantize_int8(wtap, axes=(1, 2))
        wtap_scale = wtap_scale.reshape(cfg.layers, 1, -1)
        wskip, wskip_scale = _quantize_int8(wskip, axes=(1,))
        wskip_scale = wskip_scale.reshape(cfg.layers, -1)
        wout, wout_scale = _quantize_int8(wout, axes=(1,))
        wout_scale = wout_scale.reshape(cfg.layers, -1)

    w_first = conv_weight(params["first_conv"])[0]
    b_first = params["first_conv"]["b"]
    w_last1 = conv_weight(params["last_conv_1"])[0]
    b_last1 = params["last_conv_1"]["b"]
    w_last2 = conv_weight(params["last_conv_2"])[0]
    b_last2 = params["last_conv_2"]["b"]

    dilations = tuple(cfg.dilation(i) for i in range(cfg.layers))
    k = cfg.kernel_size

    def _build(T: int, B: int, sample: bool):
        in_ch = 1 if cfg.scalar_input else cfg.out_channels
        x0 = jnp.zeros((B, in_ch), jnp.float32)
        if not cfg.scalar_input:
            x0 = x0.at[:, 127].set(1.0)

        def run(wtap, btap, wskip, bskip, wout, bout, cond_stack, rng,
                wtap_scale=None, wskip_scale=None, wout_scale=None):
            # local shards: wtap (L, k, C, gate/m) with matched a/b halves;
            # wskip/wout (L, half/m, S|C); cond (L, B, T, gate/m)
            quant = wtap_scale is not None

            def step(carry, t):
                x_in, bufs, key = carry
                key, k_sample = jax.random.split(key)
                x = x_in @ w_first + b_first
                sqrt_half = jnp.float32(math.sqrt(0.5))
                # Deferred skip reduction: only the residual path needs a
                # psum per layer (the next layer consumes it); skip
                # contributions are LINEAR in the locals, so accumulate
                # partials (with the legacy geometric scaling folded in) and
                # psum ONCE per step — halves the per-sample collective
                # count.
                skips_partial = jnp.float32(0.0)
                bias_total = jnp.float32(0.0)
                new_bufs = []
                for layer in range(cfg.layers):
                    d = dilations[layer]
                    L = bufs[layer].shape[1]
                    wl = (wtap[layer].astype(x.dtype) if quant
                          else wtap[layer])
                    acc = x @ wl[k - 1]
                    for j in range(k - 1):
                        lag = (k - 1 - j) * d
                        slot = jnp.mod(t - lag, L)
                        tap = jax.lax.dynamic_index_in_dim(
                            bufs[layer], slot, axis=1, keepdims=False)
                        tap = jnp.where(t - lag >= 0, tap,
                                        jnp.zeros_like(tap))
                        acc = acc + tap @ wl[j]
                    if quant:
                        acc = acc * wtap_scale[layer]
                    acc = acc + btap[layer] + cond_stack[layer, :, t]
                    a, b = jnp.split(acc, 2, axis=-1)
                    h = jnp.tanh(a) * jax.nn.sigmoid(b)
                    # legacy: skips = (skips + s_l) * q at every layer > 0,
                    # so s_l carries q^(L-l) for l >= 1 and s_0 carries
                    # q^(L-1)
                    exp = (max(cfg.layers - layer, 1) if layer else
                           cfg.layers - 1)
                    scale = (sqrt_half ** exp if cfg.legacy
                             else jnp.float32(1.0))
                    if quant:
                        sk = (h @ wskip[layer].astype(h.dtype)) * \
                            wskip_scale[layer]
                        ot = (h @ wout[layer].astype(h.dtype)) * \
                            wout_scale[layer]
                    else:
                        sk = h @ wskip[layer]
                        ot = h @ wout[layer]
                    skips_partial = skips_partial + sk * scale
                    bias_total = bias_total + bskip[layer] * scale
                    out = jax.lax.psum(ot, axis) + bout[layer]
                    new_bufs.append(jax.lax.dynamic_update_index_in_dim(
                        bufs[layer], x, jnp.mod(t, L), axis=1))
                    x = (out + x) * sqrt_half
                skips = jax.lax.psum(skips_partial, axis) + bias_total
                out = jax.nn.relu(skips)
                out = jax.nn.relu(out @ w_last1 + b_last1)
                out = (out @ w_last2 + b_last2).astype(jnp.float32)
                if cfg.scalar_input:
                    from vqvae_speech_tpu.models.wavenet.mixture import (
                        sample_from_discretized_mix_logistic)
                    nxt = (sample_from_discretized_mix_logistic(
                        k_sample, out[:, None, :])[:, 0] if sample
                        else out[:, 0])
                    next_in, emitted = nxt[:, None], nxt
                else:
                    idx = (jax.random.categorical(k_sample, out, axis=-1)
                           if sample else jnp.argmax(out, axis=-1))
                    next_in = jax.nn.one_hot(idx, cfg.out_channels,
                                             dtype=x_in.dtype)
                    emitted = idx.astype(jnp.int32)
                return (next_in, new_bufs, key), (out, emitted)

            bufs = [jnp.zeros(
                (B, max((k - 1) * d, 1), cfg.residual_channels),
                jnp.float32) for d in dilations]
            (_, _, _), (outs, emitted) = jax.lax.scan(
                step, (x0, bufs, rng), jnp.arange(T))
            return jnp.swapaxes(outs, 0, 1), jnp.swapaxes(emitted, 0, 1)

        shard_gate = P(None, None, None, axis)       # wtap (L,k,C,gate)
        shard_half = P(None, axis, None)             # wskip/wout (L,half,·)
        shard_cond = P(None, None, None, axis)       # cond (L,B,T,gate)
        in_specs = [shard_gate, P(None, axis), shard_half, P(None, None),
                    shard_half, P(None, None), shard_cond, P()]
        if weight_quant == "int8":
            in_specs += [P(None, None, axis), P(None, None), P(None, None)]
        return jax.jit(shard_map(
            run, mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(), P()),
            check_rep=False))

    compiled = {}

    def generate(rng, T: int, c=None, g=None, sample: bool = False):
        """Run one TP decode launch; compiles once per (T, B, sample)."""
        if c is not None:
            c = jnp.asarray(c).astype(jnp.float32)
            B = c.shape[0]
            cu = (_upsample_lc(params, c, cfg)
                  if cfg.upsample_conditional_features else c)
            assert cu.shape[1] >= T
            cu = cu[:, :T]
        else:
            B, cu = 1, None

        g_b1c = _expand_global(params, g, B, 1, cfg)

        # hoisted conditioning, columns permuted to the TP gate layout
        cond = []
        for p in params["conv_layers"]:
            ct = None
            if cu is not None and "conv1x1c" in p:
                ct = conv1d(p["conv1x1c"], cu)
            if g_b1c is not None and "conv1x1g" in p:
                gh = conv1d(p["conv1x1g"], g_b1c)[:, 0]
                ct = gh[:, None, :] + ct if ct is not None else \
                    jnp.broadcast_to(gh[:, None, :], (B, T, gh.shape[-1]))
            cond.append(ct[:, :, perm] if ct is not None else
                        jnp.zeros((B, T, gate), jnp.float32))
        cond_stack = jnp.stack(cond)                 # (L, B, T, gate)

        key = (T, B, bool(sample))
        if key not in compiled:
            compiled[key] = _build(T, B, bool(sample))
        args = [wtap, btap, wskip, bskip, wout, bout, cond_stack, rng]
        if weight_quant == "int8":
            args += [wtap_scale, wskip_scale, wout_scale]
        return compiled[key](*args)

    generate.cache = compiled   # introspectable: one program per (T,B,sample)
    return generate


def wavenet_incremental_generate_tp(params, cfg: WaveNetConfig, rng, T: int,
                                    mesh, c=None, g=None,
                                    sample: bool = False,
                                    weight_quant: str = None,
                                    axis: str = "model"):
    """One-shot convenience wrapper over ``prepare_tp_decode`` (which is
    what the serving path uses — this re-prepares weights per call and is
    for tests/scripts)."""
    return prepare_tp_decode(params, cfg, mesh, weight_quant=weight_quant,
                             axis=axis)(rng, T, c=c, g=g, sample=sample)
