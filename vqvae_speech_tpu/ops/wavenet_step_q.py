"""Pallas fused WaveNet GLU layer-stack, int8-native variant.

Same computation as ops/wavenet_step.py but the stacked weights are int8
with per-output-channel f32 scales AND the dots run on the int8 MXU path:
activations are quantized in-kernel per step with one dynamic per-tensor
scale (max-abs / 127 — B=1 rows, so this is per-row), the matmul accumulates
in int32, and the result is rescaled once per output row.  The weight block
is never converted: it streams from HBM as int8 straight into the MXU, so
the kernel removes BOTH the f32 weight traffic (4x) and the per-block
int8->bf16 conversion pass that made the round-1 kernel lose to the plain
int8 scan (VERDICT round-1 weak #6).

Exactness: w == w_i8 * scale(out-channel) exactly; the only new error is
the activation quantization (|err| <= max|act|/254 per element), applied to
the GLU inputs and the post-GLU h — logits stay f32.
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_dynamic(v):
    """f32 (B, C) -> (int8 (B, C), f32 scalar scale), max-abs per tensor."""
    s = jnp.maximum(jnp.max(jnp.abs(v)), 1e-12) / 127.0
    return jnp.round(v / s).astype(jnp.int8), s


def _kernel(x0_ref, taps_ref, cond_ref,
            wtap_ref, stap_ref, bias_ref,
            wskip_ref, sskip_ref, bskip_ref,
            wout_ref, sout_ref, bout_ref,
            x_out_ref, skip_out_ref, x_all_ref,
            x_scr, acc_scr, skip_scr, *, layers, k, legacy):
    l = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((l == 0) & (j == 0))
    def _():
        x_scr[:] = x0_ref[:]
        skip_scr[:] = jnp.zeros_like(skip_scr)

    @pl.when(j == 0)
    def _():
        x_all_ref[0] = x_scr[:]
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # int8-native dot: quantize the (B, C) tap on the VPU (tiny), feed the
    # streamed int8 weight block straight into the MXU, rescale the i32 row
    tap_f = jnp.where(j == k - 1, x_scr[:],
                      taps_ref[0, 0] if k > 1 else x_scr[:])
    tap_i8, ts = _quant_dynamic(tap_f)
    acc_scr[:] += jnp.dot(tap_i8, wtap_ref[0, 0],
                          preferred_element_type=jnp.int32
                          ).astype(jnp.float32) * ts

    @pl.when(j == k - 1)
    def _():
        acc = acc_scr[:] * stap_ref[0] + cond_ref[0] + bias_ref[0]
        g_half = acc.shape[1] // 2
        a, b = acc[:, :g_half], acc[:, g_half:]
        h = jnp.tanh(a) * jax.nn.sigmoid(b)
        h_i8, hs = _quant_dynamic(h)
        s_l = (jnp.dot(h_i8, wskip_ref[0],
                       preferred_element_type=jnp.int32).astype(jnp.float32)
               * (hs * sskip_ref[0]) + bskip_ref[0])
        if legacy:
            scale = jnp.where(l == 0, 1.0, math.sqrt(0.5))
            skip_scr[:] = (skip_scr[:] + s_l) * scale
        else:
            skip_scr[:] += s_l
        out = (jnp.dot(h_i8, wout_ref[0],
                       preferred_element_type=jnp.int32).astype(jnp.float32)
               * (hs * sout_ref[0]) + bout_ref[0])
        x_scr[:] = (x_scr[:] + out) * math.sqrt(0.5)

    @pl.when((l == layers - 1) & (j == k - 1))
    def _():
        x_out_ref[:] = x_scr[:]
        skip_out_ref[:] = skip_scr[:]


@functools.partial(jax.jit, static_argnames=("legacy",))
def fused_glu_stack_step_q(x0, taps, cond, wtap_i8, stap, bias,
                           wskip_i8, sskip, bskip, wout_i8, sout, bout,
                           legacy: bool = False):
    """int8-native variant.  wtap_i8 (L,k,C,G) int8, stap (L,G) f32 scales;
    wskip_i8 (L,Gh,S)/sskip (L,S); wout_i8 (L,Gh,C)/sout (L,C)."""
    L, k, C, G = wtap_i8.shape
    B = x0.shape[0]
    S = wskip_i8.shape[2]
    Gh = G // 2

    stap = stap.reshape(L, 1, G)
    bias = bias.reshape(L, 1, G)
    sskip = sskip.reshape(L, 1, S)
    bskip = bskip.reshape(L, 1, S)
    sout = sout.reshape(L, 1, C)
    bout = bout.reshape(L, 1, C)

    taps_idx = lambda l, j: (l, jnp.minimum(j, k - 2), 0, 0)
    per_l = lambda shape: pl.BlockSpec(shape, lambda l, j: (l,) + (0,) * (
        len(shape) - 1), memory_space=pltpu.VMEM)

    x_out, skip_out, x_all = pl.pallas_call(
        functools.partial(_kernel, layers=L, k=k, legacy=legacy),
        grid=(L, k),
        in_specs=[
            pl.BlockSpec((B, C), lambda l, j: (0, 0),
                         memory_space=pltpu.VMEM),                 # x0
            pl.BlockSpec((1, 1, B, C), taps_idx,
                         memory_space=pltpu.VMEM),                 # taps
            per_l((1, B, G)),                                      # cond
            pl.BlockSpec((1, 1, C, G), lambda l, j: (l, j, 0, 0),
                         memory_space=pltpu.VMEM),                 # wtap int8
            per_l((1, 1, G)),                                      # stap
            per_l((1, 1, G)),                                      # bias
            per_l((1, Gh, S)),                                     # wskip int8
            per_l((1, 1, S)),                                      # sskip
            per_l((1, 1, S)),                                      # bskip
            per_l((1, Gh, C)),                                     # wout int8
            per_l((1, 1, C)),                                      # sout
            per_l((1, 1, C)),                                      # bout
        ],
        out_specs=[
            pl.BlockSpec((B, C), lambda l, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda l, j: (0, 0),
                         memory_space=pltpu.VMEM),
            per_l((1, B, C)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), jnp.float32),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
            jax.ShapeDtypeStruct((L, B, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, C), jnp.float32),
            pltpu.VMEM((B, G), jnp.float32),
            pltpu.VMEM((B, S), jnp.float32),
        ],
    )(x0, taps, cond, wtap_i8, stap, bias, wskip_i8, sskip, bskip,
      wout_i8, sout, bout)
    return x_out, skip_out, x_all
