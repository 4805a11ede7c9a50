"""Pallas fused WaveNet GLU layer-stack, int8 weight-only variant.

Same computation as ops/wavenet_step.py but the stacked weights are int8
with per-output-channel f32 scales: each grid step's weight block streams
from HBM at a quarter of the f32 bytes AND the block pipeline overlaps that
DMA with compute — composing the two single-stream decode levers
(int8 traffic + Pallas overlap).

Scale factorization is exact: w == w_i8 * scale(broadcast on out channels),
so the raw int8 dot is scaled once per output row; conditioning/bias are
added AFTER scaling.
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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

    # int8 block -> bf16 (cheap convert, single-pass MXU matmul)
    w = wtap_ref[0, 0].astype(jnp.bfloat16)
    tap = jnp.where(j == k - 1, x_scr[:],
                    taps_ref[0, 0] if k > 1 else x_scr[:]).astype(jnp.bfloat16)
    acc_scr[:] += jnp.dot(tap, w, preferred_element_type=jnp.float32)

    @pl.when(j == k - 1)
    def _():
        acc = acc_scr[:] * stap_ref[0] + cond_ref[0] + bias_ref[0]
        g_half = acc.shape[1] // 2
        a, b = acc[:, :g_half], acc[:, g_half:]
        h = jnp.tanh(a) * jax.nn.sigmoid(b)
        s_l = (jnp.dot(h.astype(jnp.bfloat16),
                       wskip_ref[0].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
               * sskip_ref[0] + bskip_ref[0])
        if legacy:
            scale = jnp.where(l == 0, 1.0, math.sqrt(0.5))
            skip_scr[:] = (skip_scr[:] + s_l) * scale
        else:
            skip_scr[:] += s_l
        out = (jnp.dot(h.astype(jnp.bfloat16),
                       wout_ref[0].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
               * sout_ref[0] + bout_ref[0])
        x_scr[:] = (x_scr[:] + out) * math.sqrt(0.5)

    @pl.when((l == layers - 1) & (j == k - 1))
    def _():
        x_out_ref[:] = x_scr[:]
        skip_out_ref[:] = skip_scr[:]


@functools.partial(jax.jit, static_argnames=("legacy",))
def fused_glu_stack_step_q(x0, taps, cond, wtap_i8, stap, bias,
                           wskip_i8, sskip, bskip, wout_i8, sout, bout,
                           legacy: bool = False):
    """int8 variant.  wtap_i8 (L,k,C,G) int8, stap (L,G) f32 scales;
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
