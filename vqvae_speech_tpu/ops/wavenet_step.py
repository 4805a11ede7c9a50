"""Pallas kernel: fused WaveNet GLU layer-stack for one decode step.

One autoregressive decode step must run every layer's dilated-conv taps, the
GLU, and the skip/residual projections — 20 sequential tiny matmuls whose
cost is dominated by streaming the layer weights from HBM (the layer stack
is far larger than VMEM, so weights re-stream every step).  This kernel runs
the whole stack as ONE pallas_call with grid=(layers, k): Pallas's block
pipeline double-buffers each (layer, tap) weight block from HBM while the
previous block computes, overlapping weight DMA with the GLU math — the
overlap XLA's scan scheduler does not reliably achieve.

Used by the scan decode path when profitable (see
models/wavenet/incremental.py); equivalence with the XLA layer math is
tested in interpret mode (tests/test_wavenet_step.py).

Layout (all stacked over layers, static shapes):
  wtap  (L, k, C, G)   dilated conv taps (tap k-1 multiplies the current x)
  bias  (L, G)
  wskip (L, Gh, S), bskip (L, S)
  wout  (L, Gh, C), bout (L, C)
  taps  (L, k-1, B, C) gathered ring-buffer history (tap j = lag (k-1-j)*d)
  cond  (L, B, G)      pre-projected local+global conditioning at this t
  x0    (B, C)         layer-0 input (first_conv output)
Returns (x_final (B, C), skip_sum (B, S)).
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x0_ref, taps_ref, cond_ref, wtap_ref, bias_ref,
            wskip_ref, bskip_ref, wout_ref, bout_ref,
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
        # record this layer's input (the ring-buffer value for time t)
        x_all_ref[0] = x_scr[:]

    @pl.when(j == 0)
    def _():
        acc_scr[:] = cond_ref[0] + bias_ref[0]

    # tap j: history for j < k-1, the current x for j == k-1
    w = wtap_ref[0, 0]                       # (C, G)
    tap = jnp.where(j == k - 1, x_scr[:], taps_ref[0, 0] if k > 1 else x_scr[:])
    acc_scr[:] += jnp.dot(tap, w, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == k - 1)
    def _():
        acc = acc_scr[:]
        g_half = acc.shape[1] // 2
        a, b = acc[:, :g_half], acc[:, g_half:]
        h = jnp.tanh(a) * jax.nn.sigmoid(b)
        s_l = (jnp.dot(h, wskip_ref[0],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
               + bskip_ref[0])
        if legacy:
            # reference legacy skip scaling: skips = (skips + s)*sqrt(0.5)
            # for every layer after the first (wavenet.py:249-256)
            scale = jnp.where(l == 0, 1.0, math.sqrt(0.5))
            skip_scr[:] = (skip_scr[:] + s_l) * scale
        else:
            skip_scr[:] += s_l
        out = (jnp.dot(h, wout_ref[0], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
               + bout_ref[0])
        x_scr[:] = (x_scr[:] + out) * math.sqrt(0.5)

    @pl.when((l == layers - 1) & (j == k - 1))
    def _():
        x_out_ref[:] = x_scr[:]
        skip_out_ref[:] = skip_scr[:]


@functools.partial(jax.jit, static_argnames=("legacy",))
def fused_glu_stack_step(x0, taps, cond, wtap, bias, wskip, bskip, wout,
                         bout, legacy: bool = False):
    """See module docstring.  taps tap index j corresponds to wtap[:, j];
    ``legacy`` applies the reference's progressive sqrt(0.5) skip scaling."""
    L, k, C, G = wtap.shape
    B = x0.shape[0]
    S = wskip.shape[2]
    Gh = G // 2

    # biases as (L, 1, X) so every VMEM block has aligned trailing dims
    bias = bias.reshape(L, 1, G)
    bskip = bskip.reshape(L, 1, S)
    bout = bout.reshape(L, 1, C)

    # clamp the taps index map for j == k-1 (the current-x tap reads scratch,
    # but the block spec still needs a valid index)
    taps_idx = lambda l, j: (l, jnp.minimum(j, k - 2), 0, 0)

    x_out, skip_out, x_all = pl.pallas_call(
        functools.partial(_kernel, layers=L, k=k, legacy=legacy),
        grid=(L, k),
        in_specs=[
            pl.BlockSpec((B, C), lambda l, j: (0, 0),
                         memory_space=pltpu.VMEM),                   # x0
            pl.BlockSpec((1, 1, B, C), taps_idx,
                         memory_space=pltpu.VMEM),                   # taps
            pl.BlockSpec((1, B, G), lambda l, j: (l, 0, 0),
                         memory_space=pltpu.VMEM),                   # cond
            pl.BlockSpec((1, 1, C, G), lambda l, j: (l, j, 0, 0),
                         memory_space=pltpu.VMEM),                   # wtap
            pl.BlockSpec((1, 1, G), lambda l, j: (l, 0, 0),
                         memory_space=pltpu.VMEM),                   # bias
            pl.BlockSpec((1, Gh, S), lambda l, j: (l, 0, 0),
                         memory_space=pltpu.VMEM),                   # wskip
            pl.BlockSpec((1, 1, S), lambda l, j: (l, 0, 0),
                         memory_space=pltpu.VMEM),                   # bskip
            pl.BlockSpec((1, Gh, C), lambda l, j: (l, 0, 0),
                         memory_space=pltpu.VMEM),                   # wout
            pl.BlockSpec((1, 1, C), lambda l, j: (l, 0, 0),
                         memory_space=pltpu.VMEM),                   # bout
        ],
        out_specs=[
            pl.BlockSpec((B, C), lambda l, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda l, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, C), lambda l, j: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), jnp.float32),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
            jax.ShapeDtypeStruct((L, B, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, C), jnp.float32),   # x carry
            pltpu.VMEM((B, G), jnp.float32),   # gate accumulator
            pltpu.VMEM((B, S), jnp.float32),   # skip accumulator
        ],
    )(x0, taps, cond, wtap, bias, wskip, bskip, wout, bout)
    return x_out, skip_out, x_all


def glu_stack_step_xla(x0, taps, cond, wtap, bias, wskip, bskip, wout, bout,
                       legacy: bool = False):
    """Reference XLA implementation of the same stacked computation."""
    L, k, C, G = wtap.shape
    x = x0
    x_all = []
    skip = jnp.zeros((x0.shape[0], wskip.shape[2]), x0.dtype)
    for l in range(L):
        x_all.append(x)
        acc = cond[l] + bias[l][None, :]
        for j in range(k - 1):
            acc = acc + taps[l, j] @ wtap[l, j]
        acc = acc + x @ wtap[l, k - 1]
        a, b = jnp.split(acc, 2, axis=-1)
        h = jnp.tanh(a) * jax.nn.sigmoid(b)
        s_l = h @ wskip[l] + bskip[l][None, :]
        if legacy and l > 0:
            skip = (skip + s_l) * math.sqrt(0.5)
        else:
            skip = skip + s_l
        out = h @ wout[l] + bout[l][None, :]
        x = (x + out) * math.sqrt(0.5)
    return x, skip, jnp.stack(x_all)
