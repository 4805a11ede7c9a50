"""Fused gated-resblock chain (Pallas prototype) for batch-1 IAF synthesis.

VERDICT round-2 item #7: RESULTS.md estimates the ClariNet IAF student's
batch-1 synthesis at ~34% MFU, "bounded by the K=128 contraction and the
VPU-side gates/adds between convs" — an architecture-bound claim that was
estimated, not measured.  This kernel is the measurement instrument: ONE
``pallas_call`` runs an entire 6-layer gated resblock chain (dilated
filter/gate convs + conditioning projections + tanh*sigmoid + res/skip
1x1s) with every weight and activation resident in VMEM, so the only HBM
traffic is the chain's input/output.  If the estimate is right, this
kernel can NOT materially beat the XLA conv chain; if launch overhead or
inter-conv HBM traffic was the real bound, it will.

Layout: batch 1, channels-last (T, C).  The time tile must fit VMEM whole
(no halo grid — prototype measures the fusion ceiling, not a production
tiling).  Dilated causal convs are computed as tap-shifted matmuls:
y[t] = sum_j x[t - (k-1-j)*d] @ w[j], left zero-padded exactly like
``modules.conv_apply``'s causal path.

Reference structure being fused: src/clarinet/modules.py:62-98 (ResBlock)
as stacked in src/clarinet/wavenet_iaf.py:30-126.
"""
import functools
import math

import jax
import jax.numpy as jnp

from vqvae_speech_tpu.nn.conv import conv_weight


def stack_block_weights(block_params, compute_dtype=jnp.bfloat16):
    """Stack one chain's resblock params (list of modules.resblock_init
    trees, length L) into dense arrays for the kernel.  Weight-norm is
    resolved here (host side, once)."""
    def w(p):
        return conv_weight(p).astype(compute_dtype)

    wf = jnp.stack([w(p["filter_conv"]) for p in block_params])   # (L,k,C,G)
    wg = jnp.stack([w(p["gate_conv"]) for p in block_params])
    wfc = jnp.stack([w(p["filter_conv_c"])[0] for p in block_params])
    wgc = jnp.stack([w(p["gate_conv_c"])[0] for p in block_params])
    wres = jnp.stack([w(p["res_conv"])[0] for p in block_params])  # (L,G,C)
    wskip = jnp.stack([w(p["skip_conv"])[0] for p in block_params])
    bf = jnp.stack([(p["filter_conv"]["b"] + p["filter_conv_c"]["b"])
                    for p in block_params]).astype(jnp.float32)
    bg = jnp.stack([(p["gate_conv"]["b"] + p["gate_conv_c"]["b"])
                    for p in block_params]).astype(jnp.float32)
    bres = jnp.stack([p["res_conv"]["b"] for p in block_params]).astype(
        jnp.float32)
    bskip = jnp.stack([p["skip_conv"]["b"] for p in block_params]).astype(
        jnp.float32)
    return dict(wf=wf, wg=wg, wfc=wfc, wgc=wgc, wres=wres, wskip=wskip,
                bf=bf, bg=bg, bres=bres, bskip=bskip)


def _shift_down(x, lag):
    """x[t] <- x[t - lag], zeros for t < lag (causal left pad)."""
    if lag == 0:
        return x
    return jnp.concatenate(
        [jnp.zeros((lag, x.shape[1]), x.dtype), x[:-lag]], axis=0)


def _chain_kernel(x_ref, c_ref, wf_ref, wg_ref, wfc_ref, wgc_ref,
                  wres_ref, wskip_ref, bf_ref, bg_ref, bres_ref, bskip_ref,
                  xout_ref, skip_ref, *, layers, kernel_size, dilations):
    f32 = jnp.float32
    x = x_ref[:]
    c = c_ref[:]
    dtype = x.dtype
    skip = jnp.zeros(skip_ref.shape, f32)
    sqrt_half = jnp.asarray(math.sqrt(0.5), f32)
    for l in range(layers):
        d = dilations[l]
        hf = (jnp.dot(c, wfc_ref[l], preferred_element_type=f32)
              + bf_ref[l])
        hg = (jnp.dot(c, wgc_ref[l], preferred_element_type=f32)
              + bg_ref[l])
        for j in range(kernel_size):
            lag = (kernel_size - 1 - j) * d
            xs = _shift_down(x, lag)
            hf = hf + jnp.dot(xs, wf_ref[l, j], preferred_element_type=f32)
            hg = hg + jnp.dot(xs, wg_ref[l, j], preferred_element_type=f32)
        out = (jnp.tanh(hf) * jax.nn.sigmoid(hg)).astype(dtype)
        skip = skip + (jnp.dot(out, wskip_ref[l],
                               preferred_element_type=f32) + bskip_ref[l])
        res = jnp.dot(out, wres_ref[l], preferred_element_type=f32) \
            + bres_ref[l]
        x = ((x.astype(f32) + res) * sqrt_half).astype(dtype)
    xout_ref[:] = x
    skip_ref[:] = skip


def _chain_kernel_tiled(x_ref, c_ref, wf_ref, wg_ref, wfc_ref, wgc_ref,
                        wres_ref, wskip_ref, bf_ref, bg_ref, bres_ref,
                        bskip_ref, xout_ref, skip_ref, tails_ref, *,
                        layers, kernel_size, dilations, max_tail):
    """One time-tile of the chain; per-layer input tails carried in VMEM
    scratch across the (sequential) grid so no FLOP is recomputed.

    tails_ref[l, -2*d_l:] holds the last (k-1)*d_l rows of layer l's INPUT
    from the previous tile; the first tile sees zeros = the causal left pad.
    """
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    tile = x_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _zero_tails():
        tails_ref[...] = jnp.zeros(tails_ref.shape, tails_ref.dtype)

    x = x_ref[:]
    c = c_ref[:]
    dtype = x.dtype
    skip = jnp.zeros(skip_ref.shape, f32)
    sqrt_half = jnp.asarray(math.sqrt(0.5), f32)
    for l in range(layers):
        d = dilations[l]
        lag_max = (kernel_size - 1) * d
        # previous tile's tail of THIS layer's input, then update the
        # scratch with the current tile's tail for the next grid step.
        tail = tails_ref[l, max_tail - lag_max:]
        tails_ref[l, max_tail - lag_max:] = x[tile - lag_max:]
        ext = jnp.concatenate([tail, x], axis=0)        # (lag_max+tile, C)
        hf = (jnp.dot(c, wfc_ref[l], preferred_element_type=f32)
              + bf_ref[l])
        hg = (jnp.dot(c, wgc_ref[l], preferred_element_type=f32)
              + bg_ref[l])
        for j in range(kernel_size):
            lag = (kernel_size - 1 - j) * d
            xs = jax.lax.slice_in_dim(ext, lag_max - lag,
                                      lag_max - lag + tile, axis=0)
            hf = hf + jnp.dot(xs, wf_ref[l, j], preferred_element_type=f32)
            hg = hg + jnp.dot(xs, wg_ref[l, j], preferred_element_type=f32)
        out = (jnp.tanh(hf) * jax.nn.sigmoid(hg)).astype(dtype)
        skip = skip + (jnp.dot(out, wskip_ref[l],
                               preferred_element_type=f32) + bskip_ref[l])
        res = jnp.dot(out, wres_ref[l], preferred_element_type=f32) \
            + bres_ref[l]
        x = ((x.astype(f32) + res) * sqrt_half).astype(dtype)
    xout_ref[:] = x
    skip_ref[:] = skip


@functools.partial(jax.jit, static_argnames=("layers", "kernel_size",
                                             "tile", "interpret"))
def fused_block_chain_tiled(x, c_up, stacked, layers=6, kernel_size=3,
                            tile=2048, interpret=False):
    """Production form of :func:`fused_block_chain`: constant VMEM at any T.

    The grid walks time tiles left to right (TPU Pallas grids execute
    sequentially on a core); each layer's causal history across the tile
    boundary — its last ``(k-1)*dilation`` input rows — is carried in a
    VMEM scratch buffer, so unlike a halo tiling there is ZERO recomputed
    work.  Weights use constant index maps and stay resident in VMEM for
    the whole launch.  Requires ``tile >= (k-1)*max(dilation)`` (asserted)
    and pads T up to a tile multiple (output trimmed).

    Same math as fused_block_chain; reference structure being fused:
    src/clarinet/modules.py:62-98 stacked as in src/clarinet/
    wavenet_iaf.py:30-126.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, C = x.shape
    S = stacked["wskip"].shape[-1]
    cin = c_up.shape[-1]
    dilations = tuple(kernel_size ** (i % layers) for i in range(layers))
    max_tail = (kernel_size - 1) * max(dilations)
    if tile < max_tail:
        raise ValueError(f"tile {tile} < max causal tail {max_tail}")
    T_pad = -(-T // tile) * tile
    if T_pad != T:
        x = jnp.pad(x, ((0, T_pad - T), (0, 0)))
        c_up = jnp.pad(c_up, ((0, T_pad - T), (0, 0)))
    kernel = functools.partial(_chain_kernel_tiled, layers=layers,
                               kernel_size=kernel_size, dilations=dilations,
                               max_tail=max_tail)

    def t_map(i):
        return (i, 0)

    def const_map(*args):
        def m(i):
            return tuple(0 for _ in args)
        return m

    def whole(a):
        return pl.BlockSpec(a.shape, const_map(*a.shape),
                            memory_space=pltpu.VMEM)

    xo, sk = pl.pallas_call(
        kernel,
        grid=(T_pad // tile,),
        in_specs=[pl.BlockSpec((tile, C), t_map, memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, cin), t_map, memory_space=pltpu.VMEM)]
        + [whole(stacked[k]) for k in ("wf", "wg", "wfc", "wgc", "wres",
                                       "wskip", "bf", "bg", "bres",
                                       "bskip")],
        out_specs=(pl.BlockSpec((tile, C), t_map, memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile, S), t_map, memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((T_pad, C), x.dtype),
                   jax.ShapeDtypeStruct((T_pad, S), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((layers, max_tail, C), x.dtype)],
        interpret=interpret,
    )(x, c_up, stacked["wf"], stacked["wg"], stacked["wfc"], stacked["wgc"],
      stacked["wres"], stacked["wskip"], stacked["bf"], stacked["bg"],
      stacked["bres"], stacked["bskip"])
    return xo[:T], sk[:T]


def _chain_kernel_nc(x_ref, c_ref, wf_ref, wg_ref, wfc_ref, wgc_ref,
                     wres_ref, wskip_ref, bf_ref, bg_ref, bres_ref,
                     bskip_ref, xout_ref, skip_ref, *, layers, kernel_size,
                     dilations, halo, tile, seq_len):
    """One overlapping window of a NON-CAUSAL chain (symmetric conv pad).

    The window is ``tile + 2*halo`` rows of the globally zero-padded input;
    ``halo = sum(dilations)*(k-1)//2`` covers the chain's receptive field,
    so the central ``tile`` rows are exact (classic halo tiling — the only
    recompute is the 2*halo margin, <1% at flow scale).  Rows outside the
    global ``[0, seq_len)`` range are re-zeroed after every layer so deeper
    layers see exactly the per-layer zero padding of the reference's
    symmetric convs (modules.conv_apply mode=SAME, causal=False).
    """
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    W = x_ref.shape[1]
    w_id = pl.program_id(0)

    # global position of each window row; True where a real sample lives
    g = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0) + w_id * tile - halo
    valid = jnp.logical_and(g >= 0, g < seq_len)

    x = x_ref[0]
    c = c_ref[0]
    dtype = x.dtype
    zero = jnp.zeros((), dtype)
    skip = jnp.zeros((W, wskip_ref.shape[-1]), f32)
    sqrt_half = jnp.asarray(math.sqrt(0.5), f32)
    for l in range(layers):
        d = dilations[l]
        hf = (jnp.dot(c, wfc_ref[l], preferred_element_type=f32)
              + bf_ref[l])
        hg = (jnp.dot(c, wgc_ref[l], preferred_element_type=f32)
              + bg_ref[l])
        for j in range(kernel_size):
            off = (j - (kernel_size - 1) // 2) * d   # tap offset, centred
            xs = _shift_signed(x, off)
            hf = hf + jnp.dot(xs, wf_ref[l, j], preferred_element_type=f32)
            hg = hg + jnp.dot(xs, wg_ref[l, j], preferred_element_type=f32)
        out = (jnp.tanh(hf) * jax.nn.sigmoid(hg)).astype(dtype)
        skip = skip + (jnp.dot(out, wskip_ref[l],
                               preferred_element_type=f32) + bskip_ref[l])
        res = jnp.dot(out, wres_ref[l], preferred_element_type=f32) \
            + bres_ref[l]
        x = ((x.astype(f32) + res) * sqrt_half).astype(dtype)
        # re-impose the global zero padding for the next layer's taps
        x = jnp.where(valid, x, zero)
    xout_ref[0] = jax.lax.slice_in_dim(x, halo, halo + tile, axis=0)
    skip_ref[0] = jax.lax.slice_in_dim(skip, halo, halo + tile, axis=0)


def _shift_signed(x, off):
    """x[t] <- x[t + off] within the window, zero-filled at the edges."""
    if off == 0:
        return x
    z = jnp.zeros((abs(off), x.shape[1]), x.dtype)
    if off > 0:
        return jnp.concatenate([x[off:], z], axis=0)
    return jnp.concatenate([z, x[:off]], axis=0)


@functools.partial(jax.jit, static_argnames=("layers", "kernel_size",
                                             "dilations", "tile",
                                             "interpret"))
def fused_block_chain_nc(x, c_up, stacked, layers=2, kernel_size=3,
                         dilations=None, tile=2048, interpret=False):
    """Non-causal fused chain (FloWaveNet coupling nets) via halo windows.

    Unlike the causal tiled kernel there is no sequential carry: every
    window loads its ``tile + 2*halo`` rows of the zero-padded input
    (built host-side with one gather) and recomputes only the halo margin
    — sum(dilations) rows each side, e.g. 3 for the flow couplings'
    (1, 2) chain.  ``dilations`` defaults to the clarinet convention
    ``kernel_size**(i % layers)``; FloWaveNet passes ``2**(i % layers)``
    (model.py CouplingNetConfig.dilation).

    x: (T, C_res); c_up: (T, cin); returns (new_x (T, C), skip (T, S) f32).
    Reference structure: src/flow_wavenet/modules.py WaveNet (non-causal,
    symmetric SAME padding) as used by src/flow_wavenet/model.py:81-120.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, C = x.shape
    S = stacked["wskip"].shape[-1]
    cin = c_up.shape[-1]
    if dilations is None:
        dilations = tuple(kernel_size ** (i % layers) for i in range(layers))
    halo = sum(dilations) * (kernel_size - 1) // 2
    tile = min(tile, -(-T // 8) * 8)
    n_win = -(-T // tile)
    P = n_win * tile
    W = tile + 2 * halo

    # zero-pad globally, then gather overlapping windows (one HBM pass;
    # the extra traffic is 2*halo/tile, <1% at flow scale)
    idx = (jnp.arange(n_win) * tile)[:, None] + jnp.arange(W)[None]
    xw = jnp.pad(x, ((halo, halo + (P - T)), (0, 0)))[idx]
    cw = jnp.pad(c_up, ((halo, halo + (P - T)), (0, 0)))[idx]

    kernel = functools.partial(_chain_kernel_nc, layers=layers,
                               kernel_size=kernel_size,
                               dilations=tuple(dilations), halo=halo,
                               tile=tile, seq_len=T)

    def w_map(i):
        return (i, 0, 0)

    def whole(a):
        def m(i):
            return tuple(0 for _ in a.shape)
        return pl.BlockSpec(a.shape, m, memory_space=pltpu.VMEM)

    xo, sk = pl.pallas_call(
        kernel,
        grid=(n_win,),
        in_specs=[pl.BlockSpec((1, W, C), w_map, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, W, cin), w_map, memory_space=pltpu.VMEM)]
        + [whole(stacked[k]) for k in ("wf", "wg", "wfc", "wgc", "wres",
                                       "wskip", "bf", "bg", "bres",
                                       "bskip")],
        out_specs=(pl.BlockSpec((1, tile, C), w_map,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile, S), w_map,
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_win, tile, C), x.dtype),
                   jax.ShapeDtypeStruct((n_win, tile, S), jnp.float32)),
        interpret=interpret,
    )(xw, cw, stacked["wf"], stacked["wg"], stacked["wfc"], stacked["wgc"],
      stacked["wres"], stacked["wskip"], stacked["bf"], stacked["bg"],
      stacked["bres"], stacked["bskip"])
    return (xo.reshape(P, C)[:T], sk.reshape(P, S)[:T])


@functools.partial(jax.jit, static_argnames=("layers", "kernel_size",
                                             "interpret"))
def fused_block_chain(x, c_up, stacked, layers=6, kernel_size=3,
                      interpret=False):
    """Run one fused L-layer gated resblock chain.

    x: (T, C_res) activation (batch-1, channels-last, bf16 recommended);
    c_up: (T, cin) upsampled conditioning; stacked: stack_block_weights().
    Returns (new_x (T, C_res), skip_sum (T, C_skip) f32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, C = x.shape
    S = stacked["wskip"].shape[-1]
    dilations = tuple(kernel_size ** (i % layers) for i in range(layers))
    kernel = functools.partial(_chain_kernel, layers=layers,
                               kernel_size=kernel_size, dilations=dilations)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[vmem] * 12,
        out_specs=(vmem, vmem),
        out_shape=(jax.ShapeDtypeStruct((T, C), x.dtype),
                   jax.ShapeDtypeStruct((T, S), jnp.float32)),
        interpret=interpret,
    )(x, c_up, stacked["wf"], stacked["wg"], stacked["wfc"], stacked["wgc"],
      stacked["wres"], stacked["wskip"], stacked["bf"], stacked["bg"],
      stacked["bres"], stacked["bskip"])
