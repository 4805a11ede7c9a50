"""Vector-quantization codebook search: fused Pallas TPU kernel + XLA path.

The reference computes, per batch (reference src/models/vector_quantizer.py:96-130
and src/models/vector_quantizer_ema.py:109-159):

    distances = ||z||^2 + ||e||^2 - 2 z @ e^T        (N, K)
    indices   = argmin(distances, axis=1)            (N,)
    onehot    = one_hot(indices, K)                  (N, K)
    quantized = onehot @ e                           (N, D)
    counts    = sum(onehot, axis=0)                  (K,)   [EMA stats]
    dw        = onehot^T @ z                         (K, D) [EMA stats]

as five separate torch ops.  Here the whole chain is one Pallas kernel: the
two matmuls ride the MXU, the argmin/one-hot ride the VPU, and z is read from
HBM exactly once (the PyTorch version materializes distances and onehot in
HBM; the fusion removes ~2(NK + NDK/…) bytes of HBM traffic per step).

The Pallas path is differentiable via ``jax.custom_vjp``: the argmin is
piecewise constant, so the exact VJP treats the one-hot as locally constant —
``g_codebook = onehot^T @ g_quantized`` and ``g_flat = onehot @ g_dw`` (both
rebuilt from the saved indices; counts/indices carry no gradient).  This is
identical to differentiating the XLA chain with a stop-gradient on the argmin,
which is what the reference's autograd does (scatter on detached indices).

**Parity-critical flatten semantics.** The reference flattens its (B, C, T)
input via ``permute(1, 2, 0).contiguous().view(-1, D)``
(vector_quantizer.py:88-93) — i.e. rows of the flattened matrix are 64
consecutive elements of the (C, T, B)-contiguous buffer, *not* per-timestep
channel vectors.  `reference_flatten` reproduces that exactly from our
(B, T, C) layout; exact codebook-index parity demands it.
"""
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def reference_flatten(z_btc, embedding_dim=None):
    """(B, T, C) -> (N, D) with the reference's (C, T, B)-order flatten.

    Equivalent to torch's ``z_bct.permute(1, 2, 0).contiguous().view(-1, D)``
    where z_bct is the channels-first view of z_btc.  Normally D == C (the
    pre-VQ conv maps to embedding_dim channels) and N = B*T; the reference's
    raw view also supports D != C as long as C*T*B % D == 0 (e.g. arbitrary
    tensors fed straight to the quantizer), which the reshape reproduces.
    """
    D = z_btc.shape[2] if embedding_dim is None else embedding_dim
    return jnp.transpose(z_btc, (2, 1, 0)).reshape(-1, D)


def reference_unflatten(flat, B, T, C):
    """(N, D) -> (B, T, C), inverse of reference_flatten."""
    return jnp.transpose(flat.reshape(C, T, B), (2, 1, 0))


class VQSearchResult(NamedTuple):
    indices: jax.Array    # (N,) int32 nearest-code ids
    quantized: jax.Array  # (N, D) codebook rows
    counts: jax.Array     # (K,) one-hot column sums
    dw: jax.Array         # (K, D) onehot^T @ z (EMA numerator update)


# -------------------- XLA path --------------------


def vq_distances(flat, codebook):
    """(N, D), (K, D) -> (N, K) squared-L2 distance matrix (reference formula)."""
    return (
        jnp.sum(jnp.square(flat), axis=1, keepdims=True)
        + jnp.sum(jnp.square(codebook), axis=1)
        - 2.0 * jnp.dot(flat, codebook.T, preferred_element_type=flat.dtype)
    )


def vq_search_xla(flat, codebook):
    d = vq_distances(flat, codebook)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    onehot = jax.nn.one_hot(idx, codebook.shape[0], dtype=flat.dtype)
    quantized = jnp.dot(onehot, codebook, preferred_element_type=flat.dtype)
    counts = jnp.sum(onehot, axis=0)
    dw = jnp.dot(onehot.T, flat, preferred_element_type=flat.dtype)
    return VQSearchResult(idx, quantized, counts, dw)


# -------------------- Pallas fused kernel --------------------


def _vq_kernel(flat_ref, cb_ref, n_ref, idx_ref, q_ref, counts_ref, dw_ref):
    i = pl.program_id(0)
    tile_n = flat_ref.shape[0]
    K = cb_ref.shape[0]

    z = flat_ref[:]                                   # (tile_n, D)
    cb = cb_ref[:]                                    # (K, D)
    # full reference distance formula (vector_quantizer.py:96-98), including
    # the row-constant ||z||^2 term: it cannot change the argmin in exact
    # arithmetic, and keeping it preserves float near-tie behavior vs the
    # XLA path bit-for-bit.  ||e||^2 is recomputed per tile from the resident
    # cb block — K*D ops on the VPU, cheaper than a separate XLA kernel +
    # an extra HBM input.
    zsq = jnp.sum(jnp.square(z), axis=1, keepdims=True)
    cbsq = jnp.sum(jnp.square(cb), axis=1).reshape(1, K)
    d = zsq + cbsq - 2.0 * jnp.dot(
        z, cb.T, preferred_element_type=jnp.float32
    )                                                 # (tile_n, K)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)     # (tile_n,)

    # one-hot via compare against a lane iota (VPU)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_n, K), 1)
    onehot = (lane == idx[:, None]).astype(jnp.float32)

    # mask rows past the true N (the ragged last tile's garbage rows must
    # not pollute the counts/dw accumulators)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0) + i * tile_n
    valid = row < n_ref[0]                            # (tile_n, 1) bool
    masked_onehot = jnp.where(valid, onehot, 0.0)

    idx_ref[:] = idx.reshape(tile_n, 1)
    q_ref[:] = jnp.dot(onehot, cb, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    counts_ref[:] += jnp.sum(masked_onehot, axis=0, keepdims=True)
    # z's out-of-bounds rows are uninitialized (NaN in interpret mode) and
    # 0 * NaN = NaN, so the dw contraction needs z where-masked as well
    dw_ref[:] += jnp.dot(masked_onehot.T, jnp.where(valid, z, 0.0),
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def _vq_search_pallas_fwd(flat, codebook, tile_n: int = 1024):
    """One fused pallas_call.  flat (N, D) f32, codebook (K, D) f32.

    Grid over row tiles with a RAGGED last tile (Pallas masks the
    out-of-bounds writes; garbage rows in the last tile are excluded from
    the counts/dw accumulators by the in-kernel n mask) — no host-side
    padding copy, and outputs come out at exactly N rows.
    """
    N, D = flat.shape
    K = codebook.shape[0]
    tile_n = min(tile_n, max(8, -(-N // 8) * 8))  # never tile wider than N
    grid = (-(-N // tile_n),)

    idx, q, counts, dw = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, D), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((K, D), jnp.float32),
        ],
    )(flat.astype(jnp.float32), codebook.astype(jnp.float32),
      jnp.array([N], jnp.int32))

    return VQSearchResult(idx[:, 0], q, counts[0], dw)


@jax.custom_vjp
def vq_search_pallas(flat, codebook):
    """Fused Pallas codebook search, differentiable (see module docstring)."""
    return _vq_search_pallas_fwd(flat, codebook)


def _vq_vjp_fwd(flat, codebook):
    res = _vq_search_pallas_fwd(flat, codebook)
    return res, (res.indices, codebook.shape[0])


def _vq_vjp_bwd(residuals, g):
    idx, K = residuals
    g_q = g.quantized
    g_dw = g.dw
    onehot = jax.nn.one_hot(idx, K, dtype=g_q.dtype)
    # quantized = onehot @ codebook  (argmin locally constant)
    g_codebook = jnp.dot(onehot.T, g_q, preferred_element_type=g_q.dtype)
    # dw = onehot^T @ flat
    g_flat = jnp.dot(onehot, g_dw, preferred_element_type=g_dw.dtype)
    return g_flat, g_codebook


vq_search_pallas.defvjp(_vq_vjp_fwd, _vq_vjp_bwd)


# The fused kernel beats the XLA op chain from small sizes up on real TPU
# (measured on v5e, see RESULTS.md: flagship 6016x44 included) — the
# crossover only matters below ~1k rows where both are launch-bound.
_PALLAS_MIN_ROWS = 2048


def vq_search(flat, codebook, use_pallas: bool = None):
    """Dispatch: fused Pallas kernel on TPU (including the flagship
    vq44-mfcc39 shape), XLA elsewhere / for tiny launch-bound problems."""
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and flat.shape[0] >= _PALLAS_MIN_ROWS)
    if use_pallas:
        return vq_search_pallas(flat, codebook)
    return vq_search_xla(flat, codebook)
