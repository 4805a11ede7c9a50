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


def _vq_kernel(flat_ref, cb_ref, cbsq_ref, n_ref,
               idx_ref, q_ref, counts_ref, dw_ref):
    i = pl.program_id(0)
    tile_n = flat_ref.shape[0]
    K = cb_ref.shape[0]

    z = flat_ref[:]                                   # (tile_n, D)
    cb = cb_ref[:]                                    # (K, D)
    # full reference distance formula (vector_quantizer.py:96-98); keeping the
    # row-constant ||z||^2 term preserves float near-tie behavior vs the XLA path
    zsq = jnp.sum(jnp.square(z), axis=1, keepdims=True)
    d = zsq + cbsq_ref[:].reshape(1, K) - 2.0 * jnp.dot(
        z, cb.T, preferred_element_type=jnp.float32
    )                                                 # (tile_n, K)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)     # (tile_n,)

    # one-hot via compare against a lane iota (VPU)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_n, K), 1)
    onehot = (lane == idx[:, None]).astype(jnp.float32)

    # mask rows past the true N (padding rows must not pollute stats)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0) + i * tile_n
    valid = (row < n_ref[0]).astype(jnp.float32)      # (tile_n, 1)
    masked_onehot = onehot * valid

    idx_ref[:] = idx.reshape(tile_n, 1)
    q_ref[:] = jnp.dot(onehot, cb, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    counts_ref[:] += jnp.sum(masked_onehot, axis=0, keepdims=True)
    dw_ref[:] += jnp.dot(masked_onehot.T, z, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def vq_search_pallas(flat, codebook, tile_n: int = 512):
    """Fused codebook search. flat (N, D) f32, codebook (K, D) f32.

    Grid over row tiles; counts/dw accumulate across the sequential TPU grid.
    Distance uses the ||e||^2 - 2 z.e form (dropping the row-constant ||z||^2,
    which cannot change the argmin) — fewer VPU ops and exactly the tie
    behavior of the full formula for equal-distance codes.
    """
    N, D = flat.shape
    K = codebook.shape[0]
    n_pad = -N % tile_n
    flat_p = jnp.pad(flat.astype(jnp.float32), ((0, n_pad), (0, 0)))
    grid = (flat_p.shape[0] // tile_n,)
    cbsq = jnp.sum(jnp.square(codebook.astype(jnp.float32)), axis=1).reshape(1, K)

    idx, q, counts, dw = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((flat_p.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((flat_p.shape[0], D), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((K, D), jnp.float32),
        ],
    )(flat_p, codebook.astype(jnp.float32), cbsq, jnp.array([N], jnp.int32))

    return VQSearchResult(idx[:N, 0], q[:N], counts[0], dw)


# Below this many distance-matrix elements the fused kernel's launch/padding
# overhead loses to XLA's own fusion (measured on v5e: XLA wins at the
# flagship's 6k x 44, Pallas wins at 65k x 512).
_PALLAS_MIN_ELEMENTS = 4 << 20


def vq_search(flat, codebook, use_pallas: bool = None):
    """Dispatch: fused Pallas kernel on TPU for large problems, XLA
    otherwise (size heuristic measured on v5e — see _PALLAS_MIN_ELEMENTS)."""
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and flat.shape[0] * codebook.shape[0] >= _PALLAS_MIN_ELEMENTS)
    if use_pallas:
        return vq_search_pallas(flat, codebook)
    return vq_search_xla(flat, codebook)
