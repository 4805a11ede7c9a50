"""Fused Pallas resblock-chain prototype vs the XLA conv chain."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from vqvae_speech_tpu.models.clarinet.modules import (
    resblock_init, resblock_apply)
from vqvae_speech_tpu.ops.fused_resblock import (
    stack_block_weights, fused_block_chain)


def _reference_chain(blocks, x, c, kernel_size, layers):
    skip_sum = 0.0
    h = x
    for l, p in enumerate(blocks):
        h, s = resblock_apply(p, h, c, kernel_size, kernel_size ** l,
                              causal=True)
        skip_sum = skip_sum + s
    return h, skip_sum


def test_fused_chain_matches_xla_chain():
    layers, k, C, G, S, cin, T = 4, 3, 16, 32, 16, 8, 256
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, layers + 2)
    blocks = [resblock_init(ks[i], C, G, S, k, cin) for i in range(layers)]
    x = jax.random.normal(ks[-2], (1, T, C), jnp.float32)
    c = jax.random.normal(ks[-1], (1, T, cin), jnp.float32)

    want_x, want_skip = _reference_chain(blocks, x, c, k, layers)

    stacked = stack_block_weights(blocks, compute_dtype=jnp.float32)
    got_x, got_skip = fused_block_chain(x[0], c[0], stacked, layers=layers,
                                        kernel_size=k, interpret=True)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_skip), np.asarray(want_skip[0]),
                               rtol=2e-5, atol=2e-5)


def test_tiled_chain_matches_untiled_and_xla():
    """fused_block_chain_tiled must be exact vs the whole-T kernel and the
    XLA chain across tile boundaries (tails carried in scratch), including
    a T that is not a tile multiple (pad+trim path)."""
    from vqvae_speech_tpu.ops.fused_resblock import fused_block_chain_tiled

    layers, k, C, G, S, cin = 4, 3, 16, 32, 16, 8
    # max tail = 2*3^3 = 54; tile 64 > 54; T spans 3 tiles (one partial)
    tile, T = 64, 176
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, layers + 2)
    blocks = [resblock_init(ks[i], C, G, S, k, cin) for i in range(layers)]
    x = jax.random.normal(ks[-2], (1, T, C), jnp.float32)
    c = jax.random.normal(ks[-1], (1, T, cin), jnp.float32)

    want_x, want_skip = _reference_chain(blocks, x, c, k, layers)
    stacked = stack_block_weights(blocks, compute_dtype=jnp.float32)
    got_x, got_skip = fused_block_chain_tiled(
        x[0], c[0], stacked, layers=layers, kernel_size=k, tile=tile,
        interpret=True)
    assert got_x.shape == (T, C) and got_skip.shape == (T, S)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_skip), np.asarray(want_skip[0]),
                               rtol=2e-5, atol=2e-5)

    # tiled vs untiled kernels agree bit-for-bit (same accumulation order)
    ut_x, ut_skip = fused_block_chain(x[0], c[0], stacked, layers=layers,
                                      kernel_size=k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(ut_x))
    np.testing.assert_array_equal(np.asarray(got_skip), np.asarray(ut_skip))


def test_tiled_chain_rejects_small_tile():
    from vqvae_speech_tpu.ops.fused_resblock import fused_block_chain_tiled

    layers, k, C, G, S, cin, T = 4, 3, 16, 32, 16, 8, 128
    ks = jax.random.split(jax.random.PRNGKey(3), layers + 2)
    blocks = [resblock_init(ks[i], C, G, S, k, cin) for i in range(layers)]
    stacked = stack_block_weights(blocks, compute_dtype=jnp.float32)
    x = jax.random.normal(ks[-2], (T, C), jnp.float32)
    c = jax.random.normal(ks[-1], (T, cin), jnp.float32)
    import pytest
    with pytest.raises(ValueError, match="causal tail"):
        fused_block_chain_tiled(x, c, stacked, layers=layers, kernel_size=k,
                                tile=32, interpret=True)


def test_fused_chain_bf16_close_to_f32():
    layers, k, C, G, S, cin, T = 3, 3, 16, 32, 16, 8, 128
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, layers + 2)
    blocks = [resblock_init(ks[i], C, G, S, k, cin) for i in range(layers)]
    x = jax.random.normal(ks[-2], (1, T, C), jnp.float32)
    c = jax.random.normal(ks[-1], (1, T, cin), jnp.float32)
    want_x, want_skip = _reference_chain(blocks, x, c, k, layers)

    stacked = stack_block_weights(blocks, compute_dtype=jnp.bfloat16)
    got_x, got_skip = fused_block_chain(
        x[0].astype(jnp.bfloat16), c[0].astype(jnp.bfloat16), stacked,
        layers=layers, kernel_size=k, interpret=True)
    # bf16 storage, f32 accumulation: close but not exact
    np.testing.assert_allclose(np.asarray(got_x, np.float32),
                               np.asarray(want_x[0]), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(got_skip),
                               np.asarray(want_skip[0]), rtol=0.05,
                               atol=0.05)


def _reference_chain_nc(blocks, x, c, kernel_size, dilations):
    skip_sum = 0.0
    h = x
    for p, d in zip(blocks, dilations):
        h, s = resblock_apply(p, h, c, kernel_size, d, causal=False)
        skip_sum = skip_sum + s
    return h, skip_sum


def test_nc_chain_matches_xla_chain():
    """fused_block_chain_nc (halo windows + per-layer global-edge masking)
    must be exact vs the non-causal XLA chain, including windows whose halo
    crosses the sequence edges and a T that is not a tile multiple."""
    from vqvae_speech_tpu.ops.fused_resblock import fused_block_chain_nc

    layers, k, C, G, S, cin = 2, 3, 16, 32, 16, 8
    dil = tuple(2 ** i for i in range(layers))      # flow convention
    for tile, T in ((32, 96), (32, 83), (64, 40)):
        ks = jax.random.split(jax.random.PRNGKey(7), layers + 2)
        blocks = [resblock_init(ks[i], C, G, S, k, cin)
                  for i in range(layers)]
        x = jax.random.normal(ks[-2], (1, T, C), jnp.float32)
        c = jax.random.normal(ks[-1], (1, T, cin), jnp.float32)
        want_x, want_skip = _reference_chain_nc(blocks, x, c, k, dil)
        stacked = stack_block_weights(blocks, compute_dtype=jnp.float32)
        got_x, got_skip = fused_block_chain_nc(
            x[0], c[0], stacked, layers=layers, kernel_size=k,
            dilations=dil, tile=tile, interpret=True)
        assert got_x.shape == (T, C) and got_skip.shape == (T, S)
        np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x[0]),
                                   rtol=2e-5, atol=2e-5, err_msg=f"T={T}")
        np.testing.assert_allclose(np.asarray(got_skip),
                                   np.asarray(want_skip[0]),
                                   rtol=2e-5, atol=2e-5, err_msg=f"T={T}")


def test_nc_chain_deep_dilations():
    """A deeper non-causal chain (dilations 1,2,4,8 -> halo 15) across
    several windows, bf16 compute close to f32."""
    from vqvae_speech_tpu.ops.fused_resblock import fused_block_chain_nc

    layers, k, C, G, S, cin, T, tile = 4, 3, 16, 32, 16, 8, 160, 48
    dil = tuple(2 ** i for i in range(layers))
    ks = jax.random.split(jax.random.PRNGKey(9), layers + 2)
    blocks = [resblock_init(ks[i], C, G, S, k, cin) for i in range(layers)]
    x = jax.random.normal(ks[-2], (1, T, C), jnp.float32)
    c = jax.random.normal(ks[-1], (1, T, cin), jnp.float32)
    want_x, want_skip = _reference_chain_nc(blocks, x, c, k, dil)
    stacked = stack_block_weights(blocks, compute_dtype=jnp.float32)
    got_x, got_skip = fused_block_chain_nc(
        x[0], c[0], stacked, layers=layers, kernel_size=k, dilations=dil,
        tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_skip), np.asarray(want_skip[0]),
                               rtol=2e-5, atol=2e-5)
