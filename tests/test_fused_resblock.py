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
