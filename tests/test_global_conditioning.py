"""Speaker global-conditioning tests.

Mirrors the reference's only unit test (test/vq_vae_speech/
global_conditioning_test.py:41-75, which asserts unexpanded (1,128,1) and
expanded (1,128,7680) shapes — channels-first; ours are (B,1,gin)/(B,T,gin))
without its hard VCTK-download dependency.
"""
import numpy as np
import jax
import jax.numpy as jnp

from vqvae_speech_tpu.models.global_conditioning import (
    global_conditioning_init, global_conditioning_apply)


def test_unexpanded_shape():
    params = global_conditioning_init(jax.random.PRNGKey(0), 109, 128)
    g = global_conditioning_apply(params, jnp.array([3]), T=7680,
                                  expand=False)
    assert g.shape == (1, 1, 128)


def test_expanded_shape_and_broadcast():
    params = global_conditioning_init(jax.random.PRNGKey(0), 109, 128)
    g = global_conditioning_apply(params, jnp.array([3, 7]), T=7680,
                                  expand=True)
    assert g.shape == (2, 7680, 128)
    # constant over time, distinct across speakers
    gn = np.asarray(g)
    assert np.all(gn[:, 0, :] == gn[:, -1, :])
    assert not np.array_equal(gn[0, 0], gn[1, 0])


def test_lookup_matches_table():
    params = global_conditioning_init(jax.random.PRNGKey(1), 10, 40)
    g = global_conditioning_apply(params, jnp.array([4]), T=5)
    np.testing.assert_array_equal(np.asarray(g[0, 0]),
                                  np.asarray(params["table"][4]))


def test_resample_key_reproduces_reference_quirk():
    """With resample_key the table is fresh random noise per call
    (the reference rebuilds its nn.Embedding every call,
    global_conditioning.py:34)."""
    params = global_conditioning_init(jax.random.PRNGKey(2), 10, 40)
    g1 = global_conditioning_apply(params, jnp.array([0]), T=3,
                                   resample_key=jax.random.PRNGKey(5))
    g2 = global_conditioning_apply(params, jnp.array([0]), T=3,
                                   resample_key=jax.random.PRNGKey(6))
    assert not np.array_equal(np.asarray(g1), np.asarray(g2))
    g3 = global_conditioning_apply(params, jnp.array([0]), T=3,
                                   resample_key=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g3))
