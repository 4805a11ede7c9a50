"""Mu-law parity tests against a direct numpy transcription of the reference
semantics (reference: src/speech_utils/mu_law.py:33-46)."""
import numpy as np
import jax.numpy as jnp

from vqvae_speech_tpu.ops import mu_law_encode, mu_law_decode


def _np_encode(x, mu=256):
    x = x.astype(np.float32)
    y = np.sign(x) * np.log(1 + mu * np.abs(x)) / np.log(1 + mu)
    return (np.digitize(y, 2 * np.arange(mu) / mu - 1) - 1).astype(np.int64)


def _np_decode(y, mu=256):
    y = y.astype(np.float32)
    y = 2 * y / mu - 1
    return (np.sign(y) / mu * ((mu) ** np.abs(y) - 1)).astype(np.float32)


def test_encode_matches_numpy_reference():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=4096).astype(np.float32)
    # include exact boundary values
    x = np.concatenate([x, np.array([-1.0, 0.0, 1.0, 0.5, -0.5], np.float32)])
    got = np.asarray(mu_law_encode(jnp.asarray(x)))
    want = _np_encode(x)
    np.testing.assert_array_equal(got, want)


def test_decode_matches_numpy_reference():
    y = np.arange(256)
    got = np.asarray(mu_law_decode(jnp.asarray(y)))
    want = _np_decode(y)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_roundtrip_error_small():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=1000).astype(np.float32)
    enc = mu_law_encode(jnp.asarray(x))
    dec = np.asarray(mu_law_decode(enc))
    # mu-law quantization error bound: reconstruction within one bin width of
    # the compander curve
    assert np.max(np.abs(dec - x)) < 0.05
