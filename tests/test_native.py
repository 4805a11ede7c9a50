"""Native C++ ingest kernels vs numpy/JAX reference implementations."""
import numpy as np
import jax.numpy as jnp
import pytest

from vqvae_speech_tpu import native
from vqvae_speech_tpu.data.audio import trim_silence
from vqvae_speech_tpu.ops import mu_law_encode


@pytest.fixture(scope="module")
def native_available():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")
    return True


def test_native_builds(native_available):
    assert native.available()


def test_rms_trim_bounds_matches_python(native_available):
    rng = np.random.default_rng(0)
    rate = 16000
    sig = np.concatenate([
        np.zeros(rate // 2),
        0.5 * np.sin(2 * np.pi * 220 * np.arange(rate) / rate),
        np.zeros(rate // 4)]).astype(np.float32)
    sig += 1e-4 * rng.standard_normal(len(sig)).astype(np.float32)
    want_trimmed, (ws, we) = trim_silence(sig, top_db=20)
    gs, ge = native.rms_trim_bounds(sig, top_db=20.0)
    assert (gs, ge) == (ws, we)


def test_mu_law_native_matches_jax(native_available):
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, 4096).astype(np.float32)
    x = np.concatenate([x, np.array([-1, 0, 1, 0.5], np.float32)])
    got = native.mu_law_encode_native(x)
    want = np.asarray(mu_law_encode(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_peak_normalize_native(native_available):
    x = np.array([0.1, -0.5, 0.25], np.float32)
    out = native.peak_normalize(x)
    np.testing.assert_allclose(out, x / 0.5, rtol=1e-6)
    # zero signal passes through
    z = np.zeros(4, np.float32)
    np.testing.assert_array_equal(native.peak_normalize(z), z)
