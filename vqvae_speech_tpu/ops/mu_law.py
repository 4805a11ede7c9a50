"""Mu-law companding, XLA-native.

Semantics match the reference implementation
(reference: src/speech_utils/mu_law.py:33-46): the encoder companding curve is
``sign(x) * log1p(mu*|x|) / log1p(mu)`` digitized into ``mu`` bins with bin
edges ``2*arange(mu)/mu - 1`` (np.digitize, right-open bins) minus one, and the
decoder is the exact inverse of the compander applied to the bin *scaled* value
``2*y/mu - 1``.

Note np.digitize(y, edges) - 1 maps y in [edges[i], edges[i+1]) -> i, with
y < -1 -> -1 and y >= last edge -> mu-1.  For y in [-1, 1] this is
``floor((y + 1) * mu / 2)`` clipped to [0, mu-1] — a pure elementwise op that
vectorizes trivially on the VPU (no host round-trip, unlike the numpy
reference).
"""
import jax.numpy as jnp


def mu_law_encode(x, mu: int = 256):
    """Encode float waveform in [-1, 1] to integer bins [0, mu-1].

    Matches reference src/speech_utils/mu_law.py:34-39 bit-for-bit on
    in-range inputs (verified in tests against a numpy transcription).
    """
    x = x.astype(jnp.float32)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(jnp.float32(mu))
    # np.digitize(y, 2*arange(mu)/mu - 1) - 1  ==  floor((y+1)*mu/2) for
    # y in [-1, 1), with the exact edge y == edge[i] binning to i.
    idx = jnp.floor((y + 1.0) * (mu / 2.0)).astype(jnp.int32)
    return jnp.clip(idx, -1, mu - 1)


def mu_law_decode(y, mu: int = 256):
    """Decode integer bins back to float waveform (reference mu_law.py:41-46)."""
    y = y.astype(jnp.float32)
    y = 2.0 * y / mu - 1.0
    x = jnp.sign(y) / mu * (jnp.power(jnp.float32(mu), jnp.abs(y)) - 1.0)
    return x.astype(jnp.float32)
