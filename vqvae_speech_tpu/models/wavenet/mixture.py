"""Discretized mixture-of-logistics loss and sampling (PixelCNN++ style).

Capability-parity with reference src/wavenet_vocoder/mixture.py:42-179 —
the scalar-output WaveNet mode: y holds [logit_probs | means | log_scales]
stacked on the channel axis, targets are waveform samples in [-1, 1]
discretized into ``num_classes`` bins.
"""
import jax
import jax.numpy as jnp


def log_sum_exp(x, axis=-1):
    m = jnp.max(x, axis=axis, keepdims=True)
    return jnp.squeeze(m, axis) + jnp.log(
        jnp.sum(jnp.exp(x - m), axis=axis))


def log_prob_from_logits(x, axis=-1):
    m = jnp.max(x, axis=axis, keepdims=True)
    return x - m - jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))


def discretized_mix_logistic_loss(y_hat, y, num_classes: int = 256,
                                  log_scale_min: float = -7.0,
                                  reduce: bool = True):
    """y_hat: (B, T, 3*nr_mix) [logits | means | log_scales]; y: (B, T, 1)
    targets in [-1, 1].  Matches reference mixture.py:51-131 (which operates
    channels-first; the math is identical)."""
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix:2 * nr_mix]
    log_scales = jnp.maximum(y_hat[..., 2 * nr_mix:], log_scale_min)

    y = jnp.broadcast_to(y, y.shape[:-1] + (nr_mix,))
    centered = y - means
    inv_stdv = jnp.exp(-log_scales)
    half_bin = 1.0 / (num_classes - 1)
    plus_in = inv_stdv * (centered + half_bin)
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered - half_bin)
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)        # log CDF at +inf edge
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)         # log(1-CDF) at -inf edge
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - jnp.log((num_classes - 1) / 2.0))
    log_probs = jnp.where(
        y < -0.999, log_cdf_plus,
        jnp.where(y > 0.999, log_one_minus_cdf_min, inner))

    log_probs = log_probs + log_prob_from_logits(logit_probs)
    lse = log_sum_exp(log_probs)
    if reduce:
        return -jnp.mean(lse)
    return -lse[..., None]


def sample_from_discretized_mix_logistic(key, y, log_scale_min: float = -7.0):
    """y: (B, T, 3*nr_mix) -> samples (B, T) in [-1, 1]
    (reference mixture.py:143-179, with on-device Gumbel mixture selection)."""
    nr_mix = y.shape[-1] // 3
    logit_probs = y[..., :nr_mix]
    k_sel, k_u = jax.random.split(key)
    # Gumbel-max mixture selection (the reference uses uniform log-log trick)
    sel = jax.random.categorical(k_sel, logit_probs, axis=-1)
    one_hot = jax.nn.one_hot(sel, nr_mix, dtype=y.dtype)
    means = jnp.sum(y[..., nr_mix:2 * nr_mix] * one_hot, axis=-1)
    log_scales = jnp.maximum(
        jnp.sum(y[..., 2 * nr_mix:] * one_hot, axis=-1), log_scale_min)
    u = jax.random.uniform(k_u, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log1p(-u))
    return jnp.clip(x, -1.0, 1.0)
