"""ClariNet losses: Gaussian NLL, Gaussian sampling, closed-form KL, STFT loss.

Capability-parity with reference src/clarinet/loss.py:30-67 and the conv-based
STFT at src/clarinet/modules.py:142-188 (channels-last; the STFT magnitude is
computed with framing + rfft, numerically the Fourier-basis conv the
reference builds explicitly).
"""
import math

import jax
import jax.numpy as jnp


def gaussian_loss(y_hat, y, log_std_min: float = -7.0):
    """y_hat: (B, T, 2) [mean, log_std]; y: (B, T, 1).  Per-element NLL
    (reference loss.py:30-41 — note its sign convention: the returned value
    is the negative log-prob term minimized directly)."""
    mean = y_hat[..., 0:1]
    log_std = jnp.maximum(y_hat[..., 1:2], log_std_min)
    log_probs = -0.5 * (
        -math.log(2.0 * math.pi) - 2.0 * log_std
        - jnp.square(y - mean) * jnp.exp(-2.0 * log_std))
    return jnp.squeeze(log_probs, -1)


def sample_from_gaussian(key, y_hat, log_std_min: float = -7.0,
                         scale_factor: float = 1.0):
    """y_hat: (B, T, 2) -> samples (B, T, 1) clipped to [-sf, sf]."""
    mean = y_hat[..., 0:1]
    log_std = jnp.maximum(y_hat[..., 1:2], log_std_min)
    sample = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
    return jnp.clip(sample, -scale_factor, scale_factor)


def kl_gaussians(mu_q, logs_q, mu_p, logs_p, log_std_min: float = -7.0,
                 regularization: bool = True):
    """Closed-form KL(q || p) + log-scale regularizer
    (reference loss.py:57-67)."""
    logs_q = jnp.maximum(logs_q, log_std_min)
    logs_p = jnp.maximum(logs_p, log_std_min)
    kl = (logs_p - logs_q) + 0.5 * (
        (jnp.exp(2.0 * logs_q) + jnp.square(mu_p - mu_q))
        * jnp.exp(-2.0 * logs_p) - 1.0)
    reg = jnp.square(logs_q - logs_p) if regularization else None
    return kl, reg


def kl_loss(mu_q, logs_q, mu_p, logs_p, regularization: bool = True):
    """total = KL + 4*reg, averaged (reference modules.py:110-124)."""
    kl, reg = kl_gaussians(mu_q, logs_q, mu_p, logs_p,
                           regularization=regularization)
    total = kl + (reg * 4.0 if reg is not None else 0.0)
    return (jnp.mean(total), jnp.mean(kl),
            jnp.mean(reg) if reg is not None else jnp.zeros(()))


def stft_magnitude(x, filter_length: int = 1024, hop_length: int = 256):
    """x: (B, T) -> magnitude (B, n_bins, n_frames).

    Matches the reference conv-STFT: zero-pad ``filter_length`` on both sides
    then stride-hop rectangular frames against the Fourier basis
    (modules.py:163-172).
    """
    pad = filter_length
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    T = xp.shape[1]
    n_frames = (T - filter_length) // hop_length + 1
    idx = (jnp.arange(filter_length)[None, :]
           + hop_length * jnp.arange(n_frames)[:, None])
    frames = xp[:, idx]                       # (B, n_frames, filter_length)
    spec = jnp.fft.rfft(frames, axis=-1)      # (B, n_frames, n_bins)
    return jnp.abs(spec).swapaxes(1, 2)


def stft_frame_loss(x_student, x_truth, filter_length: int = 1024,
                    hop_length: int = 256):
    """MSE between STFT magnitudes (the distillation frame loss,
    reference train_student.py:111-115)."""
    s = stft_magnitude(x_student, filter_length, hop_length)
    t = stft_magnitude(x_truth, filter_length, hop_length)
    return jnp.mean(jnp.square(s - t))
