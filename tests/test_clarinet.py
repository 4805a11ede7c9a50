"""ClariNet teacher/student tests: shapes, causality, loss goldens,
IAF composition, distillation step, scan generation."""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from vqvae_speech_tpu.models.clarinet import (
    GaussianWaveNetConfig, gaussian_wavenet_init, gaussian_wavenet_apply,
    gaussian_wavenet_upsample, gaussian_wavenet_generate,
    StudentConfig, wavenet_student_init, wavenet_student_apply,
    gaussian_loss, sample_from_gaussian, kl_gaussians, stft_magnitude)
from vqvae_speech_tpu.models.clarinet.loss import kl_loss, stft_frame_loss

TEACHER = GaussianWaveNetConfig(
    num_blocks=2, num_layers=3, front_channels=8, residual_channels=12,
    gate_channels=12, skip_channels=12, kernel_size=2, cin_channels=10,
    upsample_scales=(4, 4))


def test_teacher_shapes_and_upsampling():
    params = gaussian_wavenet_init(jax.random.PRNGKey(0), TEACHER)
    B, Tc = 2, 6
    T = Tc * 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 1))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, Tc, 10))
    out = gaussian_wavenet_apply(params, TEACHER, x, c)
    assert out.shape == (B, T, 2)
    c_up = gaussian_wavenet_upsample(params, c, TEACHER)
    assert c_up.shape == (B, T, 10)


def test_teacher_causality():
    params = gaussian_wavenet_init(jax.random.PRNGKey(0), TEACHER)
    B, Tc = 1, 6
    T = Tc * 16
    c = jax.random.normal(jax.random.PRNGKey(2), (B, Tc, 10))
    x1 = jax.random.normal(jax.random.PRNGKey(3), (B, T, 1))
    x2 = np.asarray(x1).copy()
    x2[0, 50, 0] += 10.0
    y1 = np.asarray(gaussian_wavenet_apply(params, TEACHER, x1, c))
    y2 = np.asarray(gaussian_wavenet_apply(params, TEACHER,
                                           jnp.asarray(x2), c))
    np.testing.assert_allclose(y1[0, :50], y2[0, :50], rtol=1e-5, atol=1e-5)
    assert not np.allclose(y1[0, 50:], y2[0, 50:])


@pytest.mark.slow
def test_generate_matches_batch_teacher():
    """Ring-buffer scan generation must equal re-running the batch conv path
    on the emitted samples (teacher-forcing replay)."""
    params = gaussian_wavenet_init(jax.random.PRNGKey(0), TEACHER)
    B, Tc = 2, 4
    T = Tc * 16
    c = jax.random.normal(jax.random.PRNGKey(2), (B, Tc, 10))
    # deterministic sampling: log_std -> -inf is not reachable; instead use
    # scale_factor tiny so samples ~= clipped mean? Simplest: run with a
    # fixed rng and replay the sampled stream through the batch path.
    samples = gaussian_wavenet_generate(params, TEACHER,
                                        jax.random.PRNGKey(5), T, c)
    assert samples.shape == (B, T)
    # batch replay: x[t] = sample[t-1], x[0] = 0
    x = np.zeros((B, T, 1), np.float32)
    x[:, 1:, 0] = np.asarray(samples)[:, :-1]
    out = np.asarray(gaussian_wavenet_apply(params, TEACHER,
                                            jnp.asarray(x), c))
    mean = out[..., 0]
    log_std = np.maximum(out[..., 1], -7.0)
    # each emitted sample must be plausible under the replayed Gaussian:
    # |sample - mean| <= 6 std (unless clipped at +-1)
    s = np.asarray(samples)
    interior = np.abs(s) < 0.999
    z = np.abs(s - mean) / np.exp(log_std)
    assert np.all(z[interior] < 8.0)


def test_gaussian_loss_matches_torch_transcription():
    rng = np.random.default_rng(0)
    y_hat = rng.standard_normal((2, 30, 2)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 30, 1)).astype(np.float32)
    got = np.asarray(gaussian_loss(jnp.asarray(y_hat), jnp.asarray(y)))

    ty_hat = torch.from_numpy(y_hat)
    mean, log_std = ty_hat[..., :1], torch.clamp(ty_hat[..., 1:], min=-7.0)
    want = -0.5 * (-math.log(2 * math.pi) - 2.0 * log_std
                   - (torch.from_numpy(y) - mean).pow(2)
                   * torch.exp(-2.0 * log_std))
    np.testing.assert_allclose(got, want.squeeze(-1).numpy(), rtol=1e-5)


def test_kl_gaussians_golden():
    rng = np.random.default_rng(1)
    mu_q = rng.standard_normal((2, 20, 1)).astype(np.float32)
    logs_q = rng.standard_normal((2, 20, 1)).astype(np.float32) * 0.1
    mu_p = rng.standard_normal((2, 20, 1)).astype(np.float32)
    logs_p = rng.standard_normal((2, 20, 1)).astype(np.float32) * 0.1
    kl, reg = kl_gaussians(*map(jnp.asarray, (mu_q, logs_q, mu_p, logs_p)))
    want_kl = ((logs_p - logs_q)
               + 0.5 * ((np.exp(2 * logs_q) + (mu_p - mu_q) ** 2)
                        * np.exp(-2 * logs_p) - 1))
    np.testing.assert_allclose(np.asarray(kl), want_kl, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(reg), (logs_q - logs_p) ** 2,
                               rtol=1e-5)
    # KL(q||q) == 0
    kl0, _ = kl_gaussians(jnp.asarray(mu_q), jnp.asarray(logs_q),
                          jnp.asarray(mu_q), jnp.asarray(logs_q))
    np.testing.assert_allclose(np.asarray(kl0), 0.0, atol=1e-6)


def test_stft_magnitude_matches_scipy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 2048)).astype(np.float32)
    got = np.asarray(stft_magnitude(jnp.asarray(x), 256, 64))
    # direct numpy transcription of the conv-STFT (rect window, pad=filter)
    xp = np.pad(x[0], (256, 256))
    frames = np.stack([xp[i * 64: i * 64 + 256]
                       for i in range((len(xp) - 256) // 64 + 1)])
    want = np.abs(np.fft.rfft(frames, axis=-1)).T
    assert got.shape[1:] == want.shape
    np.testing.assert_allclose(got[0], want, rtol=1e-3, atol=1e-4)


def test_student_iaf_composition():
    cfg = StudentConfig(num_blocks_student=(1, 2), num_layers=2,
                        front_channels=4, residual_channels=8,
                        gate_channels=8, skip_channels=8, kernel_size=3,
                        cin_channels=10)
    params = wavenet_student_init(jax.random.PRNGKey(0), cfg)
    B, T = 2, 64
    z = jax.random.normal(jax.random.PRNGKey(1), (B, T, 1))
    c_up = jax.random.normal(jax.random.PRNGKey(2), (B, T, 10))
    x, mu_tot, logs_tot = wavenet_student_apply(params, cfg, z, c_up)
    assert x.shape == (B, T, 1)
    assert mu_tot.shape == (B, T - 1, 1)
    assert logs_tot.shape == (B, T - 1, 1)
    # composed affine: x[1:] == z[1:] * exp(logs_tot) + mu_tot
    np.testing.assert_allclose(
        np.asarray(x[:, 1:, :]),
        np.asarray(z[:, 1:, :] * jnp.exp(logs_tot) + mu_tot),
        rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_distillation_step_runs_and_is_finite():
    """One full probability-density-distillation loss computation
    (reference train_student.py:96-116)."""
    teacher_cfg = TEACHER
    student_cfg = StudentConfig(num_blocks_student=(1, 1), num_layers=2,
                                front_channels=4, residual_channels=8,
                                gate_channels=8, skip_channels=8,
                                kernel_size=3, cin_channels=10)
    t_params = gaussian_wavenet_init(jax.random.PRNGKey(0), teacher_cfg)
    s_params = wavenet_student_init(jax.random.PRNGKey(1), student_cfg)
    B, Tc = 2, 4
    T = Tc * 16
    x_true = jax.random.normal(jax.random.PRNGKey(2), (B, T, 1)) * 0.1
    c = jax.random.normal(jax.random.PRNGKey(3), (B, Tc, 10))

    def loss_fn(s_params):
        z = jax.random.normal(jax.random.PRNGKey(4), (B, T, 1))
        c_up = gaussian_wavenet_upsample(t_params, c, teacher_cfg)
        x_s, mu_s, logs_s = wavenet_student_apply(s_params, student_cfg, z,
                                                  c_up)
        mu_logs_t = gaussian_wavenet_apply(t_params, teacher_cfg, x_s, c)
        total, kl, reg = kl_loss(mu_s, logs_s,
                                 mu_logs_t[:, :-1, 0:1],
                                 mu_logs_t[:, :-1, 1:2])
        frame = stft_frame_loss(x_s[:, 1:, 0], x_true[:, 1:, 0],
                                filter_length=64, hop_length=16)
        return total + frame

    loss, grads = jax.value_and_grad(loss_fn)(s_params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(g))
               for g in jax.tree_util.tree_leaves(grads))


def test_student_generate_fused_matches_xla():
    """use_fused=True (tiled Pallas resblock chains, interpret mode on CPU)
    must reproduce the XLA one-pass synthesis at batch 1, including a flow
    with num_blocks > 1 (per-block kernel launches chain correctly)."""
    from vqvae_speech_tpu.models.clarinet import wavenet_student_generate
    cfg = StudentConfig(num_blocks_student=(1, 2), num_layers=2,
                        front_channels=4, residual_channels=8,
                        gate_channels=8, skip_channels=8,
                        kernel_size=3, cin_channels=10)
    params = wavenet_student_init(jax.random.PRNGKey(0), cfg)
    T = 96
    z = jax.random.normal(jax.random.PRNGKey(1), (1, T, 1))
    c_up = jax.random.normal(jax.random.PRNGKey(2), (1, T, 10))
    want = wavenet_student_generate(params, cfg, z, c_up)
    got = wavenet_student_generate(params, cfg, z, c_up, use_fused=True,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # batch > 1 is rejected (single-stream path)
    z2 = jnp.concatenate([z, z], axis=0)
    c2 = jnp.concatenate([c_up, c_up], axis=0)
    with pytest.raises(ValueError, match="batch-1"):
        wavenet_student_generate(params, cfg, z2, c2, use_fused=True,
                                 interpret=True)


def test_student_generate_bf16_close_to_f32():
    from vqvae_speech_tpu.models.clarinet import wavenet_student_generate
    cfg = StudentConfig(num_blocks_student=(1, 1), num_layers=2,
                        front_channels=4, residual_channels=8,
                        gate_channels=8, skip_channels=8,
                        kernel_size=3, cin_channels=10)
    params = wavenet_student_init(jax.random.PRNGKey(0), cfg)
    B, T = 2, 128
    z = jax.random.normal(jax.random.PRNGKey(1), (B, T, 1))
    c_up = jax.random.normal(jax.random.PRNGKey(2), (B, T, 10))
    x32 = wavenet_student_generate(params, cfg, z, c_up)
    xbf = wavenet_student_generate(params, cfg, z, c_up,
                                   compute_dtype=jnp.bfloat16)
    assert xbf.dtype == jnp.float32
    a, b = np.asarray(x32).ravel(), np.asarray(xbf).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr
