"""WaveNet vocoder tests: causality, batch<->incremental equivalence,
conditioning upsampling parity vs torch, mixture loss golden values."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vqvae_speech_tpu.models.wavenet import (
    WaveNetConfig, wavenet_init, wavenet_apply, receptive_field_size,
    wavenet_incremental_generate,
    discretized_mix_logistic_loss, sample_from_discretized_mix_logistic)

TINY = WaveNetConfig(
    out_channels=32, layers=6, stacks=2, residual_channels=16,
    gate_channels=16, skip_out_channels=16, kernel_size=3, dropout=0.0,
    cin_channels=8, gin_channels=6, n_speakers=3,
    upsample_conditional_features=True, upsample_scales=(2, 4))


def test_receptive_field_size():
    # reference wavenet.py:66-84: layers=20, stacks=2, k=3 -> 4093
    assert receptive_field_size(20, 2, 3) == (3 - 1) * 2 * (2**10 - 1) + 1


def test_forward_shapes_and_upsampling():
    key = jax.random.PRNGKey(0)
    params = wavenet_init(key, TINY)
    B, T_samp = 2, 64
    Tc = T_samp // 8  # upsample 2*4 = 8
    x = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (B, T_samp), 0, 32), 32)
    c = jax.random.normal(jax.random.PRNGKey(2), (B, Tc, 8))
    g = jnp.array([0, 2])
    y = wavenet_apply(params, TINY, x, c=c, g=g)
    assert y.shape == (B, T_samp, 32)


def test_causality():
    """Changing input at time t must not affect outputs before t."""
    cfg = WaveNetConfig(out_channels=16, layers=4, stacks=2,
                        residual_channels=8, gate_channels=8,
                        skip_out_channels=8, kernel_size=3, dropout=0.0)
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    T = 40
    x1 = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, 16), 16)
    x2 = np.asarray(x1).copy()
    x2[0, 25] = 0
    x2[0, 25, 3] = 1.0  # perturb input at t=25
    y1 = np.asarray(wavenet_apply(params, cfg, x1))
    y2 = np.asarray(wavenet_apply(params, cfg, jnp.asarray(x2)))
    np.testing.assert_allclose(y1[0, :25], y2[0, :25], rtol=1e-5, atol=1e-6)
    assert not np.allclose(y1[0, 25:], y2[0, 25:])


@pytest.mark.slow
def test_incremental_matches_batch_forward():
    """Teacher-forcing equivalence: generate greedily with the scan path,
    then verify the batch conv path produces identical logits on the
    generated sequence."""
    cfg = WaveNetConfig(out_channels=24, layers=6, stacks=2,
                        residual_channels=12, gate_channels=12,
                        skip_out_channels=12, kernel_size=3, dropout=0.0,
                        cin_channels=4, gin_channels=6, n_speakers=3,
                        upsample_conditional_features=True,
                        upsample_scales=(4,))
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    B, T = 2, 32
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T // 4, 4))
    g = jnp.array([1, 2])

    outs, emitted = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(2), T, c=c, g=g, sample=False)
    assert outs.shape == (B, T, 24) and emitted.shape == (B, T)

    # rebuild the batch input stream: x[0] = zeros except bin 127 clipped to
    # out_channels... initial input is bin 127 one-hot only when
    # out_channels > 127; for 24 channels it's the zero vector.
    x_in = np.zeros((B, T, 24), np.float32)
    em = np.asarray(emitted)
    for t in range(1, T):
        x_in[:, t] = np.eye(24, dtype=np.float32)[em[:, t - 1]]
    y_batch = np.asarray(wavenet_apply(params, cfg, jnp.asarray(x_in), c=c, g=g))
    np.testing.assert_allclose(np.asarray(outs), y_batch, rtol=2e-4, atol=2e-4)


def test_upsample_matches_torch_convtranspose2d():
    cfg = TINY
    params = wavenet_init(jax.random.PRNGKey(3), cfg)
    from vqvae_speech_tpu.models.wavenet.model import _upsample_lc

    B, Tc, C = 2, 5, 8
    c = np.random.default_rng(0).standard_normal((B, Tc, C)).astype(np.float32)
    got = np.asarray(_upsample_lc(params, jnp.asarray(c), cfg))
    assert got.shape == (B, Tc * 8, C)

    # torch replica of the stack
    x = torch.from_numpy(c.transpose(0, 2, 1)).unsqueeze(1)  # (B,1,C,T)
    for p, s in zip(params["upsample_conv"], cfg.upsample_scales):
        v = np.asarray(p["v"])
        g = float(np.asarray(p["g"])[0])
        w = g * v / np.linalg.norm(v)
        # ours (kh, kw, 1, 1) -> torch convT (in=1, out=1, kh, kw)
        tw = torch.from_numpy(w[..., 0, 0]).unsqueeze(0).unsqueeze(0)
        x = F.conv_transpose2d(x, tw, bias=torch.from_numpy(np.asarray(p["b"])),
                               stride=(1, s), padding=(1, 0))
        x = F.relu(x)
    want = x.squeeze(1).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _torch_dml_loss(y_hat_btc, y_bt1, num_classes=256, log_scale_min=-7.0):
    """Direct transcription of the reference loss formulas
    (mixture.py:51-131) in torch, channels-last."""
    nr_mix = y_hat_btc.shape[-1] // 3
    logit_probs = y_hat_btc[..., :nr_mix]
    means = y_hat_btc[..., nr_mix:2 * nr_mix]
    log_scales = torch.clamp(y_hat_btc[..., 2 * nr_mix:], min=log_scale_min)
    y = y_bt1.expand(*y_bt1.shape[:-1], nr_mix)
    centered_y = y - means
    inv_stdv = torch.exp(-log_scales)
    plus_in = inv_stdv * (centered_y + 1.0 / (num_classes - 1))
    cdf_plus = torch.sigmoid(plus_in)
    min_in = inv_stdv * (centered_y - 1.0 / (num_classes - 1))
    cdf_min = torch.sigmoid(min_in)
    log_cdf_plus = plus_in - F.softplus(plus_in)
    log_one_minus_cdf_min = -F.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered_y
    log_pdf_mid = mid_in - log_scales - 2.0 * F.softplus(mid_in)
    inner_inner = torch.where(
        cdf_delta > 1e-5,
        torch.log(torch.clamp(cdf_delta, min=1e-12)),
        log_pdf_mid - float(np.log((num_classes - 1) / 2)))
    inner = torch.where(y > 0.999, log_one_minus_cdf_min, inner_inner)
    log_probs = torch.where(y < -0.999, log_cdf_plus, inner)
    log_probs = log_probs + F.log_softmax(logit_probs, dim=-1)
    return -torch.mean(torch.logsumexp(log_probs, dim=-1))


def test_discretized_mix_logistic_loss_matches_torch():
    rng = np.random.default_rng(1)
    B, T, nr_mix = 2, 50, 10
    y_hat = rng.standard_normal((B, T, 3 * nr_mix)).astype(np.float32)
    y = rng.uniform(-1, 1, (B, T, 1)).astype(np.float32)
    # include edge values
    y[0, 0, 0], y[0, 1, 0] = -1.0, 1.0
    got = float(discretized_mix_logistic_loss(jnp.asarray(y_hat),
                                              jnp.asarray(y)))
    want = float(_torch_dml_loss(torch.from_numpy(y_hat),
                                 torch.from_numpy(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dml_sampling_statistics():
    # one sharp mixture component at mean 0.5 -> samples concentrate there
    B, T, nr_mix = 1, 2000, 3
    y = np.zeros((B, T, 3 * nr_mix), np.float32)
    y[..., 0] = 10.0                 # logit: pick component 0
    y[..., nr_mix + 0] = 0.5         # mean
    y[..., 2 * nr_mix + 0] = -5.0    # log_scale (sharp)
    s = np.asarray(sample_from_discretized_mix_logistic(
        jax.random.PRNGKey(0), jnp.asarray(y)))
    assert abs(float(s.mean()) - 0.5) < 0.01
    assert float(s.std()) < 0.05


@pytest.mark.slow
def test_wavenet_vqvae_composite():
    from vqvae_speech_tpu.models.wavenet_vqvae import (
        wavenet_vqvae_init, wavenet_vqvae_apply)

    cfg = dict(
        input_features_filters=13, augment_input_features=True,
        num_hiddens=24, num_residual_layers=1, residual_channels=16,
        embedding_dim=8, num_embeddings=7, commitment_cost=0.25, decay=0.0,
        use_kaiming_normal=False, quantize=32, n_layers=4, n_loop=2,
        gate_channels=8, skip_out_channels=8, filter_size=3,
        local_condition_dim=16, global_condition_dim=6,
        use_jitter=True, jitter_probability=0.12,
    )
    params, state, wn_cfg = wavenet_vqvae_init(jax.random.PRNGKey(0), cfg, 3)
    B, T_feat = 2, 47
    # latent 24 frames -> conv k2 -> 23 -> upsample x384 = 8832 samples
    # (the reference's [2,2,2,2,2,12] scales multiply to 384, not the 768
    # its comment claims)
    T_samp = 23 * 384
    x_enc = jax.random.normal(jax.random.PRNGKey(1), (B, T_feat, 39))
    x_dec = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(2), (B, T_samp), 0, 32), 32)
    out = wavenet_vqvae_apply(params, state, wn_cfg, x_enc, x_dec,
                              jnp.array([0, 1]), cfg, training=True,
                              rng=jax.random.PRNGKey(3), use_pallas=False)
    assert out.reconstructed_x.shape == (B, T_samp, 32)
    assert np.isfinite(float(out.vq_loss))


def test_int8_weight_quantized_decode_close_to_f32():
    """Weight-only int8 decode: logits track the f32 path closely and the
    SHORT-horizon greedy streams mostly agree.

    Scope note (round-3 measurement, int8_fidelity/summary.json and
    int8_fidelity_cond/summary.json): this gate bounds per-step
    quantization noise at a 48-sample horizon.  Over long horizons AR
    trajectories diverge after the first argmax flip by construction —
    even mel-conditioned (conditioning pins the envelope, not the sample
    phase; measured agreement 0.04).  The serving-fidelity claim is
    distributional (NLL of the int8 stream under the f32 model: +0.012
    nats unconditioned / -0.14 sampled-conditioned vs the f32 stream's;
    RESULTS.md), not stream identity."""
    cfg = WaveNetConfig(out_channels=24, layers=6, stacks=2,
                        residual_channels=16, gate_channels=16,
                        skip_out_channels=16, kernel_size=3, dropout=0.0,
                        cin_channels=4, upsample_conditional_features=True,
                        upsample_scales=(4,))
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    B, T = 1, 48
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T // 4, 4))
    outs_f32, em_f32 = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(2), T, c=c, sample=False)
    outs_q, em_q = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(2), T, c=c, sample=False,
        weight_quant="int8")
    a = np.asarray(outs_f32).ravel()
    b = np.asarray(outs_q).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos
    agree = np.mean(np.asarray(em_f32) == np.asarray(em_q))
    assert agree > 0.7, agree


def test_fused_stack_decode_matches_default_path():
    """use_fused_stack=True (Pallas layer stack, interpret mode on CPU) must
    reproduce the default scan path's logits."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = WaveNetConfig(out_channels=24, layers=4, stacks=2,
                        residual_channels=16, gate_channels=16,
                        skip_out_channels=16, kernel_size=3, dropout=0.0,
                        cin_channels=4, upsample_conditional_features=True,
                        upsample_scales=(4,))
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    B, T = 1, 24
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T // 4, 4))
    outs, em = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(2), T, c=c, sample=False)
    with pltpu.force_tpu_interpret_mode():
        outs_f, em_f = wavenet_incremental_generate(
            params, cfg, jax.random.PRNGKey(2), T, c=c, sample=False,
            use_fused_stack=True)
    np.testing.assert_array_equal(np.asarray(em), np.asarray(em_f))
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outs_f),
                               rtol=1e-4, atol=1e-4)


def test_fused_stack_rejects_int8():
    """use_fused_stack + int8 was removed after the roofline analysis
    (RESULTS.md: the plain int8 scan runs at ~95% of the HBM weight-
    streaming floor, so the kernel can only lose); the combination must
    fail loudly, not silently pick a path."""
    cfg = WaveNetConfig(out_channels=24, layers=2, stacks=1,
                        residual_channels=16, gate_channels=16,
                        skip_out_channels=16, kernel_size=2, dropout=0.0,
                        cin_channels=-1, upsample_conditional_features=False)
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(AssertionError, match="streaming floor"):
        wavenet_incremental_generate(
            params, cfg, jax.random.PRNGKey(2), 4, sample=False,
            weight_quant="int8", use_fused_stack=True)


def test_int8_block_quantization_error_below_per_channel():
    """Blockwise scales (per tap x 128-input-block x output) must strictly
    reduce weight reconstruction error vs the round-2 per-output scales on
    a multi-block contraction (C=256 -> 2 blocks)."""
    from vqvae_speech_tpu.models.wavenet.incremental import (
        _quantize_int8, _quantize_int8_block, _block_matmul)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 256, 32)) * 0.05
    # heavy-tailed outliers (trained-net shape): what coarse scales choke on
    mask = jax.random.uniform(jax.random.PRNGKey(1), w.shape) < 0.01
    w = jnp.where(mask, w * 5.0, w)

    wq, s = _quantize_int8(w, axes=(0, 1))
    dense = wq.astype(jnp.float32) * s.reshape(1, 1, -1)
    err_pc = float(jnp.sqrt(jnp.mean((dense - w) ** 2)))

    wb, bs = _quantize_int8_block(w)
    assert bs.shape == (3, 2, 32)
    rec = jnp.stack([
        wb[j].reshape(2, 128, 32).astype(jnp.float32) * bs[j][:, None, :]
        for j in range(3)]).reshape(3, 256, 32)
    err_blk = float(jnp.sqrt(jnp.mean((rec - w) ** 2)))
    assert err_blk < 0.75 * err_pc, (err_blk, err_pc)

    # _block_matmul computes exactly x @ dequantized(w)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 256))
    got = _block_matmul(x, wb[0], bs[0], jnp.float32)
    want = x @ rec[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_int8_block_decode_closer_to_f32_than_int8():
    """The int8_block decode path runs end-to-end and its logits track f32
    at least as closely as per-channel int8 on the same model."""
    cfg = WaveNetConfig(out_channels=24, layers=6, stacks=2,
                        residual_channels=16, gate_channels=16,
                        skip_out_channels=16, kernel_size=3, dropout=0.0,
                        cin_channels=4, upsample_conditional_features=True,
                        upsample_scales=(4,))
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    B, T = 1, 48
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T // 4, 4))
    outs_f32, _ = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(2), T, c=c, sample=False)

    def cos(outs):
        a = np.asarray(outs_f32).ravel()
        b = np.asarray(outs).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    outs_i8, _ = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(2), T, c=c, sample=False,
        weight_quant="int8")
    outs_blk, _ = wavenet_incremental_generate(
        params, cfg, jax.random.PRNGKey(2), T, c=c, sample=False,
        weight_quant="int8_block")
    # at C=16 the block degenerates to per-(tap, out) scales — still finer
    # than per-out-over-all-taps, so tracking must not regress
    assert cos(outs_blk) >= cos(outs_i8) - 1e-6, (cos(outs_blk), cos(outs_i8))
    assert cos(outs_blk) > 0.99
