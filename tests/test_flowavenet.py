"""FloWaveNet tests: forward/reverse invertibility, logdet correctness,
actnorm data-dependent init, squeeze ordering vs torch."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from vqvae_speech_tpu.models.flowavenet import (
    FlowavenetConfig, flowavenet_init, flowavenet_forward,
    flowavenet_reverse, actnorm_initialize)
from vqvae_speech_tpu.models.flowavenet.model import (
    _squeeze, _unsqueeze, actnorm_forward, actnorm_reverse,
    _data_dependent_actnorm)

SMALL = FlowavenetConfig(in_channel=1, cin_channel=6, n_block=2, n_flow=2,
                         n_layer=2, filter_size=16, block_per_split=8,
                         upsample_scales=(4,))


def test_squeeze_matches_torch_view_permute():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 8)).astype(np.float32)  # (B, C, T)
    tx = torch.from_numpy(x)
    sq = tx.view(2, 4, 4, 2).permute(0, 1, 3, 2).contiguous().view(2, 8, 4)
    got = np.asarray(_squeeze(jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_array_equal(got.transpose(0, 2, 1), sq.numpy())
    # inverse roundtrip
    back = np.asarray(_unsqueeze(jnp.asarray(got)))
    np.testing.assert_array_equal(back, x.transpose(0, 2, 1))


def test_actnorm_forward_reverse_and_logdet():
    p = {"loc": jnp.asarray([0.5, -1.0]), "scale": jnp.asarray([2.0, 0.5])}
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 2))
    y, logdet = actnorm_forward(p, x)
    np.testing.assert_allclose(
        float(logdet), (np.log(2.0) + np.log(0.5)) * 3 * 5, rtol=1e-6)
    back = actnorm_reverse(p, y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5,
                               atol=1e-6)


def test_data_dependent_init_normalizes():
    x = 3.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(1), (4, 100, 2))
    p = _data_dependent_actnorm(x)
    y, _ = actnorm_forward(p, x)
    yn = np.asarray(y).reshape(-1, 2)
    np.testing.assert_allclose(yn.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(yn.std(0), 1.0, atol=1e-2)


def test_forward_reverse_roundtrip():
    """reverse(forward(x)) == x through the full flow stack."""
    params = flowavenet_init(jax.random.PRNGKey(0), SMALL)
    B, Tc = 2, 8
    T = Tc * 4
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, Tc, 6))
    params = actnorm_initialize(params, SMALL, x, c)

    # forward manually to capture the final latent, then invert
    from vqvae_speech_tpu.models.flowavenet.model import (
        _block_channels, _flow_net_cfg, _coupling_forward, _change_order,
        flowavenet_upsample)

    c_up = flowavenet_upsample(params, c, SMALL)
    out, cc = x, c_up
    for i, block in enumerate(params["blocks"]):
        in_ch, cin_ch = _block_channels(SMALL)[i]
        net_cfg = _flow_net_cfg(SMALL, in_ch * 2, cin_ch * 2)
        out, cc = _squeeze(out), _squeeze(cc)
        for flow in block["flows"]:
            out, _ = actnorm_forward(flow["actnorm"], out)
            out, _ = _coupling_forward(flow["coupling"], net_cfg, out, cc,
                                       SMALL.affine)
            out, cc = _change_order(out, cc)

    # un-squeeze the final latent back to (B, T, 1) shape for reverse
    z = out
    for _ in range(SMALL.n_block):
        z = _unsqueeze(z)
    back = flowavenet_reverse(params, SMALL, z, c)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-3,
                               atol=1e-4)


def test_forward_logp_logdet_finite_and_mle_gradable():
    params = flowavenet_init(jax.random.PRNGKey(0), SMALL)
    B, Tc = 2, 8
    T = Tc * 4
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, Tc, 6))
    params = actnorm_initialize(params, SMALL, x, c)

    def nll(params):
        log_p, logdet = flowavenet_forward(params, SMALL, x, c)
        return -(log_p + logdet)

    loss, grads = jax.value_and_grad(nll)(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(g))
               for g in jax.tree_util.tree_leaves(grads))


def test_full_model_logdet_matches_unrolled_actnorm():
    """Pin the scan-based forward's total logdet against an unrolled
    computation that sums actnorm_forward's own logdet (which uses the
    SQUEEZED time length at each depth, reference model.py:64-79) plus
    the coupling logdets — with non-unit actnorm scales so a wrong length
    factor cannot hide."""
    from vqvae_speech_tpu.models.flowavenet.model import (
        _block_channels, _flow_net_cfg, _coupling_forward, _change_order,
        flowavenet_upsample)

    params = flowavenet_init(jax.random.PRNGKey(0), SMALL)
    B, Tc = 2, 8
    T = Tc * 4
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, Tc, 6))
    # force scales far from 1 (the bug-hiding value): data-dependent init
    # can land near 1 for downstream flows, so perturb explicitly
    params = actnorm_initialize(params, SMALL, x, c)
    key = jax.random.PRNGKey(7)
    for block in params["blocks"]:
        for flow in block["flows"]:
            key, sub = jax.random.split(key)
            factor = jnp.exp(jax.random.uniform(
                sub, flow["actnorm"]["scale"].shape, minval=-0.7, maxval=0.7))
            flow["actnorm"]["scale"] = flow["actnorm"]["scale"] * factor
            assert not np.allclose(np.asarray(flow["actnorm"]["scale"]), 1.0,
                                   atol=0.05)

    _, logdet = flowavenet_forward(params, SMALL, x, c)

    c_up = flowavenet_upsample(params, c, SMALL)
    out, cc = x, c_up
    ref_logdet = 0.0
    for i, block in enumerate(params["blocks"]):
        in_ch, cin_ch = _block_channels(SMALL)[i]
        net_cfg = _flow_net_cfg(SMALL, in_ch * 2, cin_ch * 2)
        out, cc = _squeeze(out), _squeeze(cc)
        for flow in block["flows"]:
            out, det_a = actnorm_forward(flow["actnorm"], out)
            out, det_c = _coupling_forward(flow["coupling"], net_cfg, out,
                                           cc, SMALL.affine)
            ref_logdet = ref_logdet + float(det_a) + float(det_c)
            out, cc = _change_order(out, cc)
    ref_logdet /= (B * T)
    np.testing.assert_allclose(float(logdet), ref_logdet, rtol=1e-5)


def test_multiscale_split_path():
    cfg = FlowavenetConfig(in_channel=1, cin_channel=6, n_block=4, n_flow=1,
                           n_layer=1, filter_size=8, block_per_split=2,
                           upsample_scales=(4,))
    params = flowavenet_init(jax.random.PRNGKey(0), cfg)
    B, Tc = 1, 8
    T = Tc * 4
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, Tc, 6))
    params = actnorm_initialize(params, cfg, x, c)
    log_p, logdet = flowavenet_forward(params, cfg, x, c)
    assert np.isfinite(float(log_p)) and np.isfinite(float(logdet))
    # reverse from noise produces the right shape
    z = jax.random.normal(jax.random.PRNGKey(3), (B, T, 1)) * 0.6
    y = flowavenet_reverse(params, cfg, z, c)
    assert y.shape == (B, T, 1)
    assert np.all(np.isfinite(np.asarray(y)))


def test_reverse_bf16_close_to_f32():
    params = flowavenet_init(jax.random.PRNGKey(0), SMALL)
    B, T = 2, 64
    z = jax.random.normal(jax.random.PRNGKey(1), (B, T, 1)) * 0.7
    c = jax.random.normal(jax.random.PRNGKey(2), (B, T // 4, 6))
    x32 = flowavenet_reverse(params, SMALL, z, c)
    xbf = flowavenet_reverse(params, SMALL, z, c,
                             compute_dtype=jnp.bfloat16)
    assert xbf.dtype == jnp.float32
    a, b = np.asarray(x32).ravel(), np.asarray(xbf).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr


def test_forward_bf16_mixed_precision_tracks_f32():
    params = flowavenet_init(jax.random.PRNGKey(0), SMALL)
    B, T = 2, 64
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 1)) * 0.3
    c = jax.random.normal(jax.random.PRNGKey(2), (B, T // 4, 6))
    lp32, ld32 = flowavenet_forward(params, SMALL, x, c)
    lpbf, ldbf = flowavenet_forward(params, SMALL, x, c,
                                    compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(float(lpbf), float(lp32), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(float(ldbf), float(ld32), rtol=0.05, atol=0.05)


def test_reverse_fused_chain_matches_xla():
    """use_fused=True (non-causal halo-window Pallas chains, interpret on
    CPU) must reproduce the XLA reverse at batch 1, through squeeze depths,
    change_order, and the flow scan."""
    params = flowavenet_init(jax.random.PRNGKey(3), SMALL)
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 1))
    c = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 6))
    want = flowavenet_reverse(params, SMALL, z, c)
    got = flowavenet_reverse(params, SMALL, z, c, use_fused=True,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # batch > 1 silently falls back to the XLA chain (same result)
    z2 = jnp.concatenate([z, -z], axis=0)
    c2 = jnp.concatenate([c, c], axis=0)
    want2 = flowavenet_reverse(params, SMALL, z2, c2)
    got2 = flowavenet_reverse(params, SMALL, z2, c2, use_fused=True,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want2))
