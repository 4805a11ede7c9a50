"""NN-core parity tests against PyTorch (CPU) golden values.

Each test builds the torch layer fresh, copies weights into our (K, Cin, Cout)
layout, and compares outputs.  This validates layout/padding/flip conventions
without any reference code.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from vqvae_speech_tpu.nn import (
    conv1d,
    conv_transpose1d,
    residual_stack_init,
    residual_stack_apply,
    jitter,
    upsample_nearest,
)


def _to_jax_conv_params(tconv):
    # torch Conv1d weight: (Cout, Cin, K) -> ours (K, Cin, Cout)
    w = tconv.weight.detach().numpy().transpose(2, 1, 0)
    p = {"w": jnp.asarray(w)}
    if tconv.bias is not None:
        p["b"] = jnp.asarray(tconv.bias.detach().numpy())
    return p


def _to_jax_convT_params(tconv):
    # torch ConvTranspose1d weight: (Cin, Cout, K) -> ours (K, Cout, Cin)
    w = tconv.weight.detach().numpy().transpose(2, 1, 0)
    p = {"w": jnp.asarray(w)}
    if tconv.bias is not None:
        p["b"] = jnp.asarray(tconv.bias.detach().numpy())
    return p


def test_conv1d_matches_torch():
    torch.manual_seed(0)
    for k, s, pad, dil in [(3, 1, 1, 1), (4, 2, 2, 1), (1, 1, 0, 1), (2, 1, 1, 2)]:
        tconv = tnn.Conv1d(5, 7, k, stride=s, padding=pad, dilation=dil)
        x = torch.randn(2, 5, 20)
        want = tconv(x).detach().numpy()  # (B, Cout, T')
        p = _to_jax_conv_params(tconv)
        got = conv1d(p, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                     stride=s, padding=pad, dilation=dil)
        got = np.asarray(got).transpose(0, 2, 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv_transpose1d_matches_torch():
    torch.manual_seed(1)
    for k, s, pad in [(3, 1, 1), (3, 1, 0), (2, 1, 0), (4, 2, 1)]:
        tconv = tnn.ConvTranspose1d(6, 4, k, stride=s, padding=pad)
        x = torch.randn(2, 6, 15)
        want = tconv(x).detach().numpy()
        p = _to_jax_convT_params(tconv)
        got = conv_transpose1d(p, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                               stride=s, padding=pad)
        got = np.asarray(got).transpose(0, 2, 1)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_weight_norm_materialization_matches_torch():
    torch.manual_seed(2)
    tconv = tnn.Conv1d(5, 7, 3, bias=False)
    wn = tnn.utils.weight_norm(tconv)
    v = wn.weight_v.detach().numpy().transpose(2, 1, 0)
    g = wn.weight_g.detach().numpy().reshape(-1)
    x = torch.randn(1, 5, 12)
    want = wn(x).detach().numpy()
    p = {"v": jnp.asarray(v), "g": jnp.asarray(g)}
    got = np.asarray(conv1d(p, jnp.asarray(x.numpy().transpose(0, 2, 1)))).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_residual_stack_applies_shared_block_n_times():
    # The reference's stack is n applications of ONE tied block followed by a
    # final ReLU (src/modules/residual_stack.py:40-46).
    key = jax.random.PRNGKey(0)
    params = residual_stack_init(key, 8, 8, 3, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 8))
    got = residual_stack_apply(params, x, 3)

    # manual: apply the single block 3 times then relu
    from vqvae_speech_tpu.nn.layers import residual_apply

    h = x
    for _ in range(3):
        h = residual_apply(params["block"], h)
    want = jax.nn.relu(h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_upsample_nearest_matches_torch():
    torch.manual_seed(3)
    x = torch.randn(2, 5, 9)
    want = tnn.Upsample(scale_factor=2)(x).detach().numpy()
    got = np.asarray(upsample_nearest(jnp.asarray(x.numpy().transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want)


def test_jitter_statistics_and_structure():
    key = jax.random.PRNGKey(42)
    B, T, C = 4, 400, 8
    x = jnp.arange(B * T * C, dtype=jnp.float32).reshape(B, T, C)
    # inverted=True (reference quirk): replace w.p. 1-p = 0.88
    out = jitter(key, x, probability=0.12, inverted=True)
    # every output frame must equal an input frame at distance <= 1
    xn, on = np.asarray(x), np.asarray(out)
    for t in range(T):
        cand = [t] + ([t - 1] if t > 0 else []) + ([t + 1] if t < T - 1 else [])
        assert any(np.array_equal(on[:, t], xn[:, c]) for c in cand)
    frac_replaced = np.mean([not np.array_equal(on[:, t], xn[:, t]) for t in range(T)])
    assert 0.75 < frac_replaced <= 1.0  # ~0.88 expected

    out2 = jitter(key, x, probability=0.12, inverted=False)
    on2 = np.asarray(out2)
    frac2 = np.mean([not np.array_equal(on2[:, t], xn[:, t]) for t in range(T)])
    assert 0.03 < frac2 < 0.25  # ~0.12 expected


def test_jitter_shared_across_batch():
    # one draw per timestep shared across batch (reference jitter.py:50-68)
    key = jax.random.PRNGKey(7)
    T = 50
    x = jnp.tile(jnp.arange(T, dtype=jnp.float32)[None, :, None], (3, 1, 2))
    out = np.asarray(jitter(key, x, 0.12))
    # all batch rows must have identical jitter pattern
    assert np.array_equal(out[0], out[1]) and np.array_equal(out[1], out[2])


def test_jitter_detaches_replaced_frames():
    """Reference jitter copies from quantized.detach().clone()
    (jitter.py:47,67): replaced frames carry NO gradient; kept frames pass
    identity gradient.  The live-gather variant (gradient rerouted through
    neighbors) measurably changes flagship training dynamics (RESULTS.md
    round-3 head-to-head), so the detach semantics are load-bearing."""
    key = jax.random.PRNGKey(11)
    B, T, C = 2, 200, 4
    x = jnp.ones((B, T, C), jnp.float32)

    grad = jax.grad(lambda v: jnp.sum(jitter(key, v, 0.12)))(x)
    g = np.asarray(grad)
    # each frame's gradient is either exactly 1 (kept, identity) or
    # exactly 0 (replaced, detached) -- never redistributed to neighbors
    per_frame = g[0, :, 0]
    assert set(np.unique(per_frame)).issubset({0.0, 1.0})
    kept_frac = float(per_frame.mean())
    assert 0.03 < kept_frac < 0.25  # keep rate ~p=0.12 under the inversion

    # the kept set must be exactly the un-replaced frames of the value path
    out = np.asarray(jitter(key, x * jnp.arange(T, dtype=jnp.float32)[None, :, None], 0.12))
    ramp = np.arange(T, dtype=np.float32)
    kept_mask = out[0, :, 0] == ramp
    np.testing.assert_array_equal(per_frame == 1.0, kept_mask)


def test_jitter_flow_gradient_extension_same_values():
    """detach_replacements=False (flow-gradient extension) produces
    IDENTICAL values to the reference-semantics default — only gradients
    differ (they flow through the gather into source neighbors)."""
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 64, 3))
    a = jitter(key, x, 0.12)
    b = jitter(key, x, 0.12, detach_replacements=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # extension gradients redistribute (sum of per-frame grads over the
    # whole tensor equals T*C per batch row: every output frame backprops
    # somewhere), unlike the detached default where replaced frames vanish
    gflow = jax.grad(lambda v: jnp.sum(jitter(key, v, 0.12,
                                              detach_replacements=False)))(x)
    gdet = jax.grad(lambda v: jnp.sum(jitter(key, v, 0.12)))(x)
    assert float(jnp.sum(gflow)) == x.shape[1] * x.shape[2] * x.shape[0]
    assert float(jnp.sum(gdet)) < float(jnp.sum(gflow))
