"""Vector-quantizer parity tests.

Golden values computed with compact torch transcriptions of the reference
math (distance matmul + argmin + EMA updates, including the non-standard
(C,T,B)-order flatten the reference applies at vector_quantizer.py:88-93).
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from vqvae_speech_tpu.ops.vq import (
    reference_flatten,
    reference_unflatten,
    vq_search_xla,
    vq_search_pallas,
)
from vqvae_speech_tpu.models.vq import vector_quantizer_init, vector_quantizer_apply


def _torch_flatten(z_bct, D):
    return z_bct.permute(1, 2, 0).contiguous().view(-1, D)


def _torch_search(flat, cb):
    d = (flat.pow(2).sum(1, keepdim=True) + cb.pow(2).sum(1)
         - 2 * flat @ cb.t())
    idx = torch.argmin(d, dim=1)
    onehot = torch.zeros(flat.shape[0], cb.shape[0])
    onehot.scatter_(1, idx.unsqueeze(1), 1)
    return d, idx, onehot


def test_reference_flatten_matches_torch_view_semantics():
    rng = np.random.default_rng(0)
    B, C, T = 3, 8, 10  # D = C = 8
    z_bct = rng.standard_normal((B, C, T)).astype(np.float32)
    want = _torch_flatten(torch.from_numpy(z_bct), C).numpy()
    z_btc = jnp.asarray(z_bct.transpose(0, 2, 1))
    got = np.asarray(reference_flatten(z_btc))
    np.testing.assert_array_equal(got, want)
    # roundtrip
    back = np.asarray(reference_unflatten(jnp.asarray(got), B, T, C))
    np.testing.assert_array_equal(back, z_bct.transpose(0, 2, 1))


def test_xla_search_matches_torch():
    rng = np.random.default_rng(1)
    flat = rng.standard_normal((96, 64)).astype(np.float32)
    cb = rng.standard_normal((44, 64)).astype(np.float32)
    tf, tc = torch.from_numpy(flat), torch.from_numpy(cb)
    d, idx, onehot = _torch_search(tf, tc)
    res = vq_search_xla(jnp.asarray(flat), jnp.asarray(cb))
    np.testing.assert_array_equal(np.asarray(res.indices), idx.numpy())
    np.testing.assert_allclose(np.asarray(res.quantized), (onehot @ tc).numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.counts), onehot.sum(0).numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.dw), (onehot.t() @ tf).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_pallas_search_matches_xla_interpret():
    # interpret mode runs the kernel on CPU; validates masking/accumulation,
    # including ragged last tiles (N not a multiple of tile_n).
    from jax.experimental.pallas import tpu as pltpu
    from vqvae_speech_tpu.ops.vq import _vq_search_pallas_fwd

    rng = np.random.default_rng(2)
    for N, K in [(96, 44), (600, 128), (48, 29)]:
        flat = jnp.asarray(rng.standard_normal((N, 64)).astype(np.float32))
        cb = jnp.asarray(rng.standard_normal((K, 64)).astype(np.float32))

        with pltpu.force_tpu_interpret_mode():
            got = _vq_search_pallas_fwd(flat, cb, tile_n=256)
        want = vq_search_xla(flat, cb)
        np.testing.assert_array_equal(np.asarray(got.indices),
                                      np.asarray(want.indices))
        np.testing.assert_allclose(np.asarray(got.quantized),
                                   np.asarray(want.quantized), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.counts),
                                   np.asarray(want.counts), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got.dw),
                                   np.asarray(want.dw), rtol=1e-4, atol=1e-4)


def test_pallas_search_vjp_matches_xla_chain():
    """The custom VJP (onehot-routed cotangents) must equal autograd on the
    XLA op chain — same loss, same gradients for codebook and flat."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(7)
    flat = jnp.asarray(rng.standard_normal((72, 16)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((11, 16)).astype(np.float32))

    def loss_fn(search):
        def f(flat, cb):
            res = search(flat, cb)
            # touch every differentiable output
            return (jnp.sum(jnp.square(res.quantized)) +
                    0.5 * jnp.sum(res.dw * res.dw) +
                    jnp.sum(res.counts))
        return f

    want_val, (want_gf, want_gc) = jax.value_and_grad(
        loss_fn(vq_search_xla), argnums=(0, 1))(flat, cb)
    with pltpu.force_tpu_interpret_mode():
        got_val, (got_gf, got_gc) = jax.value_and_grad(
            loss_fn(vq_search_pallas), argnums=(0, 1))(flat, cb)
    np.testing.assert_allclose(float(got_val), float(want_val), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gf), np.asarray(want_gf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gc), np.asarray(want_gc),
                               rtol=1e-4, atol=1e-5)


def _torch_vq_forward(z_bct, cb, commitment_cost):
    """Gradient-variant forward (reference vector_quantizer.py:88-148)."""
    inputs = z_bct.permute(1, 2, 0).contiguous()
    shape = inputs.shape
    flat = inputs.view(-1, cb.shape[1])
    d, idx, onehot = _torch_search(flat, cb)
    quantized = (onehot @ cb).view(shape)
    e_latent = torch.mean((quantized.detach() - inputs) ** 2)
    q_latent = torch.mean((quantized - inputs.detach()) ** 2)
    loss = q_latent + commitment_cost * e_latent
    quantized = inputs + (quantized - inputs).detach()
    avg = onehot.mean(0)
    perp = torch.exp(-torch.sum(avg * torch.log(avg + 1e-10)))
    return loss, quantized.permute(2, 0, 1), perp, idx


def test_gradient_vq_module_matches_torch():
    rng = np.random.default_rng(3)
    B, T, D, K = 2, 24, 64, 44
    z_btc = rng.standard_normal((B, T, D)).astype(np.float32)
    cb = (rng.uniform(-1 / K, 1 / K, (K, D))).astype(np.float32)

    tz = torch.from_numpy(z_btc.transpose(0, 2, 1))
    tloss, tq, tperp, tidx = _torch_vq_forward(tz, torch.from_numpy(cb), 0.25)

    out = vector_quantizer_apply({"codebook": jnp.asarray(cb)}, {},
                                 jnp.asarray(z_btc), commitment_cost=0.25,
                                 decay=0.0, training=True, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(out.indices[:, 0]), tidx.numpy())
    np.testing.assert_allclose(float(out.vq_loss), float(tloss), rtol=1e-5)
    np.testing.assert_allclose(float(out.perplexity), float(tperp), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.quantized),
                               tq.numpy().transpose(0, 2, 1), rtol=1e-5, atol=1e-6)


def test_ema_vq_module_matches_torch_updates():
    """Run 3 EMA steps and check codebook/cluster trajectories match the
    reference update order (vector_quantizer_ema.py:143-159)."""
    rng = np.random.default_rng(4)
    B, T, D, K = 2, 24, 64, 29
    decay, eps, cc = 0.99, 1e-5, 0.25

    cb = rng.standard_normal((K, D)).astype(np.float32)
    ema_w = rng.standard_normal((K, D)).astype(np.float32)
    cluster = np.zeros(K, np.float32)

    state = {
        "codebook": jnp.asarray(cb),
        "ema_cluster_size": jnp.asarray(cluster),
        "ema_w": jnp.asarray(ema_w),
    }
    tcb = torch.from_numpy(cb.copy())
    tema_w = torch.from_numpy(ema_w.copy())
    tcluster = torch.from_numpy(cluster.copy())

    for step in range(3):
        z_btc = rng.standard_normal((B, T, D)).astype(np.float32)
        tz = torch.from_numpy(z_btc.transpose(0, 2, 1))

        # torch golden step
        inputs = tz.permute(1, 2, 0).contiguous()
        flat = inputs.view(-1, D)
        d, idx, onehot = _torch_search(flat, tcb)
        tcluster = tcluster * decay + (1 - decay) * onehot.sum(0)
        n = tcluster.sum()
        tcluster = (tcluster + eps) / (n + K * eps) * n
        dw = onehot.t() @ flat
        tema_w = tema_w * decay + (1 - decay) * dw
        tcb = tema_w / tcluster.unsqueeze(1)
        tq = (onehot @ tcb).view(inputs.shape)
        tloss = cc * torch.mean((tq.detach() - inputs) ** 2)

        out = vector_quantizer_apply({}, state, jnp.asarray(z_btc),
                                     commitment_cost=cc, decay=decay,
                                     training=True, use_pallas=False)
        state = out.new_state

        np.testing.assert_array_equal(np.asarray(out.indices[:, 0]), idx.numpy())
        np.testing.assert_allclose(np.asarray(state["codebook"]), tcb.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(state["ema_cluster_size"]),
                                   tcluster.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(out.vq_loss), float(tloss), rtol=1e-4)


def test_straight_through_gradient():
    """d(loss)/dz must flow through as identity on the quantized output, and
    the gradient-variant codebook must receive the q-latent gradient."""
    rng = np.random.default_rng(5)
    B, T, D, K = 2, 8, 64, 16
    z = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    cb = jnp.asarray(rng.uniform(-1 / K, 1 / K, (K, D)).astype(np.float32))

    def loss_fn(params, z):
        out = vector_quantizer_apply(params, {}, z, commitment_cost=0.25,
                                     decay=0.0, training=True, use_pallas=False)
        return jnp.sum(out.quantized * 2.0) + out.vq_loss

    gp, gz = jax.grad(loss_fn, argnums=(0, 1))({"codebook": cb}, z)
    # straight-through: d(sum(2*q_st))/dz == 2 everywhere, plus commitment term
    assert np.all(np.abs(np.asarray(gz) - 2.0) < 1.0)
    assert np.any(np.asarray(gp["codebook"]) != 0)


def test_eval_mode_keeps_state_frozen():
    rng = np.random.default_rng(6)
    key = jax.random.PRNGKey(0)
    _, state = vector_quantizer_init(key, 29, 64, ema=True)
    z = jnp.asarray(rng.standard_normal((2, 24, 64)).astype(np.float32))
    out = vector_quantizer_apply({}, state, z, commitment_cost=0.25,
                                 decay=0.99, training=False, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(out.new_state["codebook"]),
                                  np.asarray(state["codebook"]))


def test_reference_index_view_is_scrambled_vs_per_frame_argmin():
    """Pin the quirk the latent diagnostic's attribution rests on: the
    reference views the quantizer's (C,T,B)-flatten-ordered codes back as
    (batch, time) (vector_quantizer.py:88-93 + :151-153), so frame
    (b, t)'s 'code' is the code of a scrambled row — NOT that frame
    vector's nearest code — while the quantized VALUES round-trip exactly
    through the inverse flatten."""
    from vqvae_speech_tpu.models.vq import (
        vector_quantizer_init, vector_quantizer_apply)

    rng = np.random.default_rng(9)
    B, T, C = 4, 10, 8  # D = C
    z = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    params, state = vector_quantizer_init(
        jax.random.PRNGKey(0), num_embeddings=11, embedding_dim=C,
        ema=False)
    out = vector_quantizer_apply(params, state, z, commitment_cost=0.25,
                                 decay=0.0, training=False)
    viewed = np.asarray(out.indices).reshape(B, T)

    cb = np.asarray(params["codebook"])
    zf = np.asarray(z).reshape(B * T, C)
    d = ((zf ** 2).sum(1)[:, None] - 2 * zf @ cb.T + (cb ** 2).sum(1)[None])
    per_frame = np.argmin(d, axis=1).reshape(B, T)

    # scrambled: the (B,T) view disagrees with the true per-frame argmin
    # on a generic input (if it ever agreed everywhere the quirk would be
    # gone and the diagnostic's two baselines would collapse into one)
    assert (viewed != per_frame).any()
    # ...while the quantized tensor is layout-consistent: every element
    # comes from the codebook row its own scrambled flat row selected
    from vqvae_speech_tpu.ops.vq import reference_flatten, reference_unflatten
    flat_idx = np.asarray(out.indices)[:, 0]
    want_q = np.asarray(reference_unflatten(
        jnp.asarray(cb[flat_idx]), B, T, C))
    np.testing.assert_allclose(np.asarray(out.quantized), want_q,
                               rtol=1e-5, atol=1e-6)
