"""End-to-end ConvolutionalVQVAE forward parity against an inline torch build.

Constructs the same architecture in PyTorch (from the survey of
reference src/models/convolutional_{encoder,vq_vae}.py and
deconvolutional_decoder.py), copies weights into our param pytree, and
compares the full forward (eval mode, no jitter) including codebook indices
and the output trim.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from vqvae_speech_tpu.models import conv_vqvae_init, conv_vqvae_apply

CFG = dict(
    input_features_filters=13,
    augment_input_features=True,
    output_features_filters=13,
    augment_output_features=True,
    num_hiddens=32,
    num_residual_layers=2,
    residual_channels=32,
    embedding_dim=16,
    num_embeddings=11,
    commitment_cost=0.25,
    decay=0.0,
    use_kaiming_normal=False,
    use_jitter=False,
    jitter_probability=0.12,
    use_speaker_conditioning=False,
)


class TorchResBlock(tnn.Module):
    def __init__(self, ch, rch):
        super().__init__()
        self.c1 = tnn.Conv1d(ch, rch, 3, padding=1, bias=False)
        self.c2 = tnn.Conv1d(rch, ch, 1, bias=False)

    def forward(self, x):
        return x + self.c2(F.relu(self.c1(F.relu(x))))


class TorchModel(tnn.Module):
    """Same topology as the reference composite, small dims."""

    def __init__(self, cfg):
        super().__init__()
        h = cfg["num_hiddens"]
        fin = cfg["input_features_filters"] * 3
        fout = cfg["output_features_filters"] * 3
        d = cfg["embedding_dim"]
        self.e1 = tnn.Conv1d(fin, h, 3, padding=1)
        self.e2 = tnn.Conv1d(h, h, 3, padding=1)
        self.e3 = tnn.Conv1d(h, h, 4, stride=2, padding=2)
        self.e4 = tnn.Conv1d(h, h, 3, padding=1)
        self.e5 = tnn.Conv1d(h, h, 3, padding=1)
        self.eres = TorchResBlock(h, h)  # tied: applied n_res times
        self.pre = tnn.Conv1d(h, d, 3, padding=1)
        self.codebook = tnn.Parameter(torch.empty(cfg["num_embeddings"], d)
                                      .uniform_(-1 / cfg["num_embeddings"],
                                                1 / cfg["num_embeddings"]))
        self.d1 = tnn.Conv1d(d, h, 3, padding=1)
        self.dres = TorchResBlock(h, cfg["residual_channels"])
        self.t1 = tnn.ConvTranspose1d(h, h, 3, padding=1)
        self.t2 = tnn.ConvTranspose1d(h, h, 3, padding=0)
        self.t3 = tnn.ConvTranspose1d(h, fout, 2, padding=0)
        self.n_res = cfg["num_residual_layers"]
        self.cc = cfg["commitment_cost"]

    def res_stack(self, block, x):
        for _ in range(self.n_res):
            x = block(x)
        return F.relu(x)

    def forward(self, x_btc):
        x = x_btc.permute(0, 2, 1).contiguous().float()
        x1 = F.relu(self.e1(x))
        h = F.relu(self.e2(x1)) + x1
        x3 = F.relu(self.e3(h))
        x4 = F.relu(self.e4(x3)) + x3
        x5 = F.relu(self.e5(x4)) + x4
        z = self.res_stack(self.eres, x5) + x5
        z = self.pre(z)
        # VQ with the reference's (C,T,B) flatten
        inputs = z.permute(1, 2, 0).contiguous()
        shape = inputs.shape
        flat = inputs.view(-1, self.codebook.shape[1])
        dmat = (flat.pow(2).sum(1, keepdim=True) + self.codebook.pow(2).sum(1)
                - 2 * flat @ self.codebook.t())
        idx = torch.argmin(dmat, dim=1)
        onehot = torch.zeros(flat.shape[0], self.codebook.shape[0])
        onehot.scatter_(1, idx.unsqueeze(1), 1)
        q = (onehot @ self.codebook).view(shape)
        e_lat = torch.mean((q.detach() - inputs) ** 2)
        q_lat = torch.mean((q - inputs.detach()) ** 2)
        vq_loss = q_lat + self.cc * e_lat
        q = inputs + (q - inputs).detach()
        q = q.permute(2, 0, 1).contiguous()
        # decoder
        y = self.d1(q)
        y = F.interpolate(y, scale_factor=2)  # nearest
        y = self.res_stack(self.dres, y)
        y = F.relu(self.t1(y))
        y = F.relu(self.t2(y))
        y = self.t3(y)
        Tin, Tout = x.shape[2], y.shape[2]
        y = y[:, :, : -(Tout - Tin)]
        return y, vq_loss, idx


def _cp_conv(tc):
    p = {"w": jnp.asarray(tc.weight.detach().numpy().transpose(2, 1, 0))}
    if tc.bias is not None:
        p["b"] = jnp.asarray(tc.bias.detach().numpy())
    return p


def _cp_convT(tc):
    p = {"w": jnp.asarray(tc.weight.detach().numpy().transpose(2, 1, 0))}
    if tc.bias is not None:
        p["b"] = jnp.asarray(tc.bias.detach().numpy())
    return p


@pytest.mark.slow
def test_full_model_forward_matches_torch():
    torch.manual_seed(0)
    tm = TorchModel(CFG).eval()

    params, state = conv_vqvae_init(jax.random.PRNGKey(0), CFG)
    params["encoder"]["conv_1"] = _cp_conv(tm.e1)
    params["encoder"]["conv_2"] = _cp_conv(tm.e2)
    params["encoder"]["conv_3"] = _cp_conv(tm.e3)
    params["encoder"]["conv_4"] = _cp_conv(tm.e4)
    params["encoder"]["conv_5"] = _cp_conv(tm.e5)
    params["encoder"]["residual_stack"]["block"]["conv1"] = _cp_conv(tm.eres.c1)
    params["encoder"]["residual_stack"]["block"]["conv2"] = _cp_conv(tm.eres.c2)
    params["pre_vq_conv"] = _cp_conv(tm.pre)
    params["vq"]["codebook"] = jnp.asarray(tm.codebook.detach().numpy())
    params["decoder"]["conv_1"] = _cp_conv(tm.d1)
    params["decoder"]["residual_stack"]["block"]["conv1"] = _cp_conv(tm.dres.c1)
    params["decoder"]["residual_stack"]["block"]["conv2"] = _cp_conv(tm.dres.c2)
    params["decoder"]["conv_trans_1"] = _cp_convT(tm.t1)
    params["decoder"]["conv_trans_2"] = _cp_convT(tm.t2)
    params["decoder"]["conv_trans_3"] = _cp_convT(tm.t3)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 47, 39)).astype(np.float32)

    with torch.no_grad():
        t_y, t_loss, t_idx = tm(torch.from_numpy(x))

    out = conv_vqvae_apply(params, state, jnp.asarray(x), CFG, training=False,
                           use_pallas=False)

    np.testing.assert_array_equal(np.asarray(out.encoding_indices[:, 0]),
                                  t_idx.numpy())
    np.testing.assert_allclose(float(out.vq_loss), float(t_loss),
                               rtol=1e-4, atol=1e-6)
    got = np.asarray(out.reconstructed_x).transpose(0, 2, 1)
    assert got.shape == t_y.numpy().shape == (2, 39, 47)
    np.testing.assert_allclose(got, t_y.numpy(), rtol=2e-3, atol=2e-4)


def test_latent_time_resolution():
    # encoder halves time: T=47 -> 24 latent frames (k4 s2 p2 conv)
    params, state = conv_vqvae_init(jax.random.PRNGKey(1), CFG)
    x = jnp.zeros((1, 47, 39))
    out = conv_vqvae_apply(params, state, x, CFG, training=False,
                           use_pallas=False)
    assert out.quantized.shape == (1, 24, CFG["embedding_dim"])
    assert out.encoding_indices.shape == (24, 1)
    assert out.reconstructed_x.shape == (1, 47, 39)


def test_long_length_config_shapes():
    """The lengths-sweep config (30720 samples -> 191 frames,
    configurations/experiments_vq44-mfcc39-lengths.json) flows through the
    model: 191 -> 96 latents -> 195 decoder frames -> trim 191."""
    cfg = dict(CFG)
    params, state = conv_vqvae_init(jax.random.PRNGKey(2), cfg)
    x = jnp.zeros((1, 191, 39))
    out = conv_vqvae_apply(params, state, x, cfg, training=False,
                           use_pallas=False)
    assert out.quantized.shape == (1, 96, cfg["embedding_dim"])
    assert out.reconstructed_x.shape == (1, 191, 39)


def test_speaker_conditioning_path():
    """use_speaker_conditioning concatenates a 40-dim speaker embedding
    before the decoder's first conv (reference
    deconvolutional_decoder.py:56,108-111)."""
    cfg = dict(CFG)
    cfg.update(use_speaker_conditioning=True, num_speakers=5)
    params, state = conv_vqvae_init(jax.random.PRNGKey(3), cfg)
    assert "speaker_embedding" in params["decoder"]
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 47, 39))
    out = conv_vqvae_apply(params, state, x, cfg, training=False,
                           speaker_ids=jnp.array([0, 3]), use_pallas=False)
    assert out.reconstructed_x.shape == (2, 47, 39)
    # different speakers give different reconstructions of the same input
    same = jnp.stack([x[0], x[0]])
    out2 = conv_vqvae_apply(params, state, same, cfg, training=False,
                            speaker_ids=jnp.array([0, 3]), use_pallas=False)
    assert not np.allclose(np.asarray(out2.reconstructed_x[0]),
                           np.asarray(out2.reconstructed_x[1]))
