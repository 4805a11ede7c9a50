"""Reference-checkpoint converter round trip: build a torch model whose
state_dict uses the reference's exact module paths, convert it, and verify
identical forwards (including codebook indices)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from vqvae_speech_tpu.models import conv_vqvae_apply
from vqvae_speech_tpu.train.convert_reference import convert_state_dict

CFG = dict(
    input_features_filters=13, augment_input_features=True,
    output_features_filters=13, augment_output_features=True,
    num_hiddens=20, num_residual_layers=2, residual_channels=20,
    embedding_dim=8, num_embeddings=9, commitment_cost=0.25, decay=0.0,
    use_kaiming_normal=False, use_jitter=False, jitter_probability=0.12,
    use_speaker_conditioning=False,
)


def _residual_stack(ch, rch):
    block = tnn.Sequential(
        tnn.ReLU(), tnn.Conv1d(ch, rch, 3, padding=1, bias=False),
        tnn.ReLU(), tnn.Conv1d(rch, ch, 1, bias=False))
    holder = tnn.Module()
    holder._layers = tnn.ModuleList([tnn.Module()])
    holder._layers[0]._block = block
    return holder


class RefNamedModel(tnn.Module):
    """Same module paths as reference convolutional_vq_vae.py:39-99."""

    def __init__(self, cfg):
        super().__init__()
        h, d = cfg["num_hiddens"], cfg["embedding_dim"]
        fin = cfg["input_features_filters"] * 3
        self._encoder = tnn.Module()
        self._encoder._conv_1 = tnn.Conv1d(fin, h, 3, padding=1)
        self._encoder._conv_2 = tnn.Conv1d(h, h, 3, padding=1)
        self._encoder._conv_3 = tnn.Conv1d(h, h, 4, stride=2, padding=2)
        self._encoder._conv_4 = tnn.Conv1d(h, h, 3, padding=1)
        self._encoder._conv_5 = tnn.Conv1d(h, h, 3, padding=1)
        self._encoder._residual_stack = _residual_stack(h, h)
        self._pre_vq_conv = tnn.Conv1d(h, d, 3, padding=1)
        self._vq = tnn.Module()
        self._vq._embedding = tnn.Embedding(cfg["num_embeddings"], d)
        self._decoder = tnn.Module()
        self._decoder._conv_1 = tnn.Conv1d(d, h, 3, padding=1)
        self._decoder._residual_stack = _residual_stack(
            h, cfg["residual_channels"])
        self._decoder._conv_trans_1 = tnn.ConvTranspose1d(h, h, 3, padding=1)
        self._decoder._conv_trans_2 = tnn.ConvTranspose1d(h, h, 3, padding=0)
        self._decoder._conv_trans_3 = tnn.ConvTranspose1d(h, fin, 2,
                                                          padding=0)

    def _stack(self, holder, x, n):
        for _ in range(n):
            x = x + holder._layers[0]._block(x)
        return F.relu(x)

    def forward(self, x_btc, cfg):
        x = x_btc.permute(0, 2, 1).float()
        e = self._encoder
        x1 = F.relu(e._conv_1(x))
        h = F.relu(e._conv_2(x1)) + x1
        x3 = F.relu(e._conv_3(h))
        x4 = F.relu(e._conv_4(x3)) + x3
        x5 = F.relu(e._conv_5(x4)) + x4
        z = self._stack(e._residual_stack, x5, cfg["num_residual_layers"]) + x5
        z = self._pre_vq_conv(z)
        inputs = z.permute(1, 2, 0).contiguous()
        flat = inputs.view(-1, cfg["embedding_dim"])
        emb = self._vq._embedding.weight
        dist = (flat.pow(2).sum(1, keepdim=True) + emb.pow(2).sum(1)
                - 2 * flat @ emb.t())
        idx = torch.argmin(dist, dim=1)
        onehot = F.one_hot(idx, emb.shape[0]).float()
        q = (onehot @ emb).view(inputs.shape).permute(2, 0, 1)
        dde = self._decoder
        y = dde._conv_1(q)
        y = F.interpolate(y, scale_factor=2)
        y = self._stack(dde._residual_stack, y, cfg["num_residual_layers"])
        y = F.relu(dde._conv_trans_1(y))
        y = F.relu(dde._conv_trans_2(y))
        y = dde._conv_trans_3(y)
        y = y[:, :, : x.shape[2]]
        return y, idx


def test_convert_and_forward_parity():
    torch.manual_seed(0)
    tm = RefNamedModel(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # keys follow the reference layout
    assert "_encoder._conv_1.weight" in sd
    assert "_encoder._residual_stack._layers.0._block.1.weight" in sd
    assert "_vq._embedding.weight" in sd

    params, state = convert_state_dict(sd, ema=False)
    x = np.random.default_rng(0).standard_normal((2, 47, 39)).astype(np.float32)
    out = conv_vqvae_apply(params, {"vq": {}}, jnp.asarray(x), CFG,
                           training=False, use_pallas=False)
    with torch.no_grad():
        want_y, want_idx = tm(torch.from_numpy(x), CFG)
    np.testing.assert_array_equal(np.asarray(out.encoding_indices[:, 0]),
                                  want_idx.numpy())
    np.testing.assert_allclose(
        np.asarray(out.reconstructed_x).transpose(0, 2, 1),
        want_y.numpy(), rtol=2e-3, atol=1e-4)


def test_convert_ema_state():
    torch.manual_seed(1)
    tm = RefNamedModel(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd["_vq._ema_cluster_size"] = np.arange(9, dtype=np.float32)
    sd["_vq._ema_w"] = np.random.default_rng(0).standard_normal(
        (9, 8)).astype(np.float32)
    params, state = convert_state_dict(sd, ema=True)
    assert "codebook" not in params["vq"]
    np.testing.assert_array_equal(state["vq"]["ema_cluster_size"],
                                  np.arange(9, dtype=np.float32))
    assert state["vq"]["codebook"].shape == (9, 8)
