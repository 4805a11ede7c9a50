"""WaveNet batch-forward parity vs a compact torch build of the r9y9
architecture (weight-norm convs, GLU with conditioning projections, legacy
skip scaling, ConvTranspose2d LC upsampling, speaker embedding)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from vqvae_speech_tpu.models.wavenet import (
    WaveNetConfig, wavenet_init, wavenet_apply)
from vqvae_speech_tpu.nn.conv import conv_weight

CFG = WaveNetConfig(
    out_channels=16, layers=4, stacks=2, residual_channels=8,
    gate_channels=12, skip_out_channels=10, kernel_size=3, dropout=0.0,
    cin_channels=6, gin_channels=4, n_speakers=3,
    upsample_conditional_features=True, upsample_scales=(2, 4),
    freq_axis_kernel_size=3, legacy=True)


class TorchWaveNet(tnn.Module):
    """Minimal torch twin driven by OUR parameters (copied in)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.first = tnn.Conv1d(cfg.out_channels, cfg.residual_channels, 1)
        self.convs = tnn.ModuleList()
        self.cs = tnn.ModuleList()
        self.gs = tnn.ModuleList()
        self.skips = tnn.ModuleList()
        self.outs = tnn.ModuleList()
        gh = cfg.gate_channels // 2
        for layer in range(cfg.layers):
            d = cfg.dilation(layer)
            self.convs.append(tnn.Conv1d(
                cfg.residual_channels, cfg.gate_channels, cfg.kernel_size,
                dilation=d, padding=(cfg.kernel_size - 1) * d))
            self.cs.append(tnn.Conv1d(cfg.cin_channels, cfg.gate_channels, 1))
            self.gs.append(tnn.Conv1d(cfg.gin_channels, cfg.gate_channels, 1))
            self.skips.append(tnn.Conv1d(gh, cfg.skip_out_channels, 1))
            self.outs.append(tnn.Conv1d(gh, cfg.residual_channels, 1))
        self.last1 = tnn.Conv1d(cfg.skip_out_channels,
                                cfg.skip_out_channels, 1)
        self.last2 = tnn.Conv1d(cfg.skip_out_channels, cfg.out_channels, 1)
        self.embed = tnn.Embedding(cfg.n_speakers, cfg.gin_channels)
        self.ups = tnn.ModuleList([
            tnn.ConvTranspose2d(1, 1, (3, s), stride=(1, s), padding=(1, 0))
            for s in cfg.upsample_scales])

    def forward(self, x, c, g_ids):
        # x (B, C, T); c (B, cin, Tc); g_ids (B,)
        B, _, T = x.shape
        g = self.embed(g_ids).unsqueeze(-1).expand(B, -1, T)
        cu = c.unsqueeze(1)
        for up in self.ups:
            cu = F.relu(up(cu))
        cu = cu.squeeze(1)
        h = self.first(x)
        skips = None
        for layer in range(self.cfg.layers):
            res = h
            z = self.convs[layer](h)[:, :, :T]
            a, b = z.split(z.size(1) // 2, dim=1)
            cz = self.cs[layer](cu)
            ca, cb = cz.split(cz.size(1) // 2, dim=1)
            gz = self.gs[layer](g)
            ga, gb = gz.split(gz.size(1) // 2, dim=1)
            hh = torch.tanh(a + ca + ga) * torch.sigmoid(b + cb + gb)
            s = self.skips[layer](hh)
            h = (self.outs[layer](hh) + res) * math.sqrt(0.5)
            if skips is None:
                skips = s
            else:
                skips = (skips + s) * math.sqrt(0.5)
        out = F.relu(skips)
        out = F.relu(self.last1(out))
        return self.last2(out)


def _copy(tm: TorchWaveNet, params):
    def set_conv(tc, p):
        w = np.asarray(conv_weight(p))  # (K, in, out)
        tc.weight.data = torch.from_numpy(w.transpose(2, 1, 0).copy())
        tc.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())

    set_conv(tm.first, params["first_conv"])
    for layer, p in enumerate(params["conv_layers"]):
        set_conv(tm.convs[layer], p["conv"])
        set_conv(tm.cs[layer], p["conv1x1c"])
        set_conv(tm.gs[layer], p["conv1x1g"])
        set_conv(tm.skips[layer], p["conv1x1_skip"])
        set_conv(tm.outs[layer], p["conv1x1_out"])
    set_conv(tm.last1, params["last_conv_1"])
    set_conv(tm.last2, params["last_conv_2"])
    tm.embed.weight.data = torch.from_numpy(
        np.asarray(params["embed_speakers"]["table"]).copy())
    for i, p in enumerate(params["upsample_conv"]):
        v = np.asarray(p["v"])
        g = float(np.asarray(p["g"])[0])
        w = g * v / np.linalg.norm(v)
        tm.ups[i].weight.data = torch.from_numpy(
            w[..., 0, 0].copy()).unsqueeze(0).unsqueeze(0)
        tm.ups[i].bias.data = torch.from_numpy(np.asarray(p["b"]).copy())


def test_wavenet_forward_matches_torch_twin():
    params = wavenet_init(jax.random.PRNGKey(0), CFG)
    tm = TorchWaveNet(CFG).eval()
    _copy(tm, params)

    B, T = 2, 48
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, CFG.out_channels)).astype(np.float32)
    c = rng.standard_normal((B, T // 8, CFG.cin_channels)).astype(np.float32)
    g = np.array([0, 2])

    got = np.asarray(wavenet_apply(params, CFG, jnp.asarray(x),
                                   c=jnp.asarray(c), g=jnp.asarray(g)))
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 2, 1)),
                  torch.from_numpy(c.transpose(0, 2, 1)),
                  torch.from_numpy(g)).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
