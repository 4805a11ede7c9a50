"""ClariNet Gaussian WaveNet forward parity vs a compact torch twin
(causal front conv k=front_channels, GLU ResBlocks with k^n dilation,
ReLU/1x1 head, ConvTranspose2d (3, 2s) LC upsampling + LeakyReLU(0.4))."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from vqvae_speech_tpu.models.clarinet import (
    GaussianWaveNetConfig, gaussian_wavenet_init, gaussian_wavenet_apply)
from vqvae_speech_tpu.nn.conv import conv_weight

CFG = GaussianWaveNetConfig(
    num_blocks=2, num_layers=2, front_channels=6, residual_channels=8,
    gate_channels=10, skip_channels=12, kernel_size=3, cin_channels=5,
    upsample_scales=(2, 4))


class TorchTeacher(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.front = tnn.Conv1d(1, cfg.residual_channels, cfg.front_channels,
                                padding=cfg.front_channels - 1)
        self.f, self.g, self.r, self.s, self.fc, self.gc = (
            tnn.ModuleList() for _ in range(6))
        for i in range(cfg.total_layers):
            d = cfg.dilation(i)
            pad = d * (cfg.kernel_size - 1)
            self.f.append(tnn.Conv1d(cfg.residual_channels, cfg.gate_channels,
                                     cfg.kernel_size, dilation=d, padding=pad))
            self.g.append(tnn.Conv1d(cfg.residual_channels, cfg.gate_channels,
                                     cfg.kernel_size, dilation=d, padding=pad))
            self.r.append(tnn.Conv1d(cfg.gate_channels,
                                     cfg.residual_channels, 1))
            self.s.append(tnn.Conv1d(cfg.gate_channels, cfg.skip_channels, 1))
            self.fc.append(tnn.Conv1d(cfg.cin_channels, cfg.gate_channels, 1))
            self.gc.append(tnn.Conv1d(cfg.cin_channels, cfg.gate_channels, 1))
        self.final1 = tnn.Conv1d(cfg.skip_channels, cfg.skip_channels, 1)
        self.final2 = tnn.Conv1d(cfg.skip_channels, cfg.out_channels, 1)
        self.ups = tnn.ModuleList([
            tnn.ConvTranspose2d(1, 1, (3, 2 * sc), stride=(1, sc),
                                padding=(1, sc // 2))
            for sc in cfg.upsample_scales])

    def forward(self, x, c):
        T = x.size(-1)
        cu = c.unsqueeze(1)
        for up in self.ups:
            cu = F.leaky_relu(up(cu), 0.4)
        cu = cu.squeeze(1)
        h = F.relu(self.front(x)[:, :, :T])
        skip = 0
        for i in range(self.cfg.total_layers):
            hf = self.f[i](h)[:, :, :T] + self.fc[i](cu)
            hg = self.g[i](h)[:, :, :T] + self.gc[i](cu)
            out = torch.tanh(hf) * torch.sigmoid(hg)
            skip = skip + self.s[i](out)
            h = (h + self.r[i](out)) * math.sqrt(0.5)
        out = F.relu(skip)
        out = F.relu(self.final1(out))
        return self.final2(out)


def _set(tc, p):
    w = np.asarray(conv_weight(p))
    tc.weight.data = torch.from_numpy(w.transpose(2, 1, 0).copy())
    tc.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())


def test_teacher_forward_matches_torch_twin():
    params = gaussian_wavenet_init(jax.random.PRNGKey(0), CFG)
    tm = TorchTeacher(CFG).eval()
    _set(tm.front, params["front_conv"])
    for i, p in enumerate(params["res_blocks"]):
        _set(tm.f[i], p["filter_conv"])
        _set(tm.g[i], p["gate_conv"])
        _set(tm.r[i], p["res_conv"])
        _set(tm.s[i], p["skip_conv"])
        _set(tm.fc[i], p["filter_conv_c"])
        _set(tm.gc[i], p["gate_conv_c"])
    _set(tm.final1, params["final_conv_1"])
    _set(tm.final2, params["final_conv_2"])
    for i, p in enumerate(params["upsample_conv"]):
        v = np.asarray(p["v"])
        g = float(np.asarray(p["g"])[0])
        w = g * v / np.linalg.norm(v)
        tm.ups[i].weight.data = torch.from_numpy(
            w[..., 0, 0].copy()).unsqueeze(0).unsqueeze(0)
        tm.ups[i].bias.data = torch.from_numpy(np.asarray(p["b"]).copy())

    B, Tc = 2, 6
    T = Tc * 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, 1)).astype(np.float32)
    c = rng.standard_normal((B, Tc, CFG.cin_channels)).astype(np.float32)
    got = np.asarray(gaussian_wavenet_apply(params, CFG, jnp.asarray(x),
                                            jnp.asarray(c)))
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 2, 1)),
                  torch.from_numpy(c.transpose(0, 2, 1)))
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)
