"""FloWaveNet non-causal coupling WaveNet parity vs a compact torch twin
(non-causal SAME convs, GLU ResBlocks 2^n dilation, zero-init output conv
with exp(scale*3) gain)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from vqvae_speech_tpu.models.flowavenet.model import (
    CouplingNetConfig, coupling_net_init, coupling_net_apply)
from vqvae_speech_tpu.nn.conv import conv_weight

CFG = CouplingNetConfig(in_channels=2, out_channels=4, num_blocks=1,
                        num_layers=3, residual_channels=8, gate_channels=8,
                        skip_channels=8, kernel_size=3, cin_channels=6,
                        causal=False)


class TorchCoupling(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.front = tnn.Conv1d(cfg.in_channels, cfg.residual_channels, 3,
                                padding=1)
        self.f, self.g, self.r, self.s, self.fc, self.gc = (
            tnn.ModuleList() for _ in range(6))
        for i in range(cfg.total_layers):
            d = cfg.dilation(i)
            pad = d * (cfg.kernel_size - 1) // 2
            self.f.append(tnn.Conv1d(cfg.residual_channels,
                                     cfg.gate_channels, cfg.kernel_size,
                                     dilation=d, padding=pad))
            self.g.append(tnn.Conv1d(cfg.residual_channels,
                                     cfg.gate_channels, cfg.kernel_size,
                                     dilation=d, padding=pad))
            self.r.append(tnn.Conv1d(cfg.gate_channels,
                                     cfg.residual_channels, 1))
            self.s.append(tnn.Conv1d(cfg.gate_channels, cfg.skip_channels, 1))
            self.fc.append(tnn.Conv1d(cfg.cin_channels, cfg.gate_channels, 1))
            self.gc.append(tnn.Conv1d(cfg.cin_channels, cfg.gate_channels, 1))
        self.final1 = tnn.Conv1d(cfg.skip_channels, cfg.skip_channels, 1)
        self.zero = tnn.Conv1d(cfg.skip_channels, cfg.out_channels, 1)
        self.zero_scale = tnn.Parameter(torch.zeros(cfg.out_channels, 1))

    def forward(self, x, c):
        h = F.relu(self.front(x))
        skip = 0
        for i in range(self.cfg.total_layers):
            hf = self.f[i](h) + self.fc[i](c)
            hg = self.g[i](h) + self.gc[i](c)
            out = torch.tanh(hf) * torch.sigmoid(hg)
            skip = skip + self.s[i](out)
            h = (h + self.r[i](out)) * math.sqrt(0.5)
        out = F.relu(skip)
        out = F.relu(self.final1(out))
        return self.zero(out) * torch.exp(self.zero_scale * 3.0)


def _set(tc, p):
    w = np.asarray(conv_weight(p))
    tc.weight.data = torch.from_numpy(w.transpose(2, 1, 0).copy())
    tc.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())


def test_coupling_net_matches_torch_twin():
    params = coupling_net_init(jax.random.PRNGKey(0), CFG)
    # perturb the zero conv so the test is not comparing zeros
    zc = params["final_zero_conv"]
    rng = np.random.default_rng(0)
    zc["w"] = jnp.asarray(rng.standard_normal(zc["w"].shape)
                          .astype(np.float32) * 0.1)
    zc["scale"] = jnp.asarray(rng.standard_normal(zc["scale"].shape)
                              .astype(np.float32) * 0.1)

    tm = TorchCoupling(CFG).eval()
    _set(tm.front, params["front_conv"])
    for i, p in enumerate(params["res_blocks"]):
        _set(tm.f[i], p["filter_conv"])
        _set(tm.g[i], p["gate_conv"])
        _set(tm.r[i], p["res_conv"])
        _set(tm.s[i], p["skip_conv"])
        _set(tm.fc[i], p["filter_conv_c"])
        _set(tm.gc[i], p["gate_conv_c"])
    _set(tm.final1, params["final_conv_1"])
    tm.zero.weight.data = torch.from_numpy(
        np.asarray(zc["w"]).transpose(2, 1, 0).copy())
    tm.zero.bias.data = torch.from_numpy(np.asarray(zc["b"]).copy())
    tm.zero_scale.data = torch.from_numpy(
        np.asarray(zc["scale"])[:, None].copy())

    B, T = 2, 32
    x = rng.standard_normal((B, T, CFG.in_channels)).astype(np.float32)
    c = rng.standard_normal((B, T, CFG.cin_channels)).astype(np.float32)
    got = np.asarray(coupling_net_apply(params, CFG, jnp.asarray(x),
                                        jnp.asarray(c)))
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 2, 1)),
                  torch.from_numpy(c.transpose(0, 2, 1)))
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)
