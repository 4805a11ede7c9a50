"""ClariNet IAF student: stack of Gaussian WaveNet flows, parallel synthesis.

Capability-parity with reference src/clarinet/wavenet_iaf.py:30-126: flows
with block counts [1, 1, 1, 4]; ``iaf()`` composes means/scales across flows:

    mu_tot = mu_tot * exp(logs) + mu ;  logs_tot += logs
    z      = z[1:] * exp(logs) + mu, left-padded with 0

Generation is single-pass (no autoregression) — already the TPU-friendly
shape; everything is plain batched convs on the MXU.
"""
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp

from vqvae_speech_tpu.models.clarinet.wavenet import (
    GaussianWaveNetConfig, gaussian_wavenet_init, gaussian_wavenet_core)


@dataclass(frozen=True)
class StudentConfig:
    num_blocks_student: Sequence[int] = (1, 1, 1, 4)
    num_layers: int = 6
    front_channels: int = 32
    residual_channels: int = 128
    gate_channels: int = 256
    skip_channels: int = 128
    kernel_size: int = 3
    cin_channels: int = 80
    causal: bool = True

    def flow_config(self, i) -> GaussianWaveNetConfig:
        return GaussianWaveNetConfig(
            out_channels=2,
            num_blocks=self.num_blocks_student[i],
            num_layers=self.num_layers,
            front_channels=self.front_channels,
            residual_channels=self.residual_channels,
            gate_channels=self.gate_channels,
            skip_channels=self.skip_channels,
            kernel_size=self.kernel_size,
            cin_channels=self.cin_channels,
            causal=self.causal)

    @property
    def num_flow(self):
        return len(self.num_blocks_student)


def wavenet_student_init(key, cfg: StudentConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.num_flow)
    return {"iafs": [gaussian_wavenet_init(ks[i], cfg.flow_config(i), dtype)
                     for i in range(cfg.num_flow)]}


def wavenet_student_apply(params, cfg: StudentConfig, z, c_up,
                          use_fused=False, interpret=False):
    """z: (B, T, 1) noise; c_up: (B, T, cin) pre-upsampled conditioning.

    Returns (x (B, T, 1), mu_tot (B, T-1, 1), logs_tot (B, T-1, 1)) matching
    the reference's iaf() (wavenet_iaf.py:52-62).  ``use_fused`` runs every
    flow's resblock chains through the tiled Pallas kernel (batch-1 only;
    see gaussian_wavenet_core_fused).
    """
    from vqvae_speech_tpu.models.clarinet.wavenet import (
        gaussian_wavenet_core_fused)

    mu_tot = jnp.zeros_like(z[:, :-1, :])
    logs_tot = jnp.zeros_like(z[:, :-1, :])
    for i, p in enumerate(params["iafs"]):
        if use_fused:
            mu_logs = gaussian_wavenet_core_fused(
                p, cfg.flow_config(i), z, c_up, interpret=interpret)
        else:
            mu_logs = gaussian_wavenet_core(p, cfg.flow_config(i), z, c_up)
        mu = mu_logs[:, :-1, 0:1]
        logs = mu_logs[:, :-1, 1:2]
        mu_tot = mu_tot * jnp.exp(logs) + mu
        logs_tot = logs_tot + logs
        z = z[:, 1:, :] * jnp.exp(logs) + mu
        z = jnp.pad(z, ((0, 0), (1, 0), (0, 0)))
    return z, mu_tot, logs_tot


def wavenet_student_generate(params, cfg: StudentConfig, z, c_up,
                             compute_dtype=None, use_fused=False,
                             interpret=False):
    """One-pass synthesis.  ``compute_dtype=jnp.bfloat16`` runs the flow
    convs on the MXU bf16 path (params/activations cast in, waveform cast
    back to f32) — the synthesis-serving configuration.  ``use_fused``
    selects the batch-1 tiled-Pallas resblock chains (single-stream
    latency path; measured 1.216x over the XLA chain at student scale)."""
    if compute_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(compute_dtype), params)
        z = z.astype(compute_dtype)
        c_up = c_up.astype(compute_dtype)
    x, _, _ = wavenet_student_apply(params, cfg, z, c_up,
                                    use_fused=use_fused, interpret=interpret)
    return x.astype(jnp.float32)
