"""Hardware smoke: the vocoder trainers LEARN on TPU (loss decreases over
real optimization steps at reference scale), on a synthetic sine+noise
corpus with consistent mel conditioning (data/ljspeech.py mel pipeline).

Writes smoke_vocoder/summary.json: first/last mean losses per trainer.

Usage: python scripts/smoke_vocoder_tpu.py [steps]
"""
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp


def synth_batch(rng, B, T, sr=22050):
    """Harmonic tones + noise, and their REAL mel conditioning."""
    from vqvae_speech_tpu.ops.mel import melspectrogram

    t = np.arange(T + 1) / sr
    waves = []
    for _ in range(B):
        f0 = rng.uniform(80.0, 300.0)
        w = sum(rng.uniform(0.1, 0.5) / (k * k) *
                np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 6.28))
                for k in range(1, 4))
        w = w + 0.01 * rng.standard_normal(T + 1)
        waves.append((w / (np.abs(w).max() + 1e-6) * 0.6).astype(np.float32))
    x = np.stack(waves)[:, : T]
    mel = np.asarray(melspectrogram(jnp.asarray(x)))  # (B, frames, 80)
    return x, mel


def run_teacher(steps, rng):
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init)
    from vqvae_speech_tpu.train.vocoder import (
        make_teacher_train_step, make_vocoder_optimizer, create_vocoder_state)

    cfg = GaussianWaveNetConfig()
    B, T = 8, 6400
    x, mel = synth_batch(rng, B, T)
    Tc = T // 256
    batch = {"x": jnp.asarray(x)[..., None],
             "c": jnp.asarray(mel[:, :Tc])}
    opt = make_vocoder_optimizer(1e-3, 10.0)
    state = create_vocoder_state(
        jax.random.PRNGKey(1),
        gaussian_wavenet_init(jax.random.PRNGKey(0), cfg), opt)
    step = make_teacher_train_step(cfg, opt, compute_dtype=jnp.bfloat16)
    losses = []
    for i in range(steps):
        state, loss = step(state, batch)
        if i % max(1, steps // 20) == 0 or i == steps - 1:
            losses.append(float(loss))
    return losses


def run_flow(steps, rng):
    from vqvae_speech_tpu.models.flowavenet import (
        FlowavenetConfig, flowavenet_init, actnorm_initialize)
    from vqvae_speech_tpu.train.vocoder import (
        make_flow_train_step, make_vocoder_optimizer, create_vocoder_state)

    cfg = FlowavenetConfig()
    B, T = 8, 4096
    x, mel = synth_batch(rng, B, T)
    Tc = T // 256
    batch = {"x": jnp.asarray(x)[..., None],
             "c": jnp.asarray(mel[:, :Tc])}
    params = flowavenet_init(jax.random.PRNGKey(0), cfg)
    params = actnorm_initialize(params, cfg, batch["x"], batch["c"])
    opt = make_vocoder_optimizer(1e-3, 1.0)
    state = create_vocoder_state(jax.random.PRNGKey(1), params, opt)
    step = make_flow_train_step(cfg, opt)
    losses = []
    for i in range(steps):
        state, (loss, aux) = step(state, batch)
        if i % max(1, steps // 20) == 0 or i == steps - 1:
            losses.append(float(loss))
    return losses


def main(steps=200):
    rng = np.random.default_rng(0)
    out = {}
    for name, fn in [("teacher_bf16", run_teacher), ("flow", run_flow)]:
        losses = fn(steps, rng)
        out[name] = {"first": round(losses[0], 4),
                     "last": round(losses[-1], 4),
                     "trace": [round(v, 4) for v in losses],
                     "steps": steps}
        print(json.dumps({name: {k: out[name][k]
                                 for k in ("first", "last")}}), flush=True)
    os.makedirs(os.path.join(REPO_ROOT, "smoke_vocoder"), exist_ok=True)
    with open(os.path.join(REPO_ROOT, "smoke_vocoder", "summary.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
