"""WaveNetVQVAE TRAINING step throughput on TPU at the reference config
scale (configurations/vctk_wavenet.yaml: length 7680, quantize 256,
47-frame 39-dim MFCC conditioning, 20-layer 768-channel WaveNet decoder
with 768x LC upsampling; reference batch_size is 1).

The reference cannot train this model at all (its PipelineFactory raises
for non-deconvolutional decoders, src/experiments/pipeline_factory.py:52),
so these are forward-looking absolute numbers.

Methodology per RESULTS.md: steps chained on-device, host-fetch bounded.

Usage: python scripts/bench_wavenet_vqvae_train_tpu.py [B] [length]
"""
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp
import optax

import yaml


def main(B=1, length=7680, dtype=None):
    from vqvae_speech_tpu.models.wavenet_vqvae import wavenet_vqvae_init
    from vqvae_speech_tpu.train.wavenet_trainer import (
        WaveNetTrainState, make_wavenet_train_step)

    with open(os.path.join(REPO_ROOT, "configurations",
                           "vctk_wavenet.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["length"] = length
    frames = cfg["input_features_dim"] if length == 7680 else length // 160

    key = jax.random.PRNGKey(0)
    params, model_state, wavenet_cfg = wavenet_vqvae_init(key, cfg, 4)
    optimizer = optax.amsgrad(cfg["learning_rate"])
    state = WaveNetTrainState(params, model_state, optimizer.init(params),
                              key)
    step = make_wavenet_train_step(cfg, wavenet_cfg, optimizer,
                                   compute_dtype=dtype)

    rng = np.random.default_rng(0)
    batch = {
        "preprocessed_audio": jnp.asarray(
            np.tanh(rng.standard_normal((B, length + 1))).astype(np.float32)),
        "input_features": jnp.asarray(rng.standard_normal(
            (B, frames, 39)).astype(np.float32)),
        "speaker_id": jnp.zeros((B,), jnp.int32),
    }

    iters = 3

    @jax.jit
    def run(state, batch):
        def body(s, _):
            s, m = step(s, batch)
            return s, None
        s, _ = jax.lax.scan(body, state, None, length=iters)
        return s

    out = run(state, batch)
    float(out.rng[0])
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(run(state, batch).rng[0])
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    print(json.dumps({"wavenet_vqvae_train": {
        "ms_per_step": round(dt * 1e3, 2),
        "samples_per_s": round(B * length / dt, 0),
        "batch": B, "length": length}}), flush=True)


if __name__ == "__main__":
    argv = sys.argv[1:]
    dtype = None
    if "bf16" in argv:
        argv.remove("bf16")
        dtype = jnp.bfloat16
    main(*(int(a) for a in argv), dtype=dtype)
