"""Component-level profile of the flagship encode path on hardware.

Times MFCC, encoder, and VQ separately (scan-chained, host-fetch-bounded —
RESULTS.md methodology) to locate the non-MXU fraction of the encode step,
plus the full pipeline for reference.  Drives VERDICT round-1 weak #9
(encode at ~50% of matmul peak).

Usage: python scripts/profile_encode_tpu.py [batch] [iters]
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

from bench import _make_waves, RATE, NUMCEP, FRAMES, HID, EMB_DIM, CODES, N_RES
from vqvae_speech_tpu.ops import speech_features
from vqvae_speech_tpu.models import conv_vqvae_init, conv_vqvae_encode
from vqvae_speech_tpu.models.encoder import convolutional_encoder_apply
from vqvae_speech_tpu.nn.conv import conv1d
from vqvae_speech_tpu.ops.vq import reference_flatten, vq_search


def timeit(fn, arg, iters):
    @jax.jit
    def loop(x):
        def body(carry, gain):
            out = fn(x * gain)
            return carry + jnp.sum(out[:1].astype(jnp.float32)), None
        gains = 1.0 + 1e-6 * jnp.arange(iters, dtype=jnp.float32)
        total, _ = jax.lax.scan(body, jnp.float32(0), gains)
        return total
    float(loop(arg))  # compile + warm
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(arg))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main(batch=256, iters=20):
    cfg = dict(
        input_features_filters=NUMCEP, augment_input_features=True,
        output_features_filters=NUMCEP, augment_output_features=True,
        num_hiddens=HID, num_residual_layers=N_RES, residual_channels=HID,
        embedding_dim=EMB_DIM, num_embeddings=CODES, commitment_cost=0.25,
        decay=0.0, use_kaiming_normal=False, use_jitter=False,
        jitter_probability=0.12, use_speaker_conditioning=False,
    )
    params, state = conv_vqvae_init(jax.random.PRNGKey(0), cfg)
    waves = jnp.asarray(_make_waves(batch))
    feats = speech_features("mfcc", waves, RATE, NUMCEP, True).astype(jnp.float32)
    enc_params = params["encoder"]

    hidden = convolutional_encoder_apply(enc_params, feats, N_RES)
    z = conv1d(params["pre_vq_conv"], hidden)

    rows = {}
    rows["mfcc"] = timeit(
        lambda w: speech_features("mfcc", w, RATE, NUMCEP, True), waves, iters)
    rows["encoder"] = timeit(
        lambda f: convolutional_encoder_apply(enc_params, f, N_RES),
        feats, iters)
    rows["pre_vq+vq"] = timeit(
        lambda h: vq_search(
            reference_flatten(conv1d(params["pre_vq_conv"], h), EMB_DIM),
            params["vq"]["codebook"]).quantized, hidden, iters)
    rows["full"] = timeit(
        lambda w: conv_vqvae_encode(
            params, state,
            speech_features("mfcc", w, RATE, NUMCEP, True).astype(jnp.float32),
            cfg, training=False).indices, waves, iters)

    frames = batch * FRAMES
    out = {k: {"ms": round(v * 1e3, 3),
               "frames_per_s": round(frames / v, 0)} for k, v in rows.items()}
    out["sum_parts_ms"] = round(
        (rows["mfcc"] + rows["encoder"] + rows["pre_vq+vq"]) * 1e3, 3)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
