"""Experiment: alternative lowerings of the encoder's k3 convs on TPU.

Compares, at the flagship encode shapes (B=256, T=47/24, C=768):
  a) lax.conv_general_dilated (current nn/conv.py path)
  b) shifted-dots: y = x_{t-1} @ W0 + x_t @ W1 + x_{t+1} @ W2
  c) im2col concat + single dot
plus a full-encoder A/B and a batch-size sweep of the full encode pipeline.

Methodology: RESULTS.md — scan-chained iterations, host-fetch bounded.
"""
import sys
import time
import json
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp

B, T, C = 256, 47, 768
ITERS = 50


def timeit(fn, *args, iters=ITERS):
    @jax.jit
    def loop(*xs):
        def body(carry, gain):
            out = fn(xs[0] * gain, *xs[1:])
            return carry + jnp.sum(out[0, 0].astype(jnp.float32)), None
        gains = 1.0 + 1e-6 * jnp.arange(iters, dtype=jnp.float32)
        total, _ = jax.lax.scan(body, jnp.float32(0), gains)
        return total
    float(loop(*args))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, C, C)).astype(np.float32) * 0.02)
    b = jnp.zeros((C,), jnp.float32)

    def conv_lax(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=((1, 1),),
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y + b

    def conv_shifted(x, w, b):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        y = (jnp.einsum("btc,cd->btd", xp[:, :-2], w[0])
             + jnp.einsum("btc,cd->btd", xp[:, 1:-1], w[1])
             + jnp.einsum("btc,cd->btd", xp[:, 2:], w[2]))
        return y + b

    def conv_im2col(x, w, b):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        cols = jnp.concatenate([xp[:, :-2], xp[:, 1:-1], xp[:, 2:]], axis=-1)
        return cols.reshape(-1, 3 * C) @ w.reshape(3 * C, C) + b

    gflop = 2 * B * T * 3 * C * C / 1e9
    out = {}
    for name, fn in [("lax_conv", conv_lax), ("shifted_dots", conv_shifted),
                     ("im2col", conv_im2col)]:
        dt = timeit(fn, x, w, b)
        out[name] = {"us": round(dt * 1e6, 1),
                     "tflops": round(gflop / dt / 1e3, 1)}
    print(json.dumps({"single_k3_conv_B256_T47_C768": out}))

    # full encode batch sweep
    from bench import _make_waves, RATE, NUMCEP, HID, EMB_DIM, CODES, N_RES, FRAMES
    from vqvae_speech_tpu.ops import speech_features
    from vqvae_speech_tpu.models import conv_vqvae_init, conv_vqvae_encode
    cfg = dict(
        input_features_filters=NUMCEP, augment_input_features=True,
        output_features_filters=NUMCEP, augment_output_features=True,
        num_hiddens=HID, num_residual_layers=N_RES, residual_channels=HID,
        embedding_dim=EMB_DIM, num_embeddings=CODES, commitment_cost=0.25,
        decay=0.0, use_kaiming_normal=False, use_jitter=False,
        jitter_probability=0.12, use_speaker_conditioning=False,
    )
    params, state = conv_vqvae_init(jax.random.PRNGKey(0), cfg)
    sweep = {}
    for batch in (128, 256, 512, 1024):
        waves = jnp.asarray(_make_waves(batch))
        dt = timeit(
            lambda w: conv_vqvae_encode(
                params, state,
                speech_features("mfcc", w, RATE, NUMCEP, True
                                ).astype(jnp.float32),
                cfg, training=False).indices.astype(jnp.float32)[None],
            waves, iters=20)
        sweep[batch] = round(batch * FRAMES / dt / 1e6, 2)
    print(json.dumps({"full_encode_Mframes_per_s_by_batch": sweep}))


if __name__ == "__main__":
    main()
