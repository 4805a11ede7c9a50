"""int8 AR decode fidelity in the AUDIO domain (VERDICT round-2 item #3).

The existing gate (tests/test_wavenet.py::test_int8_weight_quantized_decode_
close_to_f32) checks logits cosine > 0.99 and greedy agreement > 0.7 on a
random-init toy model.  A 30% greedy divergence compounds over an AR
utterance, so this script measures what actually matters for serving:

1. Trains a small mu-law WaveNet to low NLL on a synthetic tone corpus
   (so logits are PEAKED, like a production vocoder — random-init logits
   are near-uniform and overstate argmax flips).
2. Generates greedy + sampled streams under f32 and int8 weight-only
   quantization (same PRNG key).
3. Scores:
   * greedy agreement rate + logits cosine (the old metrics, now on a
     trained model),
   * teacher-forced per-sample NLL of each generated stream under the f32
     model — "does the f32 model think the int8 stream is (as) likely?",
   * mel-cepstral distortion (MCD, dB) between the mu-law-decoded f32 and
     int8 waveforms (standard 10*sqrt(2)/ln10 * ||c1-c2|| over MFCC 1-12).
4. Reference-scale (vctk_wavenet.yaml: 20 layers, 768 res/gate) random-init
   logits cosine + agreement for the conservative bound at serving scale.

Writes int8_fidelity/summary.json.  Reference loop being scaled:
/root/reference/src/wavenet_vocoder/wavenet.py:350-388.

Usage: python scripts/int8_fidelity_tpu.py [--steps 1200] [--gen-t 3840]
"""
import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np


def make_tone_batch(rng, B, T, rate=16000, return_waves=False):
    """Synthetic 'speech': 2-formant harmonic tones with random f0 glides,
    amplitude envelopes and noise — mu-law encoded to int labels."""
    from vqvae_speech_tpu.ops.mu_law import mu_law_encode
    import jax.numpy as jnp

    t = np.arange(T + 1) / rate
    waves = []
    for _ in range(B):
        f0 = rng.uniform(100, 240)
        glide = f0 * (1 + rng.uniform(-0.1, 0.1) * t / t[-1])
        phase = 2 * np.pi * np.cumsum(glide) / rate
        w = np.sin(phase) + 0.4 * np.sin(2 * phase + rng.uniform(0, 6.28))
        w *= 0.5 + 0.3 * np.sin(2 * np.pi * rng.uniform(1, 4) * t)
        w += 0.02 * rng.standard_normal(T + 1)
        waves.append(0.5 * w / np.abs(w).max())
    x = np.stack(waves).astype(np.float32)
    labels = np.asarray(mu_law_encode(jnp.asarray(x)))    # (B, T+1) ints
    return (labels, x) if return_waves else labels


def make_cond_batch(rng, B, T, rate=16000):
    """(labels (B, T+1), mel (B, frames, 80)) — hop-256 log-mel of the
    target audio as local conditioning (the vocoder serving shape)."""
    from vqvae_speech_tpu.ops.mel import normalized_log_mel
    import jax.numpy as jnp

    labels, waves = make_tone_batch(rng, B, T, rate, return_waves=True)
    mel = np.asarray(normalized_log_mel(jnp.asarray(waves[:, :-1]),
                                        sr=rate), np.float32)
    return labels, mel


def train_small_wavenet(cfg, steps, B=8, T=4096, lr=5e-4, seed=0,
                        conditioned=False):
    import jax
    import jax.numpy as jnp
    import optax
    from vqvae_speech_tpu.models.wavenet.model import (
        wavenet_init, wavenet_apply)

    params = wavenet_init(jax.random.PRNGKey(seed), cfg)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    rng = np.random.default_rng(seed)

    def loss_fn(params, labels, c):
        x = jax.nn.one_hot(labels[:, :-1], cfg.out_channels)
        logits = wavenet_apply(params, cfg, x, c=c, training=True,
                               rng=jax.random.PRNGKey(0))
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = labels[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        return jnp.mean(nll)

    @jax.jit
    def step(params, opt_state, labels, c):
        loss, grads = jax.value_and_grad(loss_fn)(params, labels, c)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for i in range(steps):
        if conditioned:
            labels, mel = make_cond_batch(rng, B, T)
            labels, mel = jnp.asarray(labels), jnp.asarray(mel)
        else:
            labels, mel = jnp.asarray(make_tone_batch(rng, B, T)), None
        params, opt_state, loss = step(params, opt_state, labels, mel)
        if i % 100 == 0:
            print(f"  train step {i}: nll {float(loss):.4f}", flush=True)
    return params, float(loss)


def teacher_forced_nll(params, cfg, labels, c=None):
    """Mean per-sample NLL of an int stream under the f32 model."""
    import jax
    import jax.numpy as jnp
    from vqvae_speech_tpu.models.wavenet.model import wavenet_apply

    labels = jnp.asarray(labels)
    x = jax.nn.one_hot(labels[:, :-1], cfg.out_channels)
    logits = wavenet_apply(params, cfg, x, c=c, training=False)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, 1:][..., None], axis=-1)
    return float(jnp.mean(nll))


def mcd_db(wave_a, wave_b, rate=16000):
    """Mel-cepstral distortion over MFCC 1..12 (c0 excluded), dB."""
    import jax.numpy as jnp
    from vqvae_speech_tpu.ops import mfcc

    ca = np.asarray(mfcc(jnp.asarray(wave_a, jnp.float64)))[:, 1:]
    cb = np.asarray(mfcc(jnp.asarray(wave_b, jnp.float64)))[:, 1:]
    n = min(len(ca), len(cb))
    d = np.sqrt(np.sum((ca[:n] - cb[:n]) ** 2, axis=1))
    return float((10.0 * np.sqrt(2.0) / np.log(10.0)) * d.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--gen-t", type=int, default=3840)
    ap.add_argument("--conditioned", action="store_true",
                    help="mel-condition the model (hop-256 log-mel of the "
                         "target) so MCD compares pinned trajectories")
    ap.add_argument("--out", default="int8_fidelity")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vqvae_speech_tpu.models.wavenet.model import (
        WaveNetConfig, wavenet_init)
    from vqvae_speech_tpu.models.wavenet.incremental import (
        wavenet_incremental_generate)
    from vqvae_speech_tpu.ops.mu_law import mu_law_decode

    t0 = time.time()
    conditioned = args.conditioned
    cfg = WaveNetConfig(out_channels=256, layers=12, stacks=2,
                        residual_channels=128, gate_channels=128,
                        skip_out_channels=128, kernel_size=3, dropout=0.0,
                        cin_channels=80 if conditioned else -1,
                        gin_channels=-1,
                        upsample_conditional_features=conditioned,
                        upsample_scales=(16, 16) if conditioned else None)
    label = ("12L/128ch trained, mel-conditioned" if conditioned
             else "12L/128ch trained")
    print(f"training small mu-law WaveNet on tone corpus "
          f"({label})...", flush=True)
    params, final_nll = train_small_wavenet(cfg, args.steps,
                                            conditioned=conditioned)

    T = args.gen_t
    summary = {"platform": jax.default_backend(),
               "train_final_nll": round(final_nll, 4),
               "uniform_nll": round(float(np.log(256)), 4),
               "gen_samples": T, "config": label,
               "streams": {}}

    # held-out conditioning: with mel pinned, f32/int8 trajectories stay on
    # the same utterance and MCD measures degradation, not divergence
    gen_c = None
    if conditioned:
        _, gen_mel = make_cond_batch(np.random.default_rng(999), 1, T)
        gen_c = jnp.asarray(gen_mel)

    streams = {}
    for mode, sample in (("greedy", False), ("sampled", True)):
        for quant in (None, "int8", "int8_block"):
            outs, em = wavenet_incremental_generate(
                params, cfg, jax.random.PRNGKey(42), T, c=gen_c,
                sample=sample, weight_quant=quant)
            key = f"{mode}_{quant or 'f32'}"
            streams[key] = (np.asarray(outs), np.asarray(em))
            print(f"  generated {key}", flush=True)

    for mode in ("greedy", "sampled"):
        a_out, a_em = streams[f"{mode}_f32"]
        nll_f32 = teacher_forced_nll(params, cfg, a_em, c=gen_c)
        wave_a = np.asarray(mu_law_decode(jnp.asarray(a_em)))[0]
        for quant in ("int8", "int8_block"):
            b_out, b_em = streams[f"{mode}_{quant}"]
            av, bv = a_out.ravel(), b_out.ravel()
            cos = float(av @ bv / (np.linalg.norm(av) * np.linalg.norm(bv)
                                   + 1e-12))
            agree = float(np.mean(a_em == b_em))
            nll_q = teacher_forced_nll(params, cfg, b_em, c=gen_c)
            wave_b = np.asarray(mu_law_decode(jnp.asarray(b_em)))[0]
            key = mode if quant == "int8" else f"{mode}_{quant}"
            summary["streams"][key] = {
                "logits_cosine": round(cos, 6),
                "stream_agreement": round(agree, 4),
                "nll_of_f32_stream_under_f32_model": round(nll_f32, 4),
                "nll_of_int8_stream_under_f32_model": round(nll_q, 4),
                "nll_gap": round(nll_q - nll_f32, 4),
                "mcd_db_f32_vs_int8": round(mcd_db(wave_a, wave_b), 3),
            }
            print(json.dumps({key: summary["streams"][key]}), flush=True)

    # reference scale, random init: the conservative (near-uniform logits)
    # bound for the serving configuration
    ref_cfg = WaveNetConfig(out_channels=256, layers=20, stacks=2,
                            residual_channels=768, gate_channels=768,
                            skip_out_channels=256, kernel_size=3,
                            dropout=0.0, cin_channels=-1, gin_channels=-1)
    ref_params = wavenet_init(jax.random.PRNGKey(1), ref_cfg)
    Tr = 1024
    ro_f32, re_f32 = wavenet_incremental_generate(
        ref_params, ref_cfg, jax.random.PRNGKey(7), Tr, sample=False)
    ro_q, re_q = wavenet_incremental_generate(
        ref_params, ref_cfg, jax.random.PRNGKey(7), Tr, sample=False,
        weight_quant="int8")
    av, bv = np.asarray(ro_f32).ravel(), np.asarray(ro_q).ravel()
    summary["reference_scale_random_init"] = {
        "note": "random-init logits are near-uniform; argmax flips are "
                "maximally likely, so these are conservative lower bounds",
        "logits_cosine": round(float(
            av @ bv / (np.linalg.norm(av) * np.linalg.norm(bv) + 1e-12)), 6),
        "stream_agreement": round(float(
            np.mean(np.asarray(re_f32) == np.asarray(re_q))), 4),
    }
    summary["wall_s"] = round(time.time() - t0, 1)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
        f.write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
