"""Synthetic speech-like dataset for tests and smoke training.

Generates harmonic-plus-noise waveforms with per-"speaker" base pitch, runs
them through the real batched feature pipeline (ops/dsp.py), and writes a
FeatureStore — i.e. everything downstream of ingest is exercised for real.
Mirrors the role of the reference's 2-D synthetic clustering demos
(reference vqvae_2d_direct_clustering.py) as a hardware-free validation path.
"""
import numpy as np
import jax.numpy as jnp

from vqvae_speech_tpu.ops import speech_features
from vqvae_speech_tpu.data.feature_store import FeatureStore


def synth_waveforms(num: int, length: int = 7680, rate: int = 16000,
                    num_speakers: int = 4, seed: int = 0):
    rng = np.random.default_rng(seed)
    t = np.arange(length) / rate
    waves = np.empty((num, length), np.float32)
    speakers = rng.integers(0, num_speakers, num).astype(np.int32)
    for i in range(num):
        f0 = 90.0 + 40.0 * speakers[i] + rng.uniform(-10, 10)
        sig = np.zeros(length)
        for h in range(1, 6):
            sig += rng.uniform(0.1, 0.5) / h * np.sin(
                2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
        sig += 0.02 * rng.standard_normal(length)
        waves[i] = (sig / np.max(np.abs(sig))).astype(np.float32)
    return waves, speakers


def build_synthetic_store(root: str, num_train: int = 16, num_val: int = 4,
                          length: int = 7680, rate: int = 16000,
                          features_type: str = "mfcc", filters: int = 13,
                          seed: int = 0) -> FeatureStore:
    store = FeatureStore(root)
    for split, num, s in [("train", num_train, seed), ("val", num_val, seed + 1)]:
        waves, speakers = synth_waveforms(num, length, rate, seed=s)
        feats = np.asarray(
            speech_features(features_type, jnp.asarray(waves), rate, filters, True)
        )
        names = [f"synth/p{speakers[i]:03d}/p{speakers[i]:03d}_{i:03d}.wav"
                 for i in range(num)]
        store.write(split, feats, feats, speakers,
                    metadata={"synthetic": True, "length": length,
                              "rate": rate, "wav_filenames": names,
                              "shifting_times": [0.0] * num,
                              "random_starting_indices": [0] * num},
                    preprocessed_audio=waves)
    return store
