"""SNR-controlled noise injection + tempo/gain augmentation (sox-free).

Capability-parity with reference src/dataset/noise_injector.py:34-83 (which
shells out to sox/soxi per sample) and the sox tempo/gain augmentation in
src/dataset/spectrogram_parser.py:103-129 — reimplemented with in-process
numpy/scipy: noise files are memory-mapped wavs, cropping/resampling is
polyphase, and the energy-matched mixing formula is identical:

    data += noise_level * noise * rms(data) / rms(noise)

Tempo change is resampling-based (changes pitch with rate, unlike sox's
pitch-preserving WSOLA — documented deviation; the augmentation's purpose is
robustness noise, not pitch fidelity).
"""
import os

import numpy as np

from vqvae_speech_tpu.data.audio import load_wav


def _find_audio_files(path):
    out = []
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if f.lower().endswith((".wav", ".flac")):
                out.append(os.path.join(root, f))
    return out


class NoiseInjector:
    def __init__(self, path, sample_rate: int = 16000,
                 noise_levels=(0.0, 0.5), rng=None):
        if path is None or not os.path.exists(path):
            raise IOError(f"Directory doesn't exist: {path}")
        self.paths = _find_audio_files(path)
        if not self.paths:
            raise IOError(f"No audio files under: {path}")
        self.sample_rate = sample_rate
        self.noise_levels = noise_levels
        self._rng = rng or np.random.default_rng()

    def inject_noise(self, data):
        noise_path = self.paths[self._rng.integers(len(self.paths))]
        noise_level = self._rng.uniform(*self.noise_levels)
        return self.inject_noise_sample(data, noise_path, noise_level)

    def inject_noise_sample(self, data, noise_path, noise_level):
        noise = load_wav(noise_path, self.sample_rate)
        if len(noise) < len(data):  # loop short noise
            noise = np.tile(noise, int(np.ceil(len(data) / len(noise))))
        start = int(self._rng.integers(0, len(noise) - len(data) + 1))
        noise = noise[start:start + len(data)]
        noise_energy = np.sqrt(noise.dot(noise) / noise.size)
        data_energy = np.sqrt(data.dot(data) / data.size)
        if noise_energy == 0:
            return data
        return (data + noise_level * noise * data_energy
                / noise_energy).astype(np.float32)


def augment_tempo_gain(audio, sample_rate: int = 16000,
                       tempo_range=(0.85, 1.15), gain_range=(-6, 8),
                       rng=None):
    """Random tempo (resampling-based) + gain (dB) perturbation
    (reference spectrogram_parser.py:103-129)."""
    from scipy.signal import resample_poly

    rng = rng or np.random.default_rng()
    tempo = rng.uniform(*tempo_range)
    gain_db = rng.uniform(*gain_range)
    up = max(int(round(1000 / tempo)), 1)
    out = resample_poly(audio, up, 1000).astype(np.float32)
    return out * (10.0 ** (gain_db / 20.0))
