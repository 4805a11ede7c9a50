"""librosa-compatible mel spectrograms (batched XLA) for the vocoder pipelines.

The ClariNet/FloWaveNet preprocessing uses librosa.feature.melspectrogram at
22.05 kHz (n_fft 1024, hop 256, 80 mels, fmin 125, fmax 7600) followed by a
dB normalization into [0, 1] (reference src/clarinet/preprocessing.py:49-70).
librosa is not in this image; this module reproduces its numerics: centered
reflect-padded hann STFT, power spectrum, Slaney-scale mel filterbank with
Slaney area normalization.
"""
import functools

import jax.numpy as jnp
import numpy as np


def _hz_to_mel_slaney(hz):
    hz = np.asarray(hz, np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (hz - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(hz >= min_log_hz,
                    min_log_mel + np.log(hz / min_log_hz) / logstep, mel)


def _mel_to_hz_slaney(mel):
    mel = np.asarray(mel, np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    hz = f_min + f_sp * mel
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mel >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mel - min_log_mel)), hz)


@functools.lru_cache(maxsize=None)
def mel_filterbank_slaney(sr: int = 22050, n_fft: int = 1024,
                          n_mels: int = 80, fmin: float = 125.0,
                          fmax: float = 7600.0) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney'): (n_mels, 1+n_fft//2)."""
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    # Slaney area normalization
    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    return weights * enorm[:, None]


def stft_power(y, n_fft: int = 1024, hop_length: int = 256):
    """Centered (reflect-padded) hann-window power spectrogram,
    (..., S) -> (..., n_frames, 1+n_fft//2) — librosa.stft semantics."""
    pad = n_fft // 2
    pads = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    yp = jnp.pad(y, pads, mode="reflect")
    n_frames = 1 + (yp.shape[-1] - n_fft) // hop_length
    idx = (np.arange(n_fft)[None, :]
           + hop_length * np.arange(n_frames)[:, None])
    frames = yp[..., idx]
    win = jnp.asarray(np.hanning(n_fft + 1)[:-1], dtype=y.dtype)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return jnp.square(jnp.abs(spec))


def melspectrogram(y, sr: int = 22050, n_fft: int = 1024,
                   hop_length: int = 256, n_mels: int = 80,
                   fmin: float = 125.0, fmax: float = 7600.0):
    """(..., S) -> (..., n_frames, n_mels) power mel spectrogram."""
    S = stft_power(y, n_fft, hop_length)
    fb = jnp.asarray(mel_filterbank_slaney(sr, n_fft, n_mels, fmin, fmax),
                     dtype=S.dtype)
    return S @ fb.T


def normalized_log_mel(y, sr: int = 22050, n_fft: int = 1024,
                       hop_length: int = 256, n_mels: int = 80,
                       fmin: float = 125.0, fmax: float = 7600.0,
                       reference: float = 20.0, min_db: float = -100.0):
    """The ClariNet/FloWaveNet conditioning features: 20*log10(mel) dB,
    referenced and clipped into [0, 1]
    (reference src/clarinet/preprocessing.py:66-68)."""
    mel = melspectrogram(y, sr, n_fft, hop_length, n_mels, fmin, fmax)
    db = 20.0 * jnp.log10(jnp.maximum(1e-4, mel)) - reference
    return jnp.clip((db - min_db) / (-min_db), 0.0, 1.0)
