"""Host-side audio I/O: wav load, resample, silence trim, normalization.

Replaces the reference's librosa dependency (librosa.load + librosa.effects.trim
at reference src/dataset/vctk_dataset.py:141-152) with scipy-based equivalents:
wav read via scipy.io.wavfile, resampling via polyphase filtering
(scipy.signal.resample_poly — same role as librosa's 'kaiser_fast'), and an
RMS-envelope dB-threshold trim with librosa's framing defaults
(frame_length=2048, hop_length=512, threshold ``top_db`` below peak RMS).
"""
import math

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load_wav(path: str, target_rate: int = 16000) -> np.ndarray:
    """Read a wav file as float32 in [-1, 1], resampled to target_rate."""
    rate, data = wavfile.read(path)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if np.issubdtype(data.dtype, np.integer):
        data = data.astype(np.float32) / float(np.iinfo(data.dtype).max)
    else:
        data = data.astype(np.float32)
    if rate != target_rate:
        g = math.gcd(int(rate), int(target_rate))
        data = resample_poly(data, target_rate // g, rate // g).astype(np.float32)
    return data


def _frame_rms(y: np.ndarray, frame_length: int = 2048,
               hop_length: int = 512) -> np.ndarray:
    """Center-padded framewise RMS (librosa.feature.rms semantics)."""
    pad = frame_length // 2
    yp = np.pad(y, (pad, pad))
    n_frames = 1 + (len(yp) - frame_length) // hop_length
    idx = (np.arange(frame_length)[None, :]
           + hop_length * np.arange(n_frames)[:, None])
    frames = yp[idx]
    return np.sqrt(np.mean(frames**2, axis=1))


def trim_silence(y: np.ndarray, top_db: float = 20.0,
                 frame_length: int = 2048, hop_length: int = 512):
    """Trim leading/trailing silence ``top_db`` below the peak RMS.

    Returns (trimmed, (start_idx, end_idx)) like librosa.effects.trim.
    """
    rms = _frame_rms(y, frame_length, hop_length)
    ref = np.max(rms)
    if ref <= 0:
        return y, (0, len(y))
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref)
    non_silent = np.nonzero(db > -top_db)[0]
    if len(non_silent) == 0:
        return y[:0], (0, 0)
    start = int(non_silent[0] * hop_length)
    end = int(min(len(y), (non_silent[-1] + 1) * hop_length))
    return y[start:end], (start, end)


def load_and_preprocess(path: str, sampling_rate: int = 16000,
                        top_db: float = 20.0, trimming_duration=None):
    """Load, silence-trim (or cut a known leading-silence duration), and
    peak-normalize — reference VCTKDataset._load_wav (vctk_dataset.py:141-152).

    Uses the native C++ trim/normalize kernels when available
    (vqvae_speech_tpu/native, result-identical to the numpy path).
    Returns (audio float32 peak-normalized, trimming_time seconds).
    """
    from vqvae_speech_tpu import native

    raw = load_wav(path, sampling_rate)
    if trimming_duration is None:
        if native.available():
            start, end = native.rms_trim_bounds(raw, top_db=top_db)
            trimmed = raw[start:end]
        else:
            trimmed, (start, _) = trim_silence(raw, top_db)
        trimming_time = start / sampling_rate
    else:
        trimmed = raw[int(trimming_duration * sampling_rate):]
        trimming_time = trimming_duration
    if native.available():
        trimmed = native.peak_normalize(trimmed)
    else:
        peak = np.abs(trimmed).max()
        if peak > 0:
            trimmed = trimmed / peak
    return trimmed.astype(np.float32), trimming_time


def pad_or_random_crop(audio: np.ndarray, length: int, rng=None):
    """Zero-pad to ``length`` or random-crop a ``length`` window
    (reference vctk_dataset.py:51-66).  Returns (audio, start or None)."""
    if len(audio) <= length:
        return (np.concatenate([audio,
                                np.zeros(length - len(audio), np.float32)]),
                None)
    rng = rng or np.random.default_rng()
    start = int(rng.integers(0, len(audio) - length))
    return audio[start:start + length], start
