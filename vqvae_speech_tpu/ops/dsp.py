"""Speech DSP features as batched XLA ops.

This replaces the reference's host-side, per-utterance feature extraction
(reference: src/speech_utils/speech_features.py:38-72, which calls
python_speech_features.mfcc/logfbank/delta one signal at a time on CPU) with a
single batched, jittable pipeline: framing is a gather, the power spectrum is a
batched rfft, the mel filterbank and DCT-II are matmuls that map onto the MXU,
and deltas are a small matmul over a 5-tap window.  Numerics reproduce
python_speech_features defaults (winfunc=ones, preemph=0.97, nfft=512,
nfilt=26, ceplifter=22, appendEnergy=True) in float32/float64.

All shapes are static given the signal length, so the whole pipeline compiles
once and streams batches at HBM bandwidth.
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def round_half_up(x: float) -> int:
    """python_speech_features-style rounding for frame sizes (decimal ROUND_HALF_UP)."""
    return int(math.floor(x + 0.5))


def num_frames(signal_len: int, frame_len: int, frame_step: int) -> int:
    """Number of frames produced by python_speech_features-style framing."""
    if signal_len <= frame_len:
        return 1
    return 1 + int(math.ceil((signal_len - frame_len) / frame_step))


def frame_signal(signal, frame_len: int, frame_step: int):
    """Frame a batch of signals (..., S) into (..., num_frames, frame_len).

    Zero-pads the tail exactly like the reference pipeline's framing
    (rectangular window: winfunc=ones).
    """
    slen = signal.shape[-1]
    nframes = num_frames(slen, frame_len, frame_step)
    padlen = (nframes - 1) * frame_step + frame_len
    pad = [(0, 0)] * (signal.ndim - 1) + [(0, padlen - slen)]
    padded = jnp.pad(signal, pad)
    # Static gather indices: (nframes, frame_len)
    idx = (
        np.arange(frame_len)[None, :]
        + np.arange(0, nframes * frame_step, frame_step)[:, None]
    )
    return padded[..., idx]


def preemphasis(signal, coeff: float = 0.97):
    """y[0] = x[0]; y[t] = x[t] - coeff * x[t-1]."""
    return jnp.concatenate(
        [signal[..., :1], signal[..., 1:] - coeff * signal[..., :-1]], axis=-1
    )


@functools.lru_cache(maxsize=None)
def _dft_basis(frame_len: int, nfft: int):
    """cos/sin real-DFT basis, (frame_len, nfft//2+1) f64 numpy.

    `frames @ cos` / `frames @ sin` equals the real/imag parts of
    rfft(zero-padded frames) exactly — the zero padding contributes nothing
    to the inner products, so the basis only needs frame_len rows.
    """
    n = np.arange(frame_len)[:, None]
    k = np.arange(nfft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / nfft
    return np.cos(ang), np.sin(ang)


@functools.lru_cache(maxsize=None)
def _dft_basis_packed(frame_len: int, nfft: int):
    """[cos(0..nfft/2) | sin(1..nfft/2-1)] basis, (frame_len, nfft) f64.

    The sin columns at k=0 and k=nfft/2 are identically zero (sin(0),
    sin(-pi*n)), so the real DFT needs exactly nfft informative columns —
    packing them into ONE matmul makes the output width a multiple of the
    128-lane MXU tile (nfft=512 fits exactly), where the two-matmul form
    pads each 257-column result to 384 lanes (~1.5x the MXU passes).

    Measured on v5e at the flagship frame count (48k frames x 400):
    packed 1982 us vs two-matmul 2148 us (+8%), bit-identical output —
    the gain is smaller than the lane-padding arithmetic suggests because
    the 6-pass HIGHEST-precision accumulation dominates either layout.
    """
    half = nfft // 2
    cos_b, sin_b = _dft_basis(frame_len, nfft)
    return np.concatenate([cos_b, sin_b[:, 1:half]], axis=1)


def power_spectrum(frames, nfft: int = 512, method: str = "auto"):
    """1/nfft * |rfft(frames, nfft)|^2 over the last axis.

    method='dft' computes the real DFT as two matmuls against a cos/sin
    basis — on TPU the FFT runs on the VPU and dominates the whole MFCC
    stage (~2.1 ms of a 3.1 ms encode at batch 256, RESULTS.md), while the
    matmul form rides the MXU.  'auto' picks the matmul form for f32 on
    TPU and the rfft elsewhere (f64 golden paths, CPU).  The matmuls run at
    HIGHEST precision so f32 numerics match the rfft to ~1e-5 relative.
    """
    fl = frames.shape[-1]
    if fl > nfft:
        frames = frames[..., :nfft]
        fl = nfft
    if method == "auto":
        method = ("dft" if frames.dtype == jnp.float32
                  and jax.default_backend() == "tpu" else "rfft")
    if method == "dft":
        half = nfft // 2
        if nfft % 2 == 0:
            # single lane-aligned matmul: [re(0..half) | im(1..half-1)]
            basis = jnp.asarray(_dft_basis_packed(fl, nfft), frames.dtype)
            y = jnp.dot(frames, basis, precision=jax.lax.Precision.HIGHEST)
            re_sq = jnp.square(y[..., :half + 1])
            im_sq = jnp.square(y[..., half + 1:])
            return (1.0 / nfft) * jnp.concatenate(
                [re_sq[..., :1], re_sq[..., 1:half] + im_sq,
                 re_sq[..., half:]], axis=-1)
        cos_b, sin_b = _dft_basis(fl, nfft)
        cos_b = jnp.asarray(cos_b, frames.dtype)
        sin_b = jnp.asarray(sin_b, frames.dtype)
        re = jnp.dot(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
        im = jnp.dot(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
        return (1.0 / nfft) * (jnp.square(re) + jnp.square(im))
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    return (1.0 / nfft) * jnp.square(jnp.abs(spec))


def _hz2mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, np.float64) / 700.0)


def _mel2hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    nfilt: int = 26,
    nfft: int = 512,
    samplerate: int = 16000,
    lowfreq: float = 0.0,
    highfreq: float = None,
) -> np.ndarray:
    """Triangular mel filterbank, (nfilt, nfft//2 + 1), float64 numpy.

    Integer-bin triangle construction (filters anchored on FFT-bin integers),
    matching the standard python_speech_features get_filterbanks recipe.
    """
    highfreq = highfreq or samplerate / 2
    lowmel, highmel = _hz2mel(lowfreq), _hz2mel(highfreq)
    melpoints = np.linspace(lowmel, highmel, nfilt + 2)
    bins = np.floor((nfft + 1) * _mel2hz(melpoints) / samplerate).astype(np.int64)
    fb = np.zeros((nfilt, nfft // 2 + 1), dtype=np.float64)
    for j in range(nfilt):
        for i in range(int(bins[j]), int(bins[j + 1])):
            fb[j, i] = (i - bins[j]) / (bins[j + 1] - bins[j])
        for i in range(int(bins[j + 1]), int(bins[j + 2])):
            fb[j, i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1])
    return fb


@functools.lru_cache(maxsize=None)
def _dct2_ortho_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_in, n_out): y = x @ M gives scipy
    ``dct(x, type=2, norm='ortho')[:n_out]``."""
    k = np.arange(n_out)[None, :]
    i = np.arange(n_in)[:, None]
    m = np.cos(np.pi * k * (2.0 * i + 1.0) / (2.0 * n_in))
    # norm='ortho' scaling: sqrt(1/N) for k=0, sqrt(2/N) for k>0.
    scale = np.full(n_out, np.sqrt(2.0 / n_in))
    scale[0] = np.sqrt(1.0 / n_in)
    return m * scale[None, :]


@functools.lru_cache(maxsize=None)
def _lifter_vector(ncep: int, L: int = 22) -> np.ndarray:
    if L <= 0:
        return np.ones(ncep)
    n = np.arange(ncep)
    return 1.0 + (L / 2.0) * np.sin(np.pi * n / L)


def fbank(
    signal,
    samplerate: int = 16000,
    winlen: float = 0.025,
    winstep: float = 0.01,
    nfilt: int = 26,
    nfft: int = 512,
    lowfreq: float = 0.0,
    highfreq: float = None,
    preemph: float = 0.97,
):
    """Mel filterbank energies + per-frame total energy for a batch of signals.

    Returns (feat, energy): feat (..., T, nfilt), energy (..., T).
    """
    frame_len = round_half_up(winlen * samplerate)
    frame_step = round_half_up(winstep * samplerate)
    signal = preemphasis(signal, preemph)
    frames = frame_signal(signal, frame_len, frame_step)
    pspec = power_spectrum(frames, nfft)
    energy = jnp.sum(pspec, axis=-1)
    energy = jnp.where(energy == 0, jnp.finfo(jnp.float32).eps, energy)
    fb = jnp.asarray(
        mel_filterbank(nfilt, nfft, samplerate, lowfreq, highfreq),
        dtype=pspec.dtype,
    )
    feat = pspec @ fb.T
    feat = jnp.where(feat == 0, jnp.finfo(jnp.float32).eps, feat)
    return feat, energy


def mfcc(
    signal,
    samplerate: int = 16000,
    numcep: int = 13,
    nfilt: int = 26,
    nfft: int = 512,
    winlen: float = 0.025,
    winstep: float = 0.01,
    lowfreq: float = 0.0,
    highfreq: float = None,
    preemph: float = 0.97,
    ceplifter: int = 22,
    append_energy: bool = True,
):
    """Batched MFCC, (..., S) -> (..., T, numcep).

    Reproduces the numerics used by the reference's feature export
    (reference: src/speech_utils/speech_features.py:39-41 which uses
    python_speech_features.mfcc defaults).
    """
    feat, energy = fbank(
        signal, samplerate, winlen, winstep, nfilt, nfft, lowfreq, highfreq, preemph
    )
    feat = jnp.log(feat)
    dctm = jnp.asarray(_dct2_ortho_matrix(nfilt, numcep), dtype=feat.dtype)
    feat = feat @ dctm
    lift = jnp.asarray(_lifter_vector(numcep, ceplifter), dtype=feat.dtype)
    feat = feat * lift
    if append_energy:
        feat = feat.at[..., 0].set(jnp.log(energy))
    return feat


def logfbank(
    signal,
    samplerate: int = 16000,
    nfilt: int = 26,
    nfft: int = 512,
    winlen: float = 0.025,
    winstep: float = 0.01,
    lowfreq: float = 0.0,
    highfreq: float = None,
    preemph: float = 0.97,
):
    """Batched log mel filterbank energies (..., S) -> (..., T, nfilt)."""
    feat, _ = fbank(
        signal, samplerate, winlen, winstep, nfilt, nfft, lowfreq, highfreq, preemph
    )
    return jnp.log(feat)


def delta(feat, N: int = 2):
    """Delta features over the time axis (axis=-2), edge-padded.

    d[t] = sum_{n=1..N} n*(feat[t+n] - feat[t-n]) / (2*sum n^2)
    Matches python_speech_features.delta (used by the reference at
    src/speech_utils/speech_features.py:43-44).
    """
    if N < 1:
        raise ValueError("N must be >= 1")
    denom = 2.0 * sum(n**2 for n in range(1, N + 1))
    pad = [(0, 0)] * feat.ndim
    pad[-2] = (N, N)
    padded = jnp.pad(feat, pad, mode="edge")
    T = feat.shape[-2]
    out = jnp.zeros_like(feat)
    for n in range(-N, N + 1):
        if n == 0:
            continue
        # padded slice shifted by n relative to t
        sl = [slice(None)] * feat.ndim
        sl[-2] = slice(N + n, N + n + T)
        out = out + n * padded[tuple(sl)]
    return out / denom


def speech_features(
    name: str,
    signal,
    rate: int = 16000,
    filters_number: int = 13,
    augmented: bool = True,
):
    """Dispatch by feature name with optional delta/delta-delta augmentation.

    Mirrors SpeechFeatures.features_from_name
    (reference: src/speech_utils/speech_features.py:70-72): 'mfcc' uses
    ``numcep=filters_number``; 'logfbank' uses ``nfilt=filters_number``;
    augmented concatenates [feat, delta(feat,2), delta(delta,2)] on the
    feature axis.
    """
    if name == "mfcc":
        feat = mfcc(signal, samplerate=rate, numcep=filters_number)
    elif name == "logfbank":
        feat = logfbank(signal, samplerate=rate, nfilt=filters_number)
    else:
        raise ValueError(f"unknown feature type: {name!r}")
    if not augmented:
        return feat
    d = delta(feat, 2)
    a = delta(d, 2)
    return jnp.concatenate([feat, d, a], axis=-1)
