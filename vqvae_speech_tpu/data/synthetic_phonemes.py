"""Synthetic phoneme corpus: formant-structured segments with TextGrids.

Generates a VCTK-shaped corpus (wav48/<spk>/<utt>.wav +
phonemes/<spk>/<utt>.TextGrid) where each utterance is a sequence of
"phoneme" segments drawn from a fixed inventory of distinct spectral timbres
(formant-like harmonic profiles).  Because the groundtruth unit boundaries
and identities are known exactly, the FULL quality pipeline — export ->
train -> empirical alignments -> ARI/AMI/NMI against TextGrids — can be
validated end-to-end with a meaningful expected signal: a working VQ-VAE
must produce codes that align with the timbre segments far better than
chance (the reference can only demonstrate this with the real VCTK corpus,
which is not shipped).
"""
import os

import numpy as np
from scipy.io import wavfile

# phoneme inventory: (formant-ish harmonic frequencies Hz, amplitudes)
PHONEME_SPECS = {
    "AA": ((200, 700, 1200), (1.0, 0.7, 0.3)),
    "IY": ((250, 2200, 3000), (1.0, 0.5, 0.25)),
    "UW": ((300, 870, 2240), (1.0, 0.6, 0.2)),
    "EH": ((500, 1800, 2500), (1.0, 0.6, 0.3)),
    "SH": ((2500, 3500, 4500), (0.5, 0.6, 0.5)),  # noise-dominant
}


def _segment(name, dur_samples, rate, rng, noise=0.02):
    freqs, amps = PHONEME_SPECS[name]
    t = np.arange(dur_samples) / rate
    sig = np.zeros(dur_samples)
    phase = rng.uniform(0, 2 * np.pi, len(freqs))
    for f, a, p in zip(freqs, amps, phase):
        sig += a * np.sin(2 * np.pi * f * t + p)
    if name == "SH":
        sig = 0.3 * sig + 0.7 * rng.standard_normal(dur_samples)
    sig *= 0.8 / max(np.abs(sig).max(), 1e-6)
    # short fade in/out to avoid clicks
    ramp = min(80, dur_samples // 4)
    env = np.ones(dur_samples)
    if ramp > 0:
        env[:ramp] = np.linspace(0, 1, ramp)
        env[-ramp:] = np.linspace(1, 0, ramp)
    return sig * env + noise * rng.standard_normal(dur_samples)


def build_phoneme_corpus(root, num_speakers=2, utts_per_speaker=8,
                         utt_seconds=0.6, rate=16000, seed=0):
    """Write the corpus tree; returns (dset_path, phonemes list)."""
    rng = np.random.default_rng(seed)
    dset = os.path.join(root, "raw", "VCTK-Corpus")
    phonemes = list(PHONEME_SPECS)
    for s in range(num_speakers):
        spk = f"p{300 + s}"
        wav_dir = os.path.join(dset, "wav48", spk)
        tg_dir = os.path.join(dset, "phonemes", spk)
        txt_dir = os.path.join(dset, "txt", spk)
        for d in (wav_dir, tg_dir, txt_dir):
            os.makedirs(d, exist_ok=True)
        for u in range(utts_per_speaker):
            name = f"{spk}_{u:03d}"
            total = int(utt_seconds * rate)
            segs, marks = [], []
            pos = 0
            while pos < total:
                ph = phonemes[rng.integers(len(phonemes))]
                dur = int(rng.uniform(0.08, 0.2) * rate)
                dur = min(dur, total - pos)
                segs.append(_segment(ph, dur, rate, rng))
                marks.append((pos / rate, (pos + dur) / rate, ph))
                pos += dur
            sig = np.concatenate(segs)
            wavfile.write(os.path.join(wav_dir, name + ".wav"), rate,
                          (np.clip(sig, -1, 1) * 32767).astype(np.int16))
            _write_textgrid(os.path.join(tg_dir, name + ".TextGrid"),
                            marks, total / rate)
            with open(os.path.join(txt_dir, name + ".txt"), "w") as f:
                f.write(" ".join(m[2] for m in marks) + "\n")
    return dset, phonemes


def _write_textgrid(path, marks, xmax):
    lines = [
        'File type = "ooTextFile"', 'Object class = "TextGrid"', "",
        "xmin = 0", f"xmax = {xmax}", "tiers? <exists>", "size = 2",
        "item []:",
    ]
    for tier_i, (tier_name, intervals) in enumerate((
            ("words", [(0.0, xmax, "utt")]), ("phonemes", marks)), start=1):
        lines += [
            f"    item [{tier_i}]:",
            '        class = "IntervalTier"',
            f'        name = "{tier_name}"',
            "        xmin = 0", f"        xmax = {xmax}",
            f"        intervals: size = {len(intervals)}",
        ]
        for k, (a, b, mark) in enumerate(intervals, start=1):
            lines += [
                f"        intervals [{k}]:",
                f"            xmin = {a}", f"            xmax = {b}",
                f'            text = "{mark}"',
            ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
