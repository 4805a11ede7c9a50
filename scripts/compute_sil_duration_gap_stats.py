"""Audit: gap between TextGrid leading-silence and RMS-trim per utterance.

Capability-parity with reference scripts/compute_sil_duration_gap_stats.py:
for each val utterance, compares the phoneme-alignment 'sil' duration with
the trim-based shifting time recorded at export and plots/pickles the gaps.

Usage: python scripts/compute_sil_duration_gap_stats.py <features_root>
       [phonemes_root] [out_dir]
"""
import os
import pickle
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from vqvae_speech_tpu.data.feature_store import FeatureStore
from vqvae_speech_tpu.data.textgrid import leading_silence_duration
from vqvae_speech_tpu.utils.logger import ConsoleLogger


def compute_sil_duration_gap_stats(features_root, phonemes_root,
                                   out_dir=".", split="val",
                                   sampling_rate=16000, plot=True):
    store = FeatureStore(features_root)
    meta = store.metadata(split)
    wavs = meta.get("wav_filenames", [])
    shifts = meta.get("shifting_times", [])
    starts = meta.get("random_starting_indices", [0] * len(wavs))

    gaps, files, detected = [], [], []
    for wav, shift, start in zip(wavs, shifts, starts):
        key = os.path.basename(wav).rsplit(".", 1)[0]
        tg_path = os.path.join(phonemes_root, key.split("_")[0],
                               key + ".TextGrid")
        if not os.path.isfile(tg_path):
            continue
        sil = leading_silence_duration(tg_path)
        trim_time = shift - (0 if start == 0 else start / sampling_rate)
        gaps.append(abs(sil - trim_time))
        files.append(wav)
        detected.append(sil)

    os.makedirs(out_dir, exist_ok=True)
    result = {
        "audio_filenames": files,
        "sil_duration_gaps": gaps,
        "detected_sil_durations": detected,
    }
    with open(os.path.join(out_dir, "sil_duration_gap_stats.pickle"),
              "wb") as f:
        pickle.dump(result, f)

    if plot and gaps:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 5))
        ax.hist(gaps, bins=40)
        ax.set_xlabel("|TextGrid sil - trim shifting_time| (s)")
        ax.set_ylabel("count")
        fig.savefig(os.path.join(out_dir, "sil_duration_gap_stats.png"),
                    bbox_inches="tight")
        plt.close(fig)

    if gaps:
        ConsoleLogger.success(
            f"{len(gaps)} utterances: mean gap {np.mean(gaps):.3f}s "
            f"max {np.max(gaps):.3f}s")
    return result


if __name__ == "__main__":
    features_root = sys.argv[1] if len(sys.argv) > 1 else "data/vctk/features"
    phonemes_root = (sys.argv[2] if len(sys.argv) > 2
                     else "data/vctk/raw/VCTK-Corpus/phonemes")
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "."
    compute_sil_duration_gap_stats(features_root, phonemes_root, out_dir)
