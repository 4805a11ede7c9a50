"""Measure the ARI *ceiling* of the synthetic corpora, model-free.

If k-means with K=44 on the raw (normalized) MFCC frames cannot score ARI
above chance against the phoneme groundtruth, no VQ model evaluated through
the same alignment pipeline can either — the corpus structure, not the
model, is the binding constraint.  This quantifies the round-3 hypothesis
that 44 codes against a 12-phone inventory is ARI-hostile by construction
(each phone is split ~4 ways; ARI punishes splits) while the 37-phone
inventory is shape-matched to the reference's real task (44 codes vs the
~40-phone VCTK inventory).

Usage: python scripts/corpus_ari_ceiling.py [--out corpus_ari_ceiling.json]
Writes per-corpus k-means(44) ARI/AMI/NMI.  CPU-only.
"""
import argparse
import json
import os
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np


def corpus_frames(builder, root, **kw):
    """MFCC frames + phone labels via the same TextGrid contract the
    alignment pipeline uses (tests/test_quality_signal.py)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy.io import wavfile
    from vqvae_speech_tpu.data.textgrid import phoneme_marks
    from vqvae_speech_tpu.ops import mfcc

    dset, phonemes = builder(root, **kw)
    feats, labels = [], []
    for spk in sorted(os.listdir(os.path.join(dset, "wav48"))):
        for w in sorted(os.listdir(os.path.join(dset, "wav48", spk))):
            key = w[:-4]
            rate, x = wavfile.read(os.path.join(dset, "wav48", spk, w))
            x = x.astype(np.float32) / 32767.0
            m = np.asarray(mfcc(jnp.asarray(x, jnp.float64)))
            marks = phoneme_marks(os.path.join(dset, "phonemes", spk,
                                                key + ".TextGrid"))
            for t in range(m.shape[0]):
                center = (t * 160 + 200) / rate
                for a, b, ph in marks:
                    if a <= center < b:
                        feats.append(m[t])
                        labels.append(ph)
                        break
    F = np.stack(feats)
    F = (F - F.mean(0)) / (F.std(0) + 1e-8)
    return F, labels, len(phonemes)


# shared Lloyd implementation (same update rule this script originally
# inlined; expanded-norm distances instead of the (M,k,D) broadcast)
from vqvae_speech_tpu.eval.codebook_refit import lloyd_kmeans as kmeans


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="corpus_ari_ceiling.json")
    ap.add_argument("--k", type=int, default=44)
    ap.add_argument("--speakers", type=int, default=4)
    ap.add_argument("--utts", type=int, default=20)
    args = ap.parse_args()

    from sklearn.metrics import (adjusted_rand_score,
                                 adjusted_mutual_info_score,
                                 normalized_mutual_info_score)
    from vqvae_speech_tpu.data.synthetic_phonemes import (
        build_phoneme_corpus, build_rich_phoneme_corpus)

    results = {}
    for name, builder in (("flat_5phone", build_phoneme_corpus),
                          ("rich_37phone", build_rich_phoneme_corpus)):
        with tempfile.TemporaryDirectory() as d:
            F, labels, n_ph = corpus_frames(
                builder, d, num_speakers=args.speakers,
                utts_per_speaker=args.utts, utt_seconds=0.6)
        truth = np.asarray([hash(l) % (1 << 30) for l in labels])
        per_seed = []
        for seed in (0, 1, 2):
            a = kmeans(F, args.k, seed)
            per_seed.append({
                "ari": round(float(adjusted_rand_score(truth, a)), 5),
                "ami": round(float(
                    adjusted_mutual_info_score(truth, a)), 5),
                "nmi": round(float(
                    normalized_mutual_info_score(truth, a)), 5),
            })
        med = {m: float(np.median([s[m] for s in per_seed]))
               for m in ("ari", "ami", "nmi")}
        results[name] = {"n_phones": n_ph, "frames": int(len(F)),
                         "k": args.k, "seeds": per_seed, "median": med}
        print(json.dumps({name: results[name]["median"],
                          "n_phones": n_ph}), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
