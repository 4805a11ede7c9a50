"""Where does the phone signal die: encoder latents or codebook assignment?

Follow-up to scripts/corpus_ari_ceiling.py (raw MFCC k-means(44) ARI is
0.27-0.52, trained codes score ~0.002): load a TRAINED flagship checkpoint
and score, against the same TextGrid labels at the latent time resolution,

  1. k-means(44) on the PRE-VQ encoder latents z  (does the encoder keep it?)
  2. the model's actual per-frame code stream, REFERENCE SEMANTICS: the
     reference quantizes a (C, T, B)-order flatten whose rows are NOT
     per-frame vectors (reference vector_quantizer.py:88-93; PARITY — see
     ops/vq.py:reference_flatten) and then `view(batch, time, -1)`s the
     result back, so frame (b, t)'s "code" is the code of a scrambled row.
     This is exactly the stream the reference's own alignment statistics
     (and its committed headline scores) are computed from.
  3. the UN-scrambled per-frame assignment: argmin distance of each true
     frame vector z[b, t] to the trained codebook.  Separates how much of
     (2)'s weakness is the row-scrambling quirk vs the codebook itself.
  4. the eval-side codebook refit (eval/codebook_refit.py) of the same
     trained codebook to the latent cloud.

If (1) >> (2), the codebook assignment—not the encoder—discards the phone
structure; (3) vs (2) attributes that loss between the reference's flatten
quirk and the codebook's tessellation; (4) vs (3) is what one eval-side
k-means recovers on top.  If (1) is already at chance, the reconstruction
objective never put the signal in the latents.  CPU-only; reads an
existing quality_run_flagship root.

Usage: python scripts/latent_signal_diagnostic.py \
           [--root quality_run_flagship] [--seed 1234]
"""
import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np


def diagnose(root, seed, name="phonemes_flagship", force_cpu=True):
    """Returns the diagnostic dict for a trained checkpoint under ``root``;
    importable (scripts/quality_run_tpu.py embeds the refit scores in the
    flagship gate artifact)."""
    import jax
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import yaml
    from sklearn.metrics import (adjusted_rand_score,
                                 adjusted_mutual_info_score,
                                 normalized_mutual_info_score)
    from vqvae_speech_tpu.data.feature_store import (
        FeatureStore, load_normalizer)
    from vqvae_speech_tpu.eval.codebook_refit import collect_latents
    from vqvae_speech_tpu.models.vq import vector_quantizer_apply
    from vqvae_speech_tpu.train.checkpoint import (
        find_checkpoints, load_checkpoint)

    with open(os.path.join(root, "base.yaml")) as f:
        cfg = yaml.safe_load(f)
    exp = f"{name}-seed{str(seed)}"
    ckpts = find_checkpoints(os.path.join(root, "experiments"), exp)
    params, model_state = (lambda c: (c["params"], c["model_state"]))(
        load_checkpoint(ckpts[-1][1]))

    store = FeatureStore(os.path.join(root, "features"))
    norm = load_normalizer(os.path.join(root, "stats.pickle"))
    data = store.open("val")
    meta = store.metadata("val")
    wavs = meta.get("wav_filenames", [])
    feats = np.asarray(data["input_features"], np.float32)
    feats = ((feats - norm["train_mean"]) / norm["train_std"]).astype(
        np.float32)

    # labels at the latent resolution: latent step t covers input frames
    # [2t, 2t+1] (stride-2 encoder); frame f centers at (f*160+200)/rate,
    # so the latent's time center is the midpoint of the two frame centers,
    # 2t*160+280
    from vqvae_speech_tpu.data.textgrid import phoneme_marks
    tg_root = os.path.join(root, "raw", "VCTK-Corpus", "phonemes")

    def utt_marks(key):
        spk = key.split("_")[0]
        path = os.path.join(tg_root, spk, key + ".TextGrid")
        # real VCTK has utterances without phoneme alignments — skip them
        # like eval/alignment_stats.py does, don't crash the sweep
        return phoneme_marks(path) if os.path.isfile(path) else None

    zs, codes, labels = [], [], []
    B = 32
    # one encoder pass for the pre-VQ latents; indices come from quantizing
    # those same latents (the nearest-neighbor search IS the assignment)
    Z_all = collect_latents(params, model_state, feats, cfg, batch_size=B)
    for start in range(0, feats.shape[0], B):
        z = jnp.asarray(Z_all[start:start + B])
        out = vector_quantizer_apply(
            params["vq"], model_state["vq"], z,
            commitment_cost=cfg["commitment_cost"], decay=cfg["decay"],
            training=False)
        # reference semantics: indices come back in the (C, T, B)-flatten
        # row order and are VIEWED as (B, T) — frame (i, t) gets the code
        # of a scrambled row, exactly as the reference's evaluator does
        idx = np.asarray(out.indices).reshape(z.shape[0], -1)
        for i in range(z.shape[0]):
            gi = start + i
            key = (os.path.basename(wavs[gi]).rsplit(".", 1)[0]
                   if gi < len(wavs) else None)
            if key is None:
                continue
            marks = utt_marks(key)
            if marks is None:
                continue
            Tl = z.shape[1]
            for t in range(Tl):
                center = (2 * t * 160 + 280) / cfg["sampling_rate"]
                lab = None
                for a, b, ph in marks:
                    if a <= center < b:
                        lab = ph
                        break
                if lab is None:
                    continue
                zs.append(Z_all[gi, t])
                codes.append(int(idx[i, t]))
                labels.append(lab)

    Z = np.stack(zs)
    truth = np.asarray([hash(l) % (1 << 30) for l in labels])
    codes = np.asarray(codes)

    from vqvae_speech_tpu.eval.codebook_refit import lloyd_kmeans as kmeans

    def score(a):
        return {"ari": round(float(adjusted_rand_score(truth, a)), 5),
                "ami": round(float(adjusted_mutual_info_score(truth, a)), 5),
                "nmi": round(float(
                    normalized_mutual_info_score(truth, a)), 5)}

    K = cfg["num_embeddings"]
    Zn = (Z - Z.mean(0)) / (Z.std(0) + 1e-8)

    # the trained codebook lives in params for the gradient variant and in
    # model_state for the EMA variant (models/vq.py, reference
    # vector_quantizer_ema.py)
    trained_codebook = np.asarray(
        model_state["vq"]["codebook"] if cfg["decay"] > 0
        else params["vq"]["codebook"])

    # UN-scrambled baseline: nearest trained code of each TRUE frame vector
    # (vs `codes`, which carries the reference's (C,T,B)-flatten pairing)
    from vqvae_speech_tpu.eval.codebook_refit import _sqdist, kmeans_refit
    perframe_assign = np.argmin(_sqdist(Z.astype(np.float64),
                                        trained_codebook.astype(np.float64)),
                                axis=1)

    # eval-side codebook refit (X extension, eval/codebook_refit.py):
    # k-means over the RAW latents initialized at the trained codebook
    _, refit_assign = kmeans_refit(trained_codebook, Z)

    res = {
        "frames": int(len(Z)),
        "n_label_classes": int(len(set(labels))),
        "codebook_assignment": score(codes),
        "codebook_assignment_per_frame": score(perframe_assign),
        "codebook_refit_assignment": score(refit_assign),
        "kmeans_on_prevq_latents": {
            str(s): score(kmeans(Zn, K, s)) for s in (0, 1, 2)},
        "effective_codes_used": int(len(set(codes.tolist()))),
        "effective_codes_per_frame": int(
            len(set(perframe_assign.tolist()))),
        "effective_codes_after_refit": int(len(set(refit_assign.tolist()))),
        # usage fractions per code, sorted descending — the dilution
        # diagnostic for cross-scale comparison (VERDICT r4 #2): more data
        # spreading assignments over more codes shows up as a flatter head
        "code_usage_histogram": [
            round(float(c) / max(len(codes), 1), 4) for c in sorted(
                np.bincount(codes, minlength=K).tolist(), reverse=True)],
    }
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="quality_run_flagship")
    ap.add_argument("--seed", default="1234")
    ap.add_argument("--name", default="phonemes_flagship")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    res = diagnose(args.root, args.seed, args.name)
    print(json.dumps(res, indent=1))
    out = args.out or os.path.join(
        args.root, f"latent_diagnostic_seed{args.seed}.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
