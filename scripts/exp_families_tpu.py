"""Run the reference's remaining experiment families end-to-end on hardware.

VERDICT round-2 item #4: the lengths config (crop 30720 -> 191 frames,
/root/reference/configurations/experiments_vq44-mfcc39-lengths.json:6-8)
and the batch_sizes sweep (2 -> 64, experiments_vq44-mfcc39-batch_sizes
.json) through the REAL driver (Experiments.load -> train -> evaluate ->
alignment artifacts), at the reference's flagship model scale (768 hiddens,
44 codes), confirming no compile pathology at T=191 and reproducing the
reference's qualitative quality-vs-batch trend.

Corpus: the rich (full-rank) synthetic phoneme corpus with TextGrids, so
the clustering gate is meaningful.

Round 3 extends the sweep to the reference's two remaining families:
codebook_sizes (experiments_mfcc39-codebook_sizes.json: 10 -> 1000 codes,
batch 2, 15 epochs) and seeds (experiments_vq44-mfcc39-seeds.json:
baseline + jitter12 x seeds [1234, 5678, 4242], 10 epochs) — with those,
every experiment family the reference ships runs end-to-end here.

Usage:
  python scripts/exp_families_tpu.py lengths        [--root exp_lengths]
  python scripts/exp_families_tpu.py batch_sizes    [--root exp_batch_sizes]
  python scripts/exp_families_tpu.py codebook_sizes [--root exp_codebook_sizes]
  python scripts/exp_families_tpu.py seeds          [--root exp_seeds]
"""
import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))

import numpy as np
import yaml

from vqvae_speech_tpu.data.synthetic_phonemes import build_rich_phoneme_corpus
from vqvae_speech_tpu.data.vctk import VCTK
from vqvae_speech_tpu.data.export import export_to_features
from vqvae_speech_tpu.data.feature_store import (
    FeatureStore, compute_dataset_stats)
from quality_run_tpu import BASE_CFG  # shared reference-parity base config

FLAGSHIP_OVERRIDES = dict(
    num_hiddens=768, residual_channels=768, embedding_dim=64,
    num_embeddings=44, learning_rate=2e-4, num_workers=8)

FAMILIES = {
    # reference experiments_vq44-mfcc39-lengths.json: crop 30720 -> 191
    # frames; baseline + jitter12, 25 epochs, batch 16, seed 1234
    "lengths": dict(
        corpus=dict(num_speakers=8, utts_per_speaker=30, utt_seconds=2.2),
        ratio=0.9,
        cfg=dict(length=30720, input_features_dim=191,
                 output_features_dim=191),
        experiments={
            "baseline-30720": dict(num_epochs=25, batch_size=16,
                                   normalize=True),
            "jitter12-30720": dict(num_epochs=25, batch_size=16,
                                   normalize=True, use_jitter=True,
                                   jitter_probability=0.12),
        },
    ),
    # reference experiments_vq44-mfcc39-batch_sizes.json: 15 epochs each
    "batch_sizes": dict(
        corpus=dict(num_speakers=8, utts_per_speaker=50, utt_seconds=0.6),
        ratio=0.9,
        cfg={},
        experiments={
            f"baseline-{b}": dict(num_epochs=15, batch_size=b,
                                  normalize=True)
            for b in (2, 16, 32, 64)
        },
    ),
    # reference experiments_mfcc39-codebook_sizes.json: codebook sweep
    # 10 -> 1000 codes, batch 2, 15 epochs, seed 1234.  The >100-code rows
    # additionally exercise the evaluator's skip-empirical-bigram semantics
    # (reference alignment_stats.py:345-347) at driver scale.
    "codebook_sizes": dict(
        corpus=dict(num_speakers=8, utts_per_speaker=50, utt_seconds=0.6),
        ratio=0.9,
        cfg={},
        experiments={
            f"baseline-{k}": dict(num_epochs=15, batch_size=2,
                                  num_embeddings=k, normalize=True)
            for k in (10, 44, 100, 500, 1000)
        },
        # the reference's evolution-across-codebook-sizes aggregation
        # (alignment_stats.py:499-565)
        eval_options=dict(plot_clustering_metrics_evolution=True),
    ),
    # reference experiments_vq44-mfcc39-seeds.json: baseline + jitter12 at
    # 10 epochs, batch 2, seeds [1234, 5678, 4242].  The flagship quality
    # gates already cover jitter12 x 3 seeds at 15 epochs; this family runs
    # the reference's exact two-experiment x three-seed fanout through the
    # driver (Experiments.load handles the seed-list fanout).
    "seeds": dict(
        corpus=dict(num_speakers=8, utts_per_speaker=50, utt_seconds=0.6),
        ratio=0.9,
        cfg={},
        seed_list=[1234, 5678, 4242],
        experiments={
            "baseline": dict(num_epochs=10, batch_size=2, normalize=True),
            "jitter12": dict(num_epochs=10, batch_size=2, normalize=True,
                             use_jitter=True, jitter_probability=0.12),
        },
        # the reference's seed-stability aggregation
        # (alignment_stats.py:567-673)
        eval_options=dict(
            check_clustering_metrics_stability_over_seeds=True),
    ),
}


def run_names_for(spec: dict, default_seed: int):
    """Final experiment run names: a seed_list family fans out
    ``{name}-seed{seed}`` exactly like the driver (train/experiment.py:183-194)."""
    seed_spec = spec.get("seed_list", default_seed)
    if isinstance(seed_spec, list):
        return seed_spec, [f"{n}-seed{s}" for n in spec["experiments"]
                           for s in seed_spec]
    return seed_spec, list(spec["experiments"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=list(FAMILIES))
    ap.add_argument("--root", default=None)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--force-cpu", action="store_true",
                    help="run on the host CPU backend (fallback when the "
                         "chip tunnel is down; the artifact records its "
                         "platform either way)")
    args = ap.parse_args()
    spec = FAMILIES[args.family]
    root = args.root or f"exp_{args.family}"

    import jax
    if args.force_cpu:
        # the axon plugin overrides JAX_PLATFORMS; the config update is
        # what actually forces CPU (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    from vqvae_speech_tpu.train import Experiments

    os.makedirs(root, exist_ok=True)
    # clean room: stale corpora/checkpoints from an interrupted or
    # differently-configured run must not leak in
    from vqvae_speech_tpu.utils.workspace import clean_room
    clean_room(root)
    t0 = time.time()
    build_rich_phoneme_corpus(root, **spec["corpus"])
    vctk = VCTK(root, ratio=spec["ratio"], shuffle_seed=0)

    cfg = dict(BASE_CFG)
    cfg.update(FLAGSHIP_OVERRIDES)
    cfg.update(spec["cfg"])
    cfg["data_root"] = root
    cfg["normalizer_path"] = os.path.join(root, "stats.pickle")
    store_root = os.path.join(root, "features")
    export_to_features(vctk, store_root, cfg, num_workers=8)
    compute_dataset_stats(FeatureStore(store_root), cfg["normalizer_path"])

    cfg_path = os.path.join(root, "base.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    seed_spec, run_names = run_names_for(spec, args.seed)
    spec_json = {
        "experiments_path": os.path.join(root, "experiments"),
        "results_path": os.path.join(root, "results"),
        "configuration_path": cfg_path,
        "seed": seed_spec,
        "experiments": spec["experiments"],
    }
    spec_path = os.path.join(root, "experiments.json")
    with open(spec_path, "w") as f:
        json.dump(spec_json, f, indent=2)

    exps = Experiments.load(spec_path, data_root=store_root)
    exps.train()
    eval_options = {
        "compute_alignments": True,
        "compute_clustering_metrics": True,
        "alignment_subset": "val",
    }
    eval_options.update(spec.get("eval_options", {}))
    results = exps.evaluate(eval_options)

    from vqvae_speech_tpu.train.checkpoint import (
        find_checkpoints, load_checkpoint)
    summary = {"family": args.family, "seed": seed_spec,
               "platform": jax.default_backend(),
               "corpus": spec["corpus"], "experiments": {}}
    for name in run_names:
        ckpts = find_checkpoints(spec_json["experiments_path"], name)
        last = load_checkpoint(ckpts[-1][1])
        summary["experiments"][name] = {
            "scores": {k: round(float(v), 5)
                       for k, v in results[name]["clustering_metrics"]
                       .items()},
            "final_perplexity": round(float(np.asarray(
                last["train_res_perplexity"][-1])), 3),
            "final_losses": {k: round(float(np.asarray(v)), 4)
                             for k, v in
                             last["train_res_recon_error"][-1].items()},
        }
        print(json.dumps({name: summary["experiments"][name]}), flush=True)
    for agg in ("clustering_metrics_evolution", "clustering_metrics_stability"):
        if agg in results:
            summary[agg] = results[agg]
    summary["wall_s"] = round(time.time() - t0, 1)
    with open(os.path.join(root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
