"""Evaluation-suite integration tests: alignments, bigrams, clustering
metrics, plots, pairwise distances — on a synthetic mini-corpus with
TextGrids, exercising the same call paths as --evaluate."""
import json
import os
import pickle

import numpy as np
import pytest
import yaml

from vqvae_speech_tpu.train import Experiments
from tests.test_training import TINY_CFG
from tests.test_ingest import _mini_corpus, TEXTGRID
from vqvae_speech_tpu.data.vctk import VCTK
from vqvae_speech_tpu.data.export import export_to_features
from vqvae_speech_tpu.data.feature_store import FeatureStore, compute_dataset_stats


def _full_setup(tmp_path):
    """Mini corpus -> export -> stats -> 1-epoch training -> Experiments."""
    root = str(tmp_path)
    _mini_corpus(root)
    vctk = VCTK(root, ratio=0.8, shuffle_seed=0)
    cfg = dict(TINY_CFG)
    cfg.update(num_epochs=1, batch_size=2, data_root=root,
               record_codebook_stats=True, record_gradient_stats=True)
    store_root = os.path.join(root, "features")
    export_to_features(vctk, store_root, cfg, num_workers=2)
    normalizer_path = os.path.join(root, "stats.pickle")
    compute_dataset_stats(FeatureStore(store_root), normalizer_path)
    cfg["normalizer_path"] = normalizer_path

    cfg_path = os.path.join(root, "base.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    spec = {
        "experiments_path": os.path.join(root, "experiments"),
        "results_path": os.path.join(root, "results"),
        "configuration_path": cfg_path,
        "seed": 1234,
        "experiments": {"ev": {}},
    }
    spec_path = os.path.join(root, "experiments.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    exps = Experiments.load(spec_path, data_root=store_root)
    exps.train()
    return root, exps, store_root


@pytest.mark.slow
def test_full_evaluation_pipeline(tmp_path):
    root, exps, store_root = _full_setup(tmp_path)
    results = exps.evaluate({
        "plot_comparaison_plot": True,
        "plot_quantized_embedding_spaces": True,
        "plot_distances_histogram": True,
        "compute_many_to_one_mapping": True,
        "compute_alignments": True,
        "alignment_subset": "val",
        "compute_clustering_metrics": True,
        "per_frame_alignments": True,
        "compute_groundtruth_average_phonemes_number": True,
        "plot_gradient_stats": True,
        "compute_quantized_embedding_spaces_animation": True,
    })["ev"]

    rp = os.path.join(root, "results")
    # plots exist
    assert os.path.isfile(os.path.join(rp, "ev_evaluation-comparaison-plot.png"))
    assert os.path.isfile(os.path.join(rp, "ev_distances-histogram-plot.png"))
    assert os.path.isfile(os.path.join(rp, "ev_quantized-embedding-space.png"))
    assert os.path.isfile(os.path.join(rp, "ev_gradient_flow.png"))
    assert os.path.isfile(os.path.join(rp, "ev_embedding_space_animation.gif"))

    # alignments + clustering metrics artifacts (reference filename contract)
    assert os.path.isfile(os.path.join(rp, "vctk_val_groundtruth_alignments.pickle"))
    assert os.path.isfile(os.path.join(rp, "ev_vctk_val_empirical_alignments.pickle"))
    assert os.path.isfile(os.path.join(rp, "ev_adjusted_rand_score.npy"))
    assert os.path.isfile(os.path.join(rp, "ev_adjusted_mutual_info_score.npy"))
    assert os.path.isfile(os.path.join(rp, "ev_normalized_mutual_info_score.npy"))
    ari = float(np.load(os.path.join(rp, "ev_adjusted_rand_score.npy")))
    assert -1.0 <= ari <= 1.0

    # many-to-one mapping pickles
    with open(os.path.join(rp, "ev_tokens_mapping.pickle"), "rb") as f:
        tokens_mapping = pickle.load(f)
    assert all(
        abs(sum(p for _, p in dist) - dist[0][1]) >= 0  # well-formed tuples
        for dist in tokens_mapping.values())

    # groundtruth alignment pickle structure + 20ms resampling length
    with open(os.path.join(rp, "vctk_val_groundtruth_alignments.pickle"), "rb") as f:
        gt = pickle.load(f)
    assert gt["desired_time_interval"] == 0.02
    data_length = TINY_CFG["length"] / TINY_CFG["sampling_rate"]
    for _, phon in gt["extended_alignment_dataset"]:
        assert len(phon) == int(data_length / 0.02)  # 24 frames @ 7680

    # empirical alignments: one 24-length code sequence per utterance
    with open(os.path.join(rp, "ev_vctk_val_empirical_alignments.pickle"), "rb") as f:
        emp = pickle.load(f)
    for _, seq in emp["all_alignments"]:
        assert len(seq) == 24
        assert all(0 <= s < TINY_CFG["num_embeddings"] for s in seq)

    # per-frame (corrected) view: same shape contract, _per_frame artifacts,
    # and its sequences genuinely differ from the scrambled parity pairing
    pf_pickle = os.path.join(
        rp, "ev_vctk_val_empirical_alignments_per_frame.pickle")
    assert os.path.isfile(pf_pickle)
    with open(pf_pickle, "rb") as f:
        emp_pf = pickle.load(f)
    assert len(emp_pf["all_alignments"]) == len(emp["all_alignments"])
    for _, seq in emp_pf["all_alignments"]:
        assert len(seq) == 24
        assert all(0 <= s < TINY_CFG["num_embeddings"] for s in seq)
    scrambled = np.concatenate([s for _, s in emp["all_alignments"]])
    perframe = np.concatenate([s for _, s in emp_pf["all_alignments"]])
    assert not np.array_equal(scrambled, perframe)
    for metric in ("adjusted_rand_score", "adjusted_mutual_info_score",
                   "normalized_mutual_info_score"):
        v = float(np.load(os.path.join(rp, f"ev_per_frame_{metric}.npy")))
        assert -1.0 <= v <= 1.0
    assert "clustering_metrics_per_frame" in results


def test_pairwise_matches_itertools_order():
    import itertools
    import jax.numpy as jnp
    from vqvae_speech_tpu.ops.pairwise import pdist, cdist

    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 5)).astype(np.float32)
    y = rng.standard_normal((4, 5)).astype(np.float32)
    got = np.asarray(pdist(jnp.asarray(x)))
    want = [np.linalg.norm(a - b)
            for a, b in itertools.combinations(x, r=2)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    got_c = np.asarray(cdist(jnp.asarray(x), jnp.asarray(y))).ravel()
    want_c = [np.linalg.norm(a - b) for a, b in itertools.product(x, y)]
    np.testing.assert_allclose(got_c, want_c, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_losses_plotter(tmp_path):
    root, exps, _ = _full_setup(tmp_path)
    from vqvae_speech_tpu.eval.losses_plotter import plot_training_losses

    plot_training_losses(exps.experiments, os.path.join(root, "experiments"))
    rp = os.path.join(root, "results")
    assert os.path.isfile(os.path.join(rp, "ev_losses-and-perplexities.png"))
    assert os.path.isfile(os.path.join(rp, "merged_loss.png"))
    # per-loss-type figure family (reference losses_plotter.py:228-261):
    # every recorded loss term except the total gets its own figure
    for loss_name in ("reconstruction_loss", "vq_loss", "commitment_loss"):
        assert os.path.isfile(os.path.join(rp, f"{loss_name}.png")), loss_name
    assert not os.path.isfile(os.path.join(rp, "loss.png"))


def test_clustering_metrics_evolution_and_stability(tmp_path):
    from vqvae_speech_tpu.eval.alignment_stats import (
        compute_clustering_metrics_evolution,
        check_clustering_metrics_stability_over_seeds)

    rp = str(tmp_path)
    names = ["a-seed1", "a-seed2", "b-seed1", "b-seed2"]
    for n in names:
        for m in ("adjusted_rand_score", "adjusted_mutual_info_score",
                  "normalized_mutual_info_score"):
            np.save(os.path.join(rp, f"{n}_{m}.npy"),
                    np.random.default_rng(0).uniform(0, 0.1))
    out1 = compute_clustering_metrics_evolution(names, rp)
    out2 = check_clustering_metrics_stability_over_seeds(names, rp)
    assert os.path.isfile(out1) and os.path.isfile(out2)


@pytest.mark.slow
def test_denormalization_and_speaker_entropy_options(tmp_path):
    root, exps, store_root = _full_setup(tmp_path)
    results = exps.evaluate({
        "test_denormalization": True,
        "compute_speaker_dependency_stats": True,
        "compute_entropy_distributions": True,
        "alignment_subset": "val",
    })["ev"]
    rp = os.path.join(root, "results")
    assert os.path.isfile(os.path.join(rp, "ev_test-denormalization-plot.png"))
    # the divergence plot needs >= 2 speakers in the split; the pickle is
    # always written
    assert os.path.isfile(os.path.join(
        rp, "ev_speaker_dependency_stats.pickle"))
    assert os.path.isfile(os.path.join(rp, "ev_entropy-stats-plot.png"))
