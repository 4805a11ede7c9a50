"""Compatibility tests against REAL reference artifacts (read-only data
mounted at /root/reference): the actual VCTK groundtruth-alignments pickle
and the published clustering-metric .npy files.

These prove our evaluation pipeline interoperates with artifacts produced by
the reference implementation — same pickle schema, same metric pipeline.
"""
import os
import pickle
import shutil

import numpy as np
import pytest

REF = "/root/reference"
GT_PICKLE = os.path.join(REF, "vctk_groundtruth_alignments.pickle")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(GT_PICKLE), reason="reference artifacts not mounted")


def test_reference_groundtruth_pickle_schema_matches_ours():
    with open(GT_PICKLE, "rb") as f:
        ref = pickle.load(f)
    # exactly the keys our compute_groundtruth_alignments writes
    assert set(ref.keys()) == {
        "desired_time_interval", "extended_alignment_dataset",
        "possible_phonemes", "phonemes_counter",
        "total_phonemes_apparations"}
    assert ref["desired_time_interval"] == 0.02
    # 24 frames per alignment = (7680/16000)/0.02, matching our resampler.
    # A few reference alignments are short (their resampler's fill-in edge
    # case); the clustering-metric stage filters those — both theirs
    # (alignment_stats.py:459-461) and ours.
    lengths = [len(a) for _, a in ref["extended_alignment_dataset"][:200]]
    assert lengths.count(24) >= 195


def test_our_analysis_consumes_reference_alignments(tmp_path):
    """Run our bigrams / avg-phonemes / clustering-metrics code directly on
    the reference's real alignments pickle."""
    from vqvae_speech_tpu.eval.alignment_stats import (
        compute_groundtruth_bigrams_matrix,
        compute_groundtruth_average_phonemes_number,
        compute_clustering_metrics)

    results = str(tmp_path)
    shutil.copy(GT_PICKLE,
                os.path.join(results, "vctk_val_groundtruth_alignments.pickle"))

    avg = compute_groundtruth_average_phonemes_number(results, "val")
    assert 1.0 < avg < 24.0

    mat = compute_groundtruth_bigrams_matrix(results, "val", plot=False)
    assert mat.shape == (41, 41)
    assert np.all(mat >= 0)
    # row-L1-normalized (rows with any mass sum to 1)
    sums = mat.sum(axis=1)
    assert np.all((np.abs(sums - 1.0) < 1e-9) | (sums == 0))

    # synthetic empirical alignments for the same utterance keys -> the full
    # clustering-metrics path runs on real groundtruth
    with open(GT_PICKLE, "rb") as f:
        ref = pickle.load(f)
    rng = np.random.default_rng(0)
    emp = {
        "all_alignments": [
            (key, rng.integers(0, 44, len(al)).tolist())
            for key, al in ref["extended_alignment_dataset"][:500]],
        "encodings_counter": {}, "desired_time_interval": 0.01,
        "total_indices_apparations": 500 * 24, "num_embeddings": 44,
    }
    with open(os.path.join(
            results, "x_vctk_val_empirical_alignments.pickle"), "wb") as f:
        pickle.dump(emp, f)
    cfg = {"length": 7680, "sampling_rate": 16000}
    scores = compute_clustering_metrics(results, "x", "val", cfg)
    # random assignments against real phonemes: ARI ~ 0
    assert abs(scores["adjusted_rand_score"]) < 0.01
    assert os.path.isfile(os.path.join(results, "x_adjusted_rand_score.npy"))


def test_baseline_md_numbers_match_shipped_npy_artifacts():
    """BASELINE.md's table is transcribed from the reference's committed
    .npy score files; verify the transcription."""
    base = os.path.join(REF, "results", "vq44-mfcc39", "val",
                        "alignment-stats")
    expectations = {
        ("baseline", "baseline_adjusted_rand_score.npy"): 0.034100,
        ("baseline", "baseline_adjusted_mutual_info_score.npy"): 0.022866,
        ("baseline", "baseline_normalized_mutual_info_score.npy"): 0.025384,
        ("jitter12", "jitter12_adjusted_rand_score.npy"): 0.047302,
    }
    for (sub, fname), want in expectations.items():
        path = os.path.join(base, sub, fname)
        if not os.path.isfile(path):
            pytest.skip(f"{path} missing from the mounted snapshot")
        got = float(np.load(path))
        assert abs(got - want) < 5e-6, (fname, got, want)
