"""Quality run on hardware: synthetic phoneme corpus at larger scale.

Builds a 400-utterance corpus with known phoneme structure (TextGrids),
exports, trains, and computes the full alignment + clustering-metric
pipeline.  Produces quality_run/summary.json.

NOTE on expectations: VQ-code/phoneme alignment is extremely sensitive to
width/batch/LR — the reference's OWN published sweeps show the same
(ARI 0.034 at batch 2 collapsing to 0.008 at batch 64, BASELINE.md).  The
hyperparameters below reproduce a positive signal at small width
(tests/test_quality_signal.py pins a deterministic configuration); larger
widths readily collapse to few codes, faithfully to the reference's
quantizer design (no dead-code revival — see models/vq_balanced.py /
models/vq_adaptive.py for the revival variants).
"""
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np
import yaml

from vqvae_speech_tpu.data.synthetic_phonemes import build_phoneme_corpus
from vqvae_speech_tpu.data.vctk import VCTK
from vqvae_speech_tpu.data.export import export_to_features
from vqvae_speech_tpu.data.feature_store import FeatureStore, compute_dataset_stats
from vqvae_speech_tpu.train import Experiments


def main(root="quality_run", epochs=40):
    os.makedirs(root, exist_ok=True)
    t0 = time.time()
    build_phoneme_corpus(root, num_speakers=8, utts_per_speaker=50,
                         utt_seconds=0.6)
    vctk = VCTK(root, ratio=0.9, shuffle_seed=0)

    cfg = dict(
        decoder_type="deconvolutional", trainer_type="convolutional",
        verbose=False, batch_size=16, data_root=root, start_epoch=0,
        num_epochs=epochs, num_workers=8, train_val_split=0.9,
        learning_rate=1e-3, normalize=True,
        normalizer_path=os.path.join(root, "stats.pickle"),
        use_speaker_conditioning=False, record_codebook_stats=False,
        record_gradient_stats=False, features_path="features",
        export_one_hot_features=False, use_cuda=False,
        use_data_parallel=False, use_device=None, sampling_rate=16000,
        res_type="kaiser_fast", top_db=20, length=7680, quantize=256,
        num_hiddens=256, input_dim=256, num_embeddings=8, embedding_dim=64,
        commitment_cost=0.25, decay=0.0, residual_channels=256,
        num_residual_layers=2, input_features_type="mfcc",
        output_features_type="mfcc", input_features_dim=47,
        input_features_filters=13, output_features_dim=47,
        output_features_filters=13, augment_input_features=True,
        augment_output_features=True, use_kaiming_normal=False,
        jitter_probability=0.12, use_jitter=False,
    )
    store_root = os.path.join(root, "features")
    export_to_features(vctk, store_root, cfg, num_workers=8)
    compute_dataset_stats(FeatureStore(store_root), cfg["normalizer_path"])

    cfg_path = os.path.join(root, "base.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    spec = {
        "experiments_path": os.path.join(root, "experiments"),
        "results_path": os.path.join(root, "results"),
        "configuration_path": cfg_path,
        "seed": 1234,
        "experiments": {"phonemes": {}},
    }
    spec_path = os.path.join(root, "experiments.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f)

    exps = Experiments.load(spec_path, data_root=store_root)
    exps.train()
    results = exps.evaluate({
        "compute_alignments": True,
        "compute_clustering_metrics": True,
        "alignment_subset": "val",
    })["phonemes"]
    summary = {
        "wall_s": round(time.time() - t0, 1),
        "scores": {k: float(v)
                   for k, v in results["clustering_metrics"].items()},
    }
    with open(os.path.join(root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
