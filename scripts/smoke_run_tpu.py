"""Full-scale smoke run on real hardware: flagship vq44-mfcc39 model on a
synthetic corpus — export -> stats -> train -> evaluate -> plots.

Produces results under ``smoke_results/`` (losses/perplexity curves,
comparison plot, embedding-space projection, empirical alignments, bigrams,
encoding frequencies) plus a summary JSON.  This validates the end-to-end
system at production model size on the TPU; quality-metric reproduction
against BASELINE.md requires the real VCTK corpus.
"""
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np
import yaml

from vqvae_speech_tpu.data.synthetic import build_synthetic_store
from vqvae_speech_tpu.data import FeatureStore, compute_dataset_stats
from vqvae_speech_tpu.train import Experiments
from vqvae_speech_tpu.train.checkpoint import merge_checkpoint_losses
from vqvae_speech_tpu.utils.profiling import StepTimer


def main(root="smoke_run", epochs=8, num_train=200, num_val=24):
    os.makedirs(root, exist_ok=True)
    store_root = os.path.join(root, "features")
    t0 = time.time()
    build_synthetic_store(store_root, num_train=num_train, num_val=num_val)
    normalizer_path = os.path.join(root, "stats.pickle")
    compute_dataset_stats(FeatureStore(store_root), normalizer_path)

    cfg = dict(
        decoder_type="deconvolutional", trainer_type="convolutional",
        verbose=False, batch_size=8, data_root=root, start_epoch=0,
        num_epochs=epochs, num_workers=1, train_val_split=0.8,
        learning_rate=2e-4, normalize=True, normalizer_path=normalizer_path,
        use_speaker_conditioning=False, record_codebook_stats=True,
        record_gradient_stats=False, features_path="features",
        export_one_hot_features=False, use_cuda=False,
        use_data_parallel=False, use_device=None, sampling_rate=16000,
        res_type="kaiser_fast", top_db=20, length=7680, quantize=256,
        num_hiddens=768, input_dim=256, num_embeddings=44, embedding_dim=64,
        commitment_cost=0.25, decay=0.99, residual_channels=768,
        num_residual_layers=2, input_features_type="mfcc",
        output_features_type="mfcc", input_features_dim=47,
        input_features_filters=13, output_features_dim=47,
        output_features_filters=13, augment_input_features=True,
        augment_output_features=True, use_kaiming_normal=False,
        jitter_probability=0.12, use_jitter=False,
    )
    cfg_path = os.path.join(root, "base.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    spec = {
        "experiments_path": os.path.join(root, "experiments"),
        "results_path": os.path.join(root, "results"),
        "configuration_path": cfg_path,
        "seed": 1234,
        "experiments": {
            "baseline": {},
            "jitter12": {"use_jitter": True, "jitter_probability": 0.12},
        },
    }
    spec_path = os.path.join(root, "experiments.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f)

    exps = Experiments.load(spec_path, data_root=store_root)
    t_train0 = time.time()
    exps.train()
    train_s = time.time() - t_train0

    exps = Experiments.load(spec_path, data_root=store_root)  # resume-load
    eval_results = exps.evaluate({
        "plot_comparaison_plot": True,
        "plot_quantized_embedding_spaces": True,
        "plot_distances_histogram": True,
        "compute_alignments": True,
        "alignment_subset": "val",
        "compute_entropy_distributions": True,
    })

    summary = {"train_wall_s": round(train_s, 1),
               "total_wall_s": round(time.time() - t0, 1),
               "experiments": {}}
    for exp in exps.experiments:
        losses, perps = merge_checkpoint_losses(
            os.path.join(root, "experiments"), exp.name)
        summary["experiments"][exp.name] = {
            "steps": len(losses),
            "first_loss": round(losses[0]["loss"], 4),
            "final_loss": round(losses[-1]["loss"], 4),
            "final_reconstruction_loss":
                round(losses[-1]["reconstruction_loss"], 4),
            "final_perplexity": round(perps[-1], 2),
        }
    from vqvae_speech_tpu.eval.losses_plotter import plot_training_losses

    plot_training_losses(exps.experiments, os.path.join(root, "experiments"))
    with open(os.path.join(root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["smoke_run"]))
