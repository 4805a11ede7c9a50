"""Seed x jitter sweep of the quality gate config on hardware.

Exports the synthetic phoneme corpus once, then trains/evaluates each
(seed, jitter) cell, printing one JSON line per cell.  Used to pick a
robust gate configuration for scripts/quality_run_tpu.py (the reference's
own sweeps show ARI is seed/hyperparameter sensitive: 0.051/0.076/0.067
across seeds for jitter12, BASELINE.md).
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
from scripts.quality_run_tpu import BASE_CFG, PINNED


def main(root="/tmp/qsweep"):
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    from vqvae_speech_tpu.train import Experiments

    os.makedirs(root, exist_ok=True)
    build_phoneme_corpus(root, **PINNED["corpus"])
    vctk = VCTK(root, ratio=PINNED["ratio"], shuffle_seed=0)
    cfg = dict(BASE_CFG)
    cfg.update(PINNED["overrides"])
    cfg["data_root"] = root
    cfg["normalizer_path"] = os.path.join(root, "stats.pickle")
    store_root = os.path.join(root, "features")
    export_to_features(vctk, store_root, cfg, num_workers=8)
    compute_dataset_stats(FeatureStore(store_root), cfg["normalizer_path"])

    results = []
    for jitter in (False, True):
        for seed in (1234, 5678, 4242):
            name = f"q_j{int(jitter)}_s{seed}"
            sub = os.path.join(root, name)
            c = dict(cfg)
            c["use_jitter"] = jitter
            cfg_path = os.path.join(sub, "base.yaml")
            os.makedirs(sub, exist_ok=True)
            with open(cfg_path, "w") as f:
                yaml.dump(c, f)
            spec = {
                "experiments_path": os.path.join(sub, "experiments"),
                "results_path": os.path.join(sub, "results"),
                "configuration_path": cfg_path,
                "seed": seed,
                "experiments": {name: {}},
            }
            spec_path = os.path.join(sub, "experiments.json")
            with open(spec_path, "w") as f:
                json.dump(spec, f)
            t0 = time.time()
            exps = Experiments.load(spec_path, data_root=store_root)
            exps.train()
            r = exps.evaluate({
                "compute_alignments": True,
                "compute_clustering_metrics": True,
                "alignment_subset": "val",
            })[name]
            row = {"jitter": jitter, "seed": seed,
                   "wall_s": round(time.time() - t0, 1),
                   **{k: round(float(v), 5)
                      for k, v in r["clustering_metrics"].items()}}
            results.append(row)
            print(json.dumps(row), flush=True)
    with open(os.path.join(root, "sweep.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
