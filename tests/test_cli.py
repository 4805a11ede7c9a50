"""CLI smoke tests: main.py modes and flag surface."""
import json
import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vqvae_speech_tpu.main import main, build_parser
from tests.test_training import TINY_CFG, _setup


def test_parser_has_reference_flag_surface():
    p = build_parser()
    # every reference src/main.py:68-88 flag exists
    args = p.parse_args([
        "--evaluate", "--plot_comparaison_plot",
        "--plot_quantized_embedding_spaces",
        "--compute_quantized_embedding_spaces_animation",
        "--plot_distances_histogram", "--compute_many_to_one_mapping",
        "--compute_alignments", "--alignment_subset", "train",
        "--compute_clustering_metrics",
        "--compute_groundtruth_average_phonemes_number",
        "--plot_clustering_metrics_evolution",
        "--check_clustering_metrics_stability_over_seeds",
        "--plot_gradient_stats", "--export_to_features",
        "--compute_dataset_stats", "--plot_experiments_losses",
    ])
    assert args.alignment_subset == "train"


def test_summary_mode(tmp_path, capsys):
    cfg = dict(TINY_CFG)
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    assert main(["--summary", cfg_path]) == 0
    out = capsys.readouterr().out
    assert "pre_vq_conv" in out and "codebook" in out


@pytest.mark.slow
def test_default_mode_trains(tmp_path, monkeypatch):
    root, spec_path, store_root = _setup(tmp_path)
    # data_root in the frozen config points at tmp store
    with open(spec_path) as f:
        spec = json.load(f)
    base_cfg_path = spec["configuration_path"]
    with open(base_cfg_path) as f:
        cfg = yaml.load(f, yaml.FullLoader)
    cfg["data_root"] = root          # features live at <root>/features
    with open(base_cfg_path, "w") as f:
        yaml.dump(cfg, f)

    assert main(["--experiments_configuration_path", spec_path]) == 0
    exp_dir = os.path.join(root, "experiments")
    assert any(f.endswith("_checkpoint.pkl") for f in os.listdir(exp_dir))


@pytest.mark.slow
def test_plot_experiments_losses_mode(tmp_path):
    root, spec_path, store_root = _setup(tmp_path)
    from vqvae_speech_tpu.train import Experiments

    Experiments.load(spec_path, data_root=store_root).train()
    assert main(["--plot_experiments_losses",
                 "--experiments_configuration_path", spec_path,
                 "--experiments_path", os.path.join(root, "experiments")]) == 0
    assert os.path.isfile(os.path.join(root, "results",
                                       "tiny_losses-and-perplexities.png"))
