"""WaveNetVQVAE trainer integration test (tiny config, synthetic store)."""
import json
import os

import numpy as np
import pytest
import yaml

from vqvae_speech_tpu.data.synthetic import build_synthetic_store
from vqvae_speech_tpu.train import Experiments
from vqvae_speech_tpu.train.checkpoint import find_checkpoints, load_checkpoint
from tests.test_training import TINY_CFG


@pytest.mark.slow
def test_wavenet_trainer_end_to_end(tmp_path):
    root = str(tmp_path)
    store_root = os.path.join(root, "features")
    build_synthetic_store(store_root, num_train=4, num_val=2, length=1920)

    cfg = dict(TINY_CFG)
    cfg.update(
        decoder_type="wavenet",
        normalize=False,
        num_epochs=1,
        batch_size=2,
        length=1920,
        input_features_dim=11,  # 1920 samples -> 11 frames
        output_features_dim=11,
        quantize=32,
        num_hiddens=16,
        embedding_dim=8,
        num_embeddings=7,
        residual_channels=8,
        n_loop=2,
        n_layers=4,
        filter_size=2,
        gate_channels=8,
        skip_out_channels=8,
        global_condition_dim=6,
        local_condition_dim=16,
        num_speakers=4,
    )
    cfg_path = os.path.join(root, "wn.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    spec = {
        "experiments_path": os.path.join(root, "experiments"),
        "results_path": os.path.join(root, "results"),
        "configuration_path": cfg_path,
        "seed": 7,
        "experiments": {"wn": {}},
    }
    spec_path = os.path.join(root, "exp.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f)

    exps = Experiments.load(spec_path, data_root=store_root)
    exps.train()

    ckpts = find_checkpoints(os.path.join(root, "experiments"), "wn")
    assert [e for e, _ in ckpts] == [1]
    ckpt = load_checkpoint(ckpts[0][1])
    losses = ckpt["train_res_recon_error"]
    assert len(losses) == 2  # 4 utterances / batch 2
    assert all(np.isfinite(l["loss"]) for l in losses)
    assert all(np.isfinite(l["reconstruction_loss"]) for l in losses)
    # cross-entropy on 32 classes starts near log(32) ~ 3.47
    assert losses[0]["reconstruction_loss"] < 8.0
