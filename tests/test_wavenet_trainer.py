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


@pytest.mark.slow
def test_wavenet_trainer_revival_prune_history(tmp_path):
    """codebook_revival threads through the WaveNet trainer (the arm that
    rescues the AR-decoder posterior collapse observed live in
    wavenet_vqvae_e2e/reference_semantics_arm.json), prune_checkpoints
    bounds disk to first+last2, and the per-epoch history file carries the
    curves that pruning removes from merge_checkpoint_losses."""
    root = str(tmp_path)
    store_root = os.path.join(root, "features")
    build_synthetic_store(store_root, num_train=4, num_val=2, length=1920)

    cfg = dict(TINY_CFG)
    cfg.update(
        decoder_type="wavenet", normalize=False, num_epochs=4, batch_size=2,
        length=1920, input_features_dim=11, output_features_dim=11,
        quantize=32, num_hiddens=16, embedding_dim=8, num_embeddings=7,
        residual_channels=8, n_loop=2, n_layers=4, filter_size=2,
        gate_channels=8, skip_out_channels=8, global_condition_dim=6,
        local_condition_dim=16, num_speakers=4,
        codebook_revival=True, prune_checkpoints=True,
        compute_dtype="bfloat16",
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

    Experiments.load(spec_path, data_root=store_root).train()

    exp_dir = os.path.join(root, "experiments")
    ckpts = find_checkpoints(exp_dir, "wn")
    # prune keeps the first epoch plus the newest two
    assert [e for e, _ in ckpts] == [1, 3, 4]
    ckpt = load_checkpoint(ckpts[-1][1])
    # revival threads: usage state persisted, metric recorded per step
    assert "revival" in ckpt["model_state"]
    assert ckpt["model_state"]["revival"]["usage"].shape == (7,)
    assert all("revived_codes" in l for l in ckpt["train_res_recon_error"])
    # history file carries every epoch despite pruning
    with open(os.path.join(exp_dir, "wn_history.json")) as f:
        history = json.load(f)
    assert [h["epoch"] for h in history] == [1, 2, 3, 4]
    assert all(np.isfinite(h["loss"]) for h in history)


def test_prune_checkpoints_unit(tmp_path):
    from vqvae_speech_tpu.train.checkpoint import (
        prune_checkpoints, save_checkpoint)
    for epoch in range(6):  # saved as epochs 1..6
        save_checkpoint(str(tmp_path), "x", epoch, {"w": np.zeros(1)},
                        {}, {})
    prune_checkpoints(str(tmp_path), "x")
    assert [e for e, _ in find_checkpoints(str(tmp_path), "x")] == [1, 5, 6]
    # keeping fewer than exist is a no-op beyond the protected set
    prune_checkpoints(str(tmp_path), "x", keep_last=1, keep_first=False)
    assert [e for e, _ in find_checkpoints(str(tmp_path), "x")] == [6]


def test_ar_input_dropout_step():
    """``ar_input_dropout`` masks the teacher-forcing input (the anti-
    posterior-collapse lever: at reference decoder scale the AR context
    alone models a small corpus and the wrong-codes causality gap measures
    0.0 nats — wavenet_vqvae_e2e probe).  p>0 must change the loss on an
    identical state/batch, p=0 must be bit-identical to the knob-off
    trainer, and every metric stays finite."""
    import jax
    import optax
    from vqvae_speech_tpu.models.wavenet_vqvae import wavenet_vqvae_init
    from vqvae_speech_tpu.train.wavenet_trainer import (
        WaveNetTrainState, make_wavenet_train_step)

    cfg = dict(TINY_CFG)
    cfg.update(decoder_type="wavenet", length=512, quantize=16,
               input_features_dim=3, output_features_dim=3,
               num_hiddens=8, embedding_dim=8, num_embeddings=5,
               residual_channels=8, n_loop=1, n_layers=2, filter_size=2,
               gate_channels=8, skip_out_channels=8,
               global_condition_dim=4, local_condition_dim=8,
               num_speakers=2)
    key = jax.random.PRNGKey(0)
    params, model_state, wn_cfg = wavenet_vqvae_init(key, cfg, 2)
    opt = optax.amsgrad(1e-3)

    rng = np.random.default_rng(0)
    B = 2
    batch = {
        "preprocessed_audio": np.tanh(rng.standard_normal(
            (B, cfg["length"] + 1))).astype(np.float32),
        "input_features": rng.standard_normal(
            (B, cfg["length"] // 160 + 1, 39)).astype(np.float32),
        "speaker_id": np.zeros((B,), np.int32),
    }

    def run(c):
        step = make_wavenet_train_step(c, wn_cfg, opt)
        state = WaveNetTrainState(params, model_state,
                                  opt.init(params), key)
        _, metrics = step(state, batch)
        return {k: float(v) for k, v in metrics.items()}

    m_off = run(cfg)
    m_zero = run(dict(cfg, ar_input_dropout=0.0))
    m_drop = run(dict(cfg, ar_input_dropout=0.5))
    assert m_zero["loss"] == m_off["loss"]           # p=0 is the off path
    assert m_drop["loss"] != m_off["loss"]           # the mask is real
    assert all(np.isfinite(v) for v in m_drop.values())
