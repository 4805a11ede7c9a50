"""End-to-end training integration tests on synthetic data.

Covers: experiments-JSON driver, config freeze, train loop, loss descent,
per-epoch checkpointing, auto-resume, and 8-device data-parallel sharding on
the virtual CPU mesh.
"""
import json
import os

import numpy as np
import pytest
import jax
import yaml

from vqvae_speech_tpu.data.synthetic import build_synthetic_store
from vqvae_speech_tpu.data import FeatureStore, FeatureLoader, compute_dataset_stats, load_normalizer
from vqvae_speech_tpu.train import Experiments
from vqvae_speech_tpu.train.checkpoint import find_checkpoints, load_checkpoint, merge_checkpoint_losses

TINY_CFG = dict(
    decoder_type="deconvolutional",
    trainer_type="convolutional",
    verbose=False,
    batch_size=4,
    data_root=".",
    start_epoch=0,
    num_epochs=2,
    num_workers=1,
    train_val_split=0.8,
    learning_rate=0.0005,
    normalize=True,
    normalizer_path="",
    use_speaker_conditioning=False,
    record_codebook_stats=False,
    record_gradient_stats=False,
    features_path="features",
    export_one_hot_features=False,
    use_cuda=False,
    use_data_parallel=False,
    use_device=None,
    sampling_rate=16000,
    res_type="kaiser_fast",
    top_db=20,
    length=7680,
    quantize=256,
    num_hiddens=24,
    input_dim=256,
    num_embeddings=11,
    embedding_dim=8,
    commitment_cost=0.25,
    decay=0.0,
    residual_channels=24,
    num_residual_layers=2,
    input_features_type="mfcc",
    output_features_type="mfcc",
    input_features_dim=47,
    input_features_filters=13,
    output_features_dim=47,
    output_features_filters=13,
    augment_input_features=True,
    augment_output_features=True,
    use_kaiming_normal=False,
    jitter_probability=0.12,
    use_jitter=False,
)


def _setup(tmp_path, cfg_overrides=None, experiments=None, seed=1234):
    root = str(tmp_path)
    store_root = os.path.join(root, "features")
    build_synthetic_store(store_root, num_train=16, num_val=4)
    normalizer_path = os.path.join(root, "stats.pickle")
    compute_dataset_stats(FeatureStore(store_root), normalizer_path)

    cfg = dict(TINY_CFG)
    cfg["normalizer_path"] = normalizer_path
    cfg.update(cfg_overrides or {})
    cfg_path = os.path.join(root, "base.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    spec = {
        "experiments_path": os.path.join(root, "experiments"),
        "results_path": os.path.join(root, "results"),
        "configuration_path": cfg_path,
        "seed": seed,
        "experiments": experiments or {"tiny": {"num_epochs": 2}},
    }
    spec_path = os.path.join(root, "experiments.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    return root, spec_path, store_root


@pytest.mark.slow
def test_train_checkpoints_and_loss_descends(tmp_path):
    root, spec_path, store_root = _setup(tmp_path)
    exps = Experiments.load(spec_path, data_root=store_root)
    exps.train()

    exp_dir = os.path.join(root, "experiments")
    ckpts = find_checkpoints(exp_dir, "tiny")
    assert [e for e, _ in ckpts] == [1, 2]
    assert os.path.isfile(os.path.join(exp_dir, "tiny_configuration.yaml"))

    losses, perps = merge_checkpoint_losses(exp_dir, "tiny")
    assert len(losses) == 2 * 4  # 2 epochs x (16/4) steps
    assert all(np.isfinite(l["loss"]) for l in losses)
    # loss should descend over training on this easy synthetic set
    assert losses[-1]["loss"] < losses[0]["loss"]
    first = load_checkpoint(ckpts[0][1])
    assert first["epoch"] == 1 and first["experiment_name"] == "tiny"


@pytest.mark.slow
def test_auto_resume_continues_from_latest_epoch(tmp_path):
    root, spec_path, store_root = _setup(tmp_path)
    Experiments.load(spec_path, data_root=store_root).train()
    exp_dir = os.path.join(root, "experiments")
    assert len(find_checkpoints(exp_dir, "tiny")) == 2

    # bump num_epochs in the FROZEN config (resume contract: frozen config wins)
    frozen = os.path.join(exp_dir, "tiny_configuration.yaml")
    with open(frozen) as f:
        cfg = yaml.load(f, yaml.FullLoader)
    cfg["num_epochs"] = 3
    with open(frozen, "w") as f:
        yaml.dump(cfg, f)

    exps = Experiments.load(spec_path, data_root=store_root)
    assert exps.experiments[0].resumed
    exps.train()
    ckpts = find_checkpoints(exp_dir, "tiny")
    assert [e for e, _ in ckpts] == [1, 2, 3]


def test_seed_fanout_naming(tmp_path):
    root, spec_path, store_root = _setup(tmp_path)
    with open(spec_path) as f:
        spec = json.load(f)
    spec["seed"] = [1, 2]
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    exps = Experiments.load(spec_path, data_root=store_root)
    assert sorted(e.name for e in exps.experiments) == [
        "tiny-seed1", "tiny-seed2"]


@pytest.mark.slow
def test_data_parallel_training_on_8_device_mesh(tmp_path):
    assert len(jax.devices()) == 8
    root, spec_path, store_root = _setup(
        tmp_path,
        cfg_overrides={"use_data_parallel": True, "batch_size": 8,
                       "decay": 0.99},  # EMA path under DP too
        experiments={"dp": {"num_epochs": 1}})
    exps = Experiments.load(spec_path, data_root=store_root)
    exp = exps.experiments[0]
    assert exp.mesh_configuration.data_axis_size == 8
    exps.train()
    losses, _ = merge_checkpoint_losses(os.path.join(root, "experiments"), "dp")
    assert len(losses) == 2  # 16/8
    assert all(np.isfinite(l["loss"]) for l in losses)


def test_ema_state_saved_in_checkpoint(tmp_path):
    root, spec_path, store_root = _setup(
        tmp_path, cfg_overrides={"decay": 0.99},
        experiments={"ema": {"num_epochs": 1}})
    Experiments.load(spec_path, data_root=store_root).train()
    ckpts = find_checkpoints(os.path.join(root, "experiments"), "ema")
    ckpt = load_checkpoint(ckpts[-1][1])
    assert "codebook" in ckpt["model_state"]["vq"]
    assert "ema_cluster_size" in ckpt["model_state"]["vq"]
    # EMA ran: cluster sizes are no longer all-zero
    assert np.any(ckpt["model_state"]["vq"]["ema_cluster_size"] != 0)


def test_profile_steps_option(tmp_path, capsys):
    root, spec_path, store_root = _setup(
        tmp_path, cfg_overrides={"profile_steps": True},
        experiments={"prof": {"num_epochs": 1}})
    # profile_steps is not a base-config key, so inject into the base yaml
    with open(os.path.join(root, "base.yaml")) as f:
        cfg = yaml.load(f, yaml.FullLoader)
    cfg["profile_steps"] = True
    with open(os.path.join(root, "base.yaml"), "w") as f:
        yaml.dump(cfg, f)
    Experiments.load(spec_path, data_root=store_root).train()
    out = capsys.readouterr().out
    assert "steps/sec" in out


@pytest.mark.slow
def test_mixed_precision_training(tmp_path):
    """compute_dtype: bfloat16 runs forward/backward in bf16 while master
    params, optimizer state, and recorded losses stay float32."""
    root, spec_path, store_root = _setup(
        tmp_path, cfg_overrides={"compute_dtype": "bfloat16"},
        experiments={"mp": {"num_epochs": 2}})
    with open(os.path.join(root, "base.yaml")) as f:
        cfg = yaml.load(f, yaml.FullLoader)
    cfg["compute_dtype"] = "bfloat16"
    with open(os.path.join(root, "base.yaml"), "w") as f:
        yaml.dump(cfg, f)
    exps = Experiments.load(spec_path, data_root=store_root)
    exps.train()
    state = exps.experiments[0].build_trainer().state
    for leaf in jax.tree_util.tree_leaves(state.params):
        if hasattr(leaf, "dtype") and leaf.dtype.kind == "f":
            assert leaf.dtype == "float32"
    losses, _ = merge_checkpoint_losses(os.path.join(root, "experiments"),
                                        "mp")
    assert all(np.isfinite(l["loss"]) for l in losses)
    assert losses[-1]["loss"] < losses[0]["loss"]


def test_jitter_gradient_detach_config_threads_to_the_step():
    """`jitter_gradient_detach` (PARITY #34 knob) must actually switch the
    gradient semantics inside the jitted train step: with detach (default)
    the encoder gradient through the decoder's recon loss is cut ~8x vs
    the flow-gradient extension; values (losses) are identical for the
    same rng."""
    import jax
    import jax.numpy as jnp
    from vqvae_speech_tpu.models import conv_vqvae_init
    from vqvae_speech_tpu.models.conv_vqvae import conv_vqvae_apply

    cfg = dict(TINY_CFG, use_jitter=True, jitter_probability=0.12)
    key = jax.random.PRNGKey(0)
    params, mstate = conv_vqvae_init(key, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 39))
    rng = jax.random.PRNGKey(7)

    def recon_loss(p, c):
        out = conv_vqvae_apply(p, mstate, x, c, training=True, rng=rng)
        return jnp.mean(jnp.square(out.reconstructed_x)), out

    outs = {}
    grads = {}
    for name, detach in (("detach", True), ("flow", False)):
        c = dict(cfg, jitter_gradient_detach=detach)
        (loss, out), g = jax.value_and_grad(
            lambda p: recon_loss(p, c), has_aux=True)(params)
        outs[name] = float(loss)
        enc = g["encoder"]["conv_1"]["w"]
        grads[name] = float(jnp.linalg.norm(enc))
    # identical forward values (same rng -> same jitter pattern)
    assert outs["detach"] == outs["flow"], outs
    # detached semantics pass far less recon gradient into the encoder
    assert grads["detach"] < 0.5 * grads["flow"], grads


def test_loader_skips_output_normalization_on_width_mismatch(tmp_path):
    """The reference applies the SAME 39-d train stats to both feature
    streams (vctk_features_dataset.py:56-58) — well-typed only when both are
    MFCC39. Under the wavenet decoder config the output stream is 79-d
    logfbank (and unused: the target is mu-law audio), so the loader must
    normalize inputs and leave mismatched-width outputs at raw scale."""
    from vqvae_speech_tpu.data import FeatureStore

    store = FeatureStore(str(tmp_path / "features"))
    rng = np.random.default_rng(0)
    inp = rng.normal(5.0, 3.0, (8, 11, 39)).astype(np.float32)
    outp = rng.normal(2.0, 1.0, (8, 11, 79)).astype(np.float32)
    speakers = np.zeros((8,), np.int32)
    meta = {"wav_filenames": [f"p000_{i}.wav" for i in range(8)],
            "shifting_times": [0.0] * 8,
            "random_starting_indices": [0] * 8}
    store.write("train", inp, outp, speakers, metadata=meta,
                preprocessed_audio=np.zeros((8, 128), np.float32))
    norm_path = str(tmp_path / "stats.pickle")
    compute_dataset_stats(store, norm_path)

    loader = FeatureLoader(store, "train", 4,
                           normalizer=load_normalizer(norm_path),
                           shuffle=False)
    batch = next(iter(loader))
    # inputs are whitened by the train stats
    assert abs(float(batch["input_features"].mean())) < 0.5
    assert 0.5 < float(batch["input_features"].std()) < 1.5
    # 79-d outputs keep their raw scale (mean ~2, std ~1)
    np.testing.assert_allclose(batch["output_features"], outp[:4], rtol=1e-6)

    # matched widths still normalize both streams (conv pipeline semantics)
    store39 = FeatureStore(str(tmp_path / "features39"))
    store39.write("train", inp, inp * 2.0 + 1.0, speakers, metadata=meta,
                  preprocessed_audio=np.zeros((8, 128), np.float32))
    norm39 = str(tmp_path / "stats39.pickle")
    compute_dataset_stats(store39, norm39)
    b39 = next(iter(FeatureLoader(store39, "train", 4,
                                  normalizer=load_normalizer(norm39),
                                  shuffle=False)))
    assert not np.allclose(b39["output_features"], inp[:4] * 2.0 + 1.0)


def _revival_step_setup(decay, revival=True, seed=0):
    import jax
    from vqvae_speech_tpu.models import conv_vqvae_init
    from vqvae_speech_tpu.train.trainer import (
        make_train_step, make_optimizer, create_train_state)

    cfg = dict(TINY_CFG, decay=decay, codebook_revival=revival,
               revival_usage_decay=0.5)
    key = jax.random.PRNGKey(seed)
    params, mstate = conv_vqvae_init(key, cfg)
    state = create_train_state(jax.random.PRNGKey(1), params, mstate,
                               make_optimizer(cfg["learning_rate"]))
    step = make_train_step(cfg, make_optimizer(cfg["learning_rate"]))
    return cfg, state, step


def _far_codebook(state, decay):
    """Push every code far from the data so all codes start dead."""
    if decay > 0:
        vq = dict(state.model_state["vq"])
        vq["codebook"] = vq["codebook"] + 100.0
        vq["ema_w"] = vq["ema_w"] + 100.0
        ms = dict(state.model_state, vq=vq)
        return state._replace(model_state=ms)
    params = dict(state.params)
    params = dict(params, vq=dict(params["vq"],
                                  codebook=params["vq"]["codebook"] + 100.0))
    return state._replace(params=params)


@pytest.mark.parametrize("decay", [0.0, 0.99])
def test_codebook_revival_reseeds_dead_codes(decay):
    """With every code pushed 100 sigma from the data, all assignments
    collapse onto one nearest code; the revival extension must re-seed the
    dead codes from batch latents within a few steps, reviving usage."""
    import jax
    import numpy as np

    cfg, state, step = _revival_step_setup(decay)
    state = _far_codebook(state, decay)
    rng = np.random.default_rng(0)
    batch = {
        "input_features": rng.standard_normal((4, 32, 39)).astype(np.float32),
        "output_features": rng.standard_normal((4, 32, 39)).astype(np.float32),
    }
    revived = []
    perps = []
    for _ in range(6):
        state, metrics = step(state, batch)
        revived.append(float(metrics["revived_codes"]))
        perps.append(float(metrics["perplexity"]))
    # usage EMA (decay 0.5) must flag dead codes within a few steps and
    # re-seed them into the latent cloud
    assert max(revived) > 0, revived
    cb = (state.model_state["vq"]["codebook"] if decay > 0
          else state.params["vq"]["codebook"])
    # re-seeded codes live in the data range, not at +100
    assert float(np.median(np.abs(np.asarray(cb)))) < 50.0
    # and late perplexity (code usage) beats the collapsed start
    assert perps[-1] > perps[0], perps


def test_codebook_revival_off_is_reference_exact():
    """Default (no revival): the step must be bit-identical to the pre-
    extension step — same params, same metrics, no usage state."""
    import jax
    import numpy as np

    cfg, state, step = _revival_step_setup(0.0, revival=False)
    assert "revival" not in state.model_state
    rng = np.random.default_rng(0)
    batch = {
        "input_features": rng.standard_normal((4, 32, 39)).astype(np.float32),
        "output_features": rng.standard_normal((4, 32, 39)).astype(np.float32),
    }
    state, metrics = step(state, batch)
    assert "revived_codes" not in metrics


def test_codebook_revival_matches_between_mesh_and_single_device():
    """The revival step must compute identically under the 8-device DP mesh
    (counts psum + cross-shard reseed gather are GSPMD-inserted) and on a
    single device — same PRNG, same batch, same resulting codebook."""
    import jax
    from vqvae_speech_tpu.models import conv_vqvae_init
    from vqvae_speech_tpu.parallel.mesh import make_mesh
    from vqvae_speech_tpu.train.trainer import (
        make_train_step, make_optimizer, create_train_state)

    cfg = dict(TINY_CFG, decay=0.0, codebook_revival=True,
               revival_usage_decay=0.5, batch_size=8)
    params, mstate = conv_vqvae_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "input_features": rng.standard_normal((8, 32, 39)).astype(np.float32),
        "output_features": rng.standard_normal((8, 32, 39)).astype(np.float32),
    }

    def run(mesh):
        import jax.numpy as jnp
        # fresh copies per run: the step donates its state, which would
        # otherwise invalidate the shared init arrays for the second run
        p_run = jax.tree_util.tree_map(jnp.array, params)
        m_run = jax.tree_util.tree_map(jnp.array, mstate)
        state = create_train_state(jax.random.PRNGKey(1), p_run, m_run,
                                   make_optimizer(cfg["learning_rate"]))
        step = make_train_step(cfg, make_optimizer(cfg["learning_rate"]),
                               mesh=mesh)
        # shift the codebook so some codes start dead and the reseed fires
        state = state._replace(params=dict(
            state.params, vq=dict(state.params["vq"],
                                  codebook=state.params["vq"]["codebook"]
                                  + 10.0)))
        for _ in range(4):
            state, metrics = step(state, batch)
        return (np.asarray(state.params["vq"]["codebook"]),
                float(metrics["revived_codes"]))

    cb_single, rev_single = run(None)
    cb_mesh, rev_mesh = run(make_mesh(num_data=8))
    assert rev_single > 0 or rev_mesh > 0  # the path actually fired
    assert rev_single == rev_mesh
    np.testing.assert_allclose(cb_mesh, cb_single, rtol=2e-5, atol=2e-5)
