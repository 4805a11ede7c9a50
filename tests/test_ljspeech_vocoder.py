"""LJSpeech pipeline + vocoder trainer tests on a synthetic mini-corpus."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.io import wavfile

from vqvae_speech_tpu.data.ljspeech import (
    preprocess, LJSpeechDataset, LJSpeechLoader, crop_batch, HOP_LENGTH)
from vqvae_speech_tpu.ops.mel import (
    melspectrogram, mel_filterbank_slaney, normalized_log_mel)


def _mini_ljspeech(root, n=4):
    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        name = f"LJ001-{i:04d}"
        t = np.arange(22050) / 22050.0
        sig = 0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)
        sig += 0.01 * rng.standard_normal(len(t))
        wavfile.write(os.path.join(wav_dir, name + ".wav"), 22050,
                      (sig * 32767).astype(np.int16))
        lines.append(f"{name}|text|normalized text {i}")
    with open(os.path.join(root, "metadata.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return root


# ---------------- mel numerics ----------------


def _np_slaney_mel(sr=22050, n_fft=1024, n_mels=80, fmin=125, fmax=7600):
    """Independent numpy transcription of librosa.filters.mel."""
    def hz2mel(hz):
        hz = np.asarray(hz, float)
        mel = hz / (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        return np.where(hz >= 1000, 15.0 + np.log(hz / 1000.0) / logstep, mel)

    def mel2hz(mel):
        mel = np.asarray(mel, float)
        hz = mel * (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        return np.where(mel >= 15.0, 1000.0 * np.exp(logstep * (mel - 15.0)),
                        hz)

    fftfreqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    mel_f = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    weights = np.zeros((n_mels, len(fftfreqs)))
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    return weights * enorm[:, None]


def test_mel_filterbank_matches_librosa_recipe():
    got = mel_filterbank_slaney()
    want = _np_slaney_mel()
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_melspectrogram_shapes_and_energy_location():
    t = np.arange(22050) / 22050.0
    sig = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    mel = np.asarray(melspectrogram(jnp.asarray(sig[None])))
    assert mel.shape == (1, 1 + len(sig) // 256, 80)
    # peak mel bin should correspond to ~1 kHz
    fb = mel_filterbank_slaney()
    centers = np.argmax(fb, axis=1) * 22050 / 1024
    peak_bin = int(np.argmax(mel[0].mean(axis=0)))
    assert 800 < centers[peak_bin] < 1250


def test_normalized_log_mel_range():
    sig = np.random.default_rng(0).uniform(-1, 1, 22050).astype(np.float32)
    m = np.asarray(normalized_log_mel(jnp.asarray(sig[None])))
    assert np.all(m >= 0.0) and np.all(m <= 1.0)


# ---------------- pipeline ----------------


def test_preprocess_and_dataset(tmp_path):
    root = _mini_ljspeech(str(tmp_path))
    out = os.path.join(root, "out")
    meta = preprocess(root, out)
    assert len(meta) == 4
    ds = LJSpeechDataset(out, train=True, test_size=0.25)
    assert len(ds) == 3
    wav, mel = ds[0]
    assert len(wav) % HOP_LENGTH == 0
    assert len(wav) // HOP_LENGTH == len(mel)
    ds_test = LJSpeechDataset(out, train=False, test_size=0.25)
    assert len(ds_test) == 1


def test_crop_batch_alignment(tmp_path):
    root = _mini_ljspeech(str(tmp_path))
    out = os.path.join(root, "out")
    preprocess(root, out)
    ds = LJSpeechDataset(out, train=True, test_size=0.25)
    loader = LJSpeechLoader(ds, batch_size=2, seed=0)
    batch = next(iter(loader))
    assert batch["x"].shape == (2, 6400, 1)
    assert batch["y"].shape == (2, 6400)
    assert batch["c"].shape == (2, 25, 80)


@pytest.mark.slow
def test_teacher_and_flow_training_steps(tmp_path):
    root = _mini_ljspeech(str(tmp_path))
    out = os.path.join(root, "out")
    preprocess(root, out)
    ds = LJSpeechDataset(out, train=True, test_size=0.25)
    loader = LJSpeechLoader(ds, batch_size=2, seed=0, max_time_steps=2048)

    from vqvae_speech_tpu.train.vocoder import (
        make_vocoder_optimizer, create_vocoder_state, VocoderTrainer,
        make_teacher_train_step, make_flow_train_step,
        load_vocoder_checkpoint)
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init)
    from vqvae_speech_tpu.models.flowavenet import (
        FlowavenetConfig, flowavenet_init, actnorm_initialize)

    key = jax.random.PRNGKey(0)
    # tiny teacher
    tcfg = GaussianWaveNetConfig(num_blocks=1, num_layers=2,
                                 front_channels=4, residual_channels=8,
                                 gate_channels=8, skip_channels=8,
                                 kernel_size=2, cin_channels=80,
                                 upsample_scales=(16, 16))
    params = gaussian_wavenet_init(key, tcfg)
    opt = make_vocoder_optimizer(1e-3, clip_norm=10.0)
    state = create_vocoder_state(key, params, opt)
    ckpt_dir = os.path.join(root, "ckpt")
    trainer = VocoderTrainer(make_teacher_train_step(tcfg, opt), state,
                             loader, ckpt_dir, "teacher")
    loss0 = trainer.train_epoch(0)
    assert np.isfinite(loss0)
    assert os.path.isfile(os.path.join(ckpt_dir, "teacher_best.pkl"))
    ckpt = load_vocoder_checkpoint(os.path.join(ckpt_dir, "teacher_best.pkl"))
    assert ckpt["step"] == len(loader)

    # tiny flow
    fcfg = FlowavenetConfig(in_channel=1, cin_channel=80, n_block=2,
                            n_flow=1, n_layer=1, filter_size=8,
                            block_per_split=8, upsample_scales=(16, 16))
    fparams = flowavenet_init(key, fcfg)
    first = next(iter(loader))
    fparams = actnorm_initialize(fparams, fcfg, jnp.asarray(first["x"]),
                                 jnp.asarray(first["c"]))
    fopt = make_vocoder_optimizer(1e-3, clip_norm=1.0)
    fstate = create_vocoder_state(key, fparams, fopt)
    ftrainer = VocoderTrainer(make_flow_train_step(fcfg, fopt), fstate,
                              loader, ckpt_dir, "flow")
    floss = ftrainer.train_epoch(0)
    assert np.isfinite(floss)


def test_lr_schedule_halves_at_boundaries():
    from vqvae_speech_tpu.train.vocoder import step_lr_schedule

    sched = step_lr_schedule(1e-3)
    assert float(sched(0)) == 1e-3
    assert abs(float(sched(200_000)) - 5e-4) < 1e-12
    assert abs(float(sched(400_000)) - 2.5e-4) < 1e-12
    assert abs(float(sched(600_000)) - 1.25e-4) < 1e-12


def test_mulaw_quantize_preprocess_mode(tmp_path):
    root = _mini_ljspeech(str(tmp_path))
    out = os.path.join(root, "out_mulaw")
    meta = preprocess(root, out, input_type="mulaw-quantize")
    assert len(meta) == 4
    audio = np.load(os.path.join(out, meta[0][0]))
    assert audio.dtype == np.int16
    assert audio.min() >= 0 and audio.max() < 256
    assert len(audio) % HOP_LENGTH == 0
    mel = np.load(os.path.join(out, meta[0][1]))
    assert len(audio) // HOP_LENGTH == mel.shape[0]


def test_teacher_bf16_mixed_precision_step():
    """compute_dtype=bf16: masters stay f32, loss tracks the f32 step."""
    import jax
    import numpy as np
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init)
    from vqvae_speech_tpu.train.vocoder import (
        make_teacher_train_step, make_vocoder_optimizer,
        create_vocoder_state)

    cfg = GaussianWaveNetConfig(
        num_blocks=1, num_layers=2, front_channels=4, residual_channels=8,
        gate_channels=8, skip_channels=8, kernel_size=2, cin_channels=4,
        upsample_scales=(4, 4))
    opt = make_vocoder_optimizer(1e-3, 10.0)

    def fresh():
        return create_vocoder_state(
            jax.random.PRNGKey(1),
            gaussian_wavenet_init(jax.random.PRNGKey(0), cfg), opt)

    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(
            rng.standard_normal((2, 64, 1)).astype(np.float32) * 0.1),
        "c": jnp.asarray(rng.standard_normal((2, 4, 4)).astype(np.float32)),
    }
    s32, sbf = fresh(), fresh()
    step32 = make_teacher_train_step(cfg, opt)
    stepbf = make_teacher_train_step(cfg, opt, compute_dtype=jnp.bfloat16)
    for _ in range(3):
        s32, l32 = step32(s32, batch)
        sbf, lbf = stepbf(sbf, batch)
        assert abs(float(l32) - float(lbf)) < 0.05
    assert jax.tree_util.tree_leaves(sbf.params)[0].dtype == jnp.float32


def test_student_bf16_mixed_precision_step():
    """Distillation step with compute_dtype=bf16 tracks the f32 loss."""
    import jax
    import numpy as np
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init,
        StudentConfig, wavenet_student_init)
    from vqvae_speech_tpu.train.vocoder import (
        make_student_train_step, make_vocoder_optimizer,
        create_vocoder_state)

    t_cfg = GaussianWaveNetConfig(
        num_blocks=1, num_layers=2, front_channels=4, residual_channels=8,
        gate_channels=8, skip_channels=8, kernel_size=2, cin_channels=4,
        upsample_scales=(4, 4))
    s_cfg = StudentConfig(num_blocks_student=(1, 1), num_layers=2,
                          front_channels=4, residual_channels=8,
                          gate_channels=8, skip_channels=8,
                          kernel_size=3, cin_channels=4)
    t_params = gaussian_wavenet_init(jax.random.PRNGKey(0), t_cfg)
    opt = make_vocoder_optimizer(5e-4, 10.0)

    def fresh():
        return create_vocoder_state(
            jax.random.PRNGKey(2),
            wavenet_student_init(jax.random.PRNGKey(1), s_cfg), opt)

    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(
            rng.standard_normal((2, 128, 1)).astype(np.float32) * 0.1),
        "c": jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32)),
    }
    st32 = make_student_train_step(t_cfg, s_cfg, t_params, opt)
    stbf = make_student_train_step(t_cfg, s_cfg, t_params, opt,
                                   compute_dtype=jnp.bfloat16)
    s32, sbf = fresh(), fresh()
    for _ in range(2):
        s32, (l32, _) = st32(s32, batch)
        sbf, (lbf, _) = stbf(sbf, batch)
        # same rng stream (same state.rng), so the same z draw; bf16
        # rounding only
        assert abs(float(l32) - float(lbf)) / max(abs(float(l32)), 1) < 0.1
    assert jax.tree_util.tree_leaves(sbf.params)[0].dtype == jnp.float32


def test_trainer_best_gated_on_test_loss(tmp_path):
    """With an eval loader, 'best' checkpoints gate on TEST loss of the
    EMA params (reference clarinet train.py:273-283)."""
    import jax
    import os
    import numpy as np
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init)
    from vqvae_speech_tpu.train.vocoder import (
        VocoderTrainer, make_teacher_train_step, make_teacher_eval_loss,
        make_vocoder_optimizer, create_vocoder_state,
        load_vocoder_checkpoint)

    cfg = GaussianWaveNetConfig(
        num_blocks=1, num_layers=2, front_channels=4, residual_channels=8,
        gate_channels=8, skip_channels=8, kernel_size=2, cin_channels=4,
        upsample_scales=(4, 4))
    opt = make_vocoder_optimizer(1e-3, 10.0)
    state = create_vocoder_state(
        jax.random.PRNGKey(1),
        gaussian_wavenet_init(jax.random.PRNGKey(0), cfg), opt)

    rng = np.random.default_rng(0)

    def batches(seed):
        r = np.random.default_rng(seed)
        return [{
            "x": jnp.asarray(
                r.standard_normal((2, 64, 1)).astype(np.float32) * 0.1),
            "c": jnp.asarray(r.standard_normal((2, 4, 4)).astype(np.float32)),
        }]

    eval_calls = []
    inner = make_teacher_eval_loss(cfg)

    def spy_eval(params, batch):
        eval_calls.append(1)
        return inner(params, batch)

    trainer = VocoderTrainer(
        make_teacher_train_step(cfg, opt), state, batches(1),
        str(tmp_path), "teacher", eval_loader=batches(2),
        eval_loss_fn=spy_eval, eval_on_ema=True)
    trainer.train_epoch(0)
    assert eval_calls, "eval loader was not consulted"
    best = load_vocoder_checkpoint(
        os.path.join(str(tmp_path), "teacher_best.pkl"))
    # the recorded best loss is the TEST loss, not the train loss
    test_loss = float(inner(trainer.state.ema_params, batches(2)[0]))
    assert abs(best["loss"] - test_loss) < 1e-6


def test_steplr_schedule_halves_indefinitely():
    """Flow's StepLR(200k, 0.5) vs the clarinet milestones which stop at
    600k (PARITY: the reference's clarinet halving is additionally a
    torch param-group-key no-op; we implement the intent)."""
    from vqvae_speech_tpu.train.vocoder import (
        steplr_schedule, step_lr_schedule)
    flow = steplr_schedule(1.0)
    clarinet = step_lr_schedule(1.0)
    assert float(flow(199_999)) == 1.0
    assert float(flow(200_000)) == 0.5
    assert float(flow(800_000)) == 0.0625      # keeps halving
    assert float(clarinet(800_000)) == 0.125   # milestones stop at 600k


def test_trainer_persists_loss_histories_and_on_best(tmp_path):
    """Reference contract: {name}_train.npy / {name}.npy per epoch, and an
    on-best hook fires when a new best checkpoint is saved."""
    import jax
    import os
    import numpy as np
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init)
    from vqvae_speech_tpu.train.vocoder import (
        VocoderTrainer, make_teacher_train_step, make_vocoder_optimizer,
        create_vocoder_state)

    cfg = GaussianWaveNetConfig(
        num_blocks=1, num_layers=2, front_channels=4, residual_channels=8,
        gate_channels=8, skip_channels=8, kernel_size=2, cin_channels=4,
        upsample_scales=(4, 4))
    opt = make_vocoder_optimizer(1e-3, 10.0)
    state = create_vocoder_state(
        jax.random.PRNGKey(1),
        gaussian_wavenet_init(jax.random.PRNGKey(0), cfg), opt)
    r = np.random.default_rng(0)
    loader = [{
        "x": jnp.asarray(r.standard_normal((2, 64, 1)).astype(np.float32)
                         * 0.1),
        "c": jnp.asarray(r.standard_normal((2, 4, 4)).astype(np.float32)),
    }]
    fired = []
    trainer = VocoderTrainer(
        make_teacher_train_step(cfg, opt), state, loader, str(tmp_path),
        "teacher", on_best=lambda state, epoch: fired.append(epoch))
    trainer.train_epoch(0)
    trainer.train_epoch(1)
    train_hist = np.load(os.path.join(str(tmp_path), "teacher_train.npy"))
    eval_hist = np.load(os.path.join(str(tmp_path), "teacher.npy"))
    assert train_hist.shape == (2,) and eval_hist.shape == (2,)
    assert fired and fired[0] == 0  # epoch 0 is always a new best
