"""Auxiliary subsystem tests: noise injector, spectrogram dataset,
sil-gap script, speaker/entropy stats, profiling timer."""
import os

import numpy as np
import pytest
from scipy.io import wavfile

from vqvae_speech_tpu.data.noise_injector import NoiseInjector, augment_tempo_gain
from vqvae_speech_tpu.eval.speaker_stats import (
    compute_speaker_dependency_stats, compute_entropy_distributions,
    _js_divergence)
from vqvae_speech_tpu.utils.profiling import StepTimer


def _write_noise_dir(root):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        sig = 0.1 * rng.standard_normal(32000)
        wavfile.write(os.path.join(root, f"noise{i}.wav"), 16000,
                      (sig * 32767).astype(np.int16))


def test_noise_injector_snr_mixing(tmp_path):
    noise_dir = str(tmp_path / "noise")
    _write_noise_dir(noise_dir)
    inj = NoiseInjector(noise_dir, 16000, (0.3, 0.3),
                        rng=np.random.default_rng(1))
    t = np.arange(16000) / 16000
    clean = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    noisy = inj.inject_noise(clean.copy())
    assert noisy.shape == clean.shape
    added = noisy - clean
    # energy-matched mixing: rms(added) ~= 0.3 * rms(clean)
    ratio = np.sqrt(np.mean(added**2)) / np.sqrt(np.mean(clean**2))
    assert 0.2 < ratio < 0.4


def test_noise_injector_missing_dir_raises(tmp_path):
    with pytest.raises(IOError):
        NoiseInjector(str(tmp_path / "nope"))


def test_augment_tempo_gain_changes_length():
    rng = np.random.default_rng(2)
    audio = rng.standard_normal(16000).astype(np.float32)
    out = augment_tempo_gain(audio, rng=np.random.default_rng(3))
    assert out.dtype == np.float32
    assert abs(len(out) - 16000) < 16000 * 0.2


def test_wsola_preserves_pitch():
    """The reference's sox `tempo` is pitch-preserving WSOLA
    (spectrogram_parser.py:117-129): a 220 Hz tone stretched 0.85x/1.15x
    must keep its dominant frequency at 220 Hz (plain resampling would
    shift it to 220/tempo)."""
    from vqvae_speech_tpu.data.noise_injector import wsola_time_stretch

    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)

    def dominant_hz(x):
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        return np.argmax(spec) * sr / len(x)

    for tempo in (0.85, 1.15):
        out = wsola_time_stretch(tone, tempo, sr)
        # duration scales ~1/tempo
        assert abs(len(out) - sr / tempo) < sr * 0.05, (tempo, len(out))
        # pitch unchanged (within one FFT bin)
        assert abs(dominant_hz(out) - 220.0) < 5.0, (tempo, dominant_hz(out))
        # resampling by contrast WOULD move the pitch: sanity of the check
        from scipy.signal import resample_poly
        res = resample_poly(tone, int(round(1000 / tempo)), 1000)
        assert abs(dominant_hz(res.astype(np.float32)) - 220.0) > 20.0


def test_wsola_identity_and_continuity():
    from vqvae_speech_tpu.data.noise_injector import wsola_time_stretch

    sr = 16000
    t = np.arange(sr // 2) / sr
    x = (0.5 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32)
    # tempo 1.0 is the identity
    np.testing.assert_array_equal(wsola_time_stretch(x, 1.0, sr), x)
    # stretched output has no overlap-add discontinuities: max abs diff of
    # adjacent samples stays in the range of the tone's own slope
    out = wsola_time_stretch(x, 0.9, sr)
    max_step = np.abs(np.diff(out)).max()
    tone_step = np.abs(np.diff(x)).max()
    assert max_step < 2.0 * tone_step, (max_step, tone_step)
    # empty input round-trips
    assert len(wsola_time_stretch(np.zeros(0, np.float32), 1.2, sr)) == 0


def test_wsola_native_matches_numpy():
    """The C++ WSOLA (native/ingest.cpp) is the same algorithm as the
    numpy implementation; outputs must agree to float tolerance on
    speech-like signals across tempos (argmax searches can only differ at
    exact correlation ties, which these signals do not produce)."""
    from vqvae_speech_tpu.native import (
        available, wsola_time_stretch_native)
    from vqvae_speech_tpu.data.noise_injector import wsola_time_stretch

    if not available():
        import pytest
        pytest.skip("native lib unavailable (g++ missing)")

    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * 0.8)) / sr
    # speech-like: gliding harmonic + noise floor
    f0 = 150 * (1 + 0.2 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = (0.5 * np.sin(phase) + 0.2 * np.sin(2 * phase)
         + 0.01 * rng.standard_normal(len(t))).astype(np.float32)

    # 0.4 exercises the deep-slowdown regime where the natural-continuation
    # template x[seg_start+Hs:...+N] runs past the input end and must be
    # truncated exactly like the numpy slice (a full-N read is a heap
    # over-read); tempos like 0.85 have float32 representations BELOW the
    # true value, pinning the double-tempo ABI (a float32-degraded tempo
    # can yield one more frame C++-side than the Python buffer sizing)
    for tempo in (0.4, 0.45, 0.85, 0.95, 1.1, 1.15):
        got = wsola_time_stretch_native(x, tempo, sr)
        want = wsola_time_stretch(x, tempo, sr, use_native=False)
        assert got.shape == want.shape, (tempo, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # sweep odd lengths x irrational-ish tempos: shapes must agree always
    # (shape agreement IS the n_frames buffer-sizing contract)
    for n in (12801, 13007, 19960):
        xn = x[:n]
        for tempo in np.linspace(0.35, 1.6, 23):
            got = wsola_time_stretch_native(xn, float(tempo), sr)
            want = wsola_time_stretch(xn, float(tempo), sr,
                                      use_native=False)
            assert got.shape == want.shape, (n, tempo)
    # identity + tiny input fall-throughs
    np.testing.assert_array_equal(wsola_time_stretch_native(x, 1.0, sr), x)


def test_spectrogram_dataset(tmp_path):
    wav_path = str(tmp_path / "a.wav")
    txt_path = str(tmp_path / "a.txt")
    t = np.arange(16000) / 16000
    wavfile.write(wav_path, 16000,
                  (0.5 * np.sin(2 * np.pi * 300 * t) * 32767).astype(np.int16))
    with open(txt_path, "w") as f:
        f.write("hello there\n")
    manifest = str(tmp_path / "manifest.csv")
    with open(manifest, "w") as f:
        f.write(f"{wav_path},{txt_path}\n")

    from vqvae_speech_tpu.data.spectrogram_dataset import SpectrogramDataset

    ds = SpectrogramDataset(manifest, normalize=True)
    assert len(ds) == 1
    spect, transcript = ds[0]
    assert transcript == "hello there"
    assert spect.ndim == 2 and spect.shape[0] == 161  # 320//2+1 freq bins
    assert abs(float(spect.mean())) < 1e-5  # normalized


def test_speaker_dependency_stats(tmp_path):
    rng = np.random.default_rng(0)
    # speakers 0/1 use disjoint codes; speaker 2 mirrors speaker 0
    seqs, speakers = [], []
    for _ in range(10):
        seqs.append(rng.integers(0, 4, 24))
        speakers.append(0)
        seqs.append(rng.integers(4, 8, 24))
        speakers.append(1)
        seqs.append(rng.integers(0, 4, 24))
        speakers.append(2)
    res = compute_speaker_dependency_stats(seqs, speakers, 8, str(tmp_path),
                                           "t")
    pairs = res["pairs"]
    div = dict(zip(pairs, res["js_divergences"]))
    assert div[(0, 1)] > div[(0, 2)]  # disjoint codes -> higher divergence
    assert os.path.isfile(os.path.join(
        str(tmp_path), "t_speaker_dependency_stats.pickle"))
    assert os.path.isfile(os.path.join(
        str(tmp_path), "t_speaker-dependency-plot.png"))


def test_js_divergence_properties():
    p = np.array([1.0, 0, 0, 0])
    q = np.array([0, 1.0, 0, 0])
    assert _js_divergence(p, p) < 1e-10
    assert _js_divergence(p, q) > 0.5


def test_entropy_distributions(tmp_path):
    rng = np.random.default_rng(1)
    originals = [rng.standard_normal((47, 39)) for _ in range(4)]
    quantizeds = [rng.standard_normal((24, 8)) for _ in range(4)]
    recons = [rng.standard_normal((47, 39)) for _ in range(4)]
    o, q, r = compute_entropy_distributions(originals, quantizeds, recons,
                                            str(tmp_path), "t")
    assert len(o) == len(q) == len(r) == 4
    assert os.path.isfile(os.path.join(str(tmp_path),
                                       "t_entropy-stats-plot.png"))
    assert os.path.isfile(os.path.join(str(tmp_path),
                                       "t_original_distribution.pickle"))


def test_sil_gap_script(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from scripts.compute_sil_duration_gap_stats import (
        compute_sil_duration_gap_stats)
    from tests.test_ingest import _mini_corpus
    from vqvae_speech_tpu.data.vctk import VCTK
    from vqvae_speech_tpu.data.export import export_to_features

    root = str(tmp_path)
    dset = _mini_corpus(root)
    vctk = VCTK(root, ratio=0.8, shuffle_seed=0)
    cfg = dict(sampling_rate=16000, top_db=20, length=7680, quantize=256,
               input_features_type="mfcc", output_features_type="mfcc",
               input_features_filters=13, output_features_filters=13,
               input_features_dim=47, augment_output_features=True)
    export_to_features(vctk, os.path.join(root, "features"), cfg,
                       num_workers=2)
    res = compute_sil_duration_gap_stats(
        os.path.join(root, "features"), os.path.join(dset, "phonemes"),
        out_dir=str(tmp_path / "out"))
    assert len(res["sil_duration_gaps"]) == 2  # val split
    assert os.path.isfile(str(tmp_path / "out" / "sil_duration_gap_stats.png"))


def test_step_timer():
    import time

    timer = StepTimer()
    for _ in range(3):
        with timer.step():
            time.sleep(0.01)
    s = timer.summary()
    assert s["steps"] == 3
    assert 0.005 < s["mean_s"] < 0.1
    assert s["steps_per_sec"] > 5


def test_exp_families_reference_parity():
    """The experiment-family sweep script mirrors the reference's four
    experiment-family JSONs (configurations/experiments_*.json)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from scripts.exp_families_tpu import FAMILIES, run_names_for

    assert set(FAMILIES) == {"lengths", "batch_sizes", "codebook_sizes",
                             "seeds"}
    # codebook sweep: reference experiments_mfcc39-codebook_sizes.json —
    # 10 -> 1000 codes at batch 2, 15 epochs
    cb = FAMILIES["codebook_sizes"]["experiments"]
    assert sorted(int(n.split("-")[1]) for n in cb) == [10, 44, 100, 500,
                                                        1000]
    for exp in cb.values():
        assert exp["batch_size"] == 2 and exp["num_epochs"] == 15
    # seeds family: reference experiments_vq44-mfcc39-seeds.json —
    # baseline + jitter12 at 10 epochs over seeds [1234, 5678, 4242],
    # fanned out to {name}-seed{seed} exactly like the driver
    seeds_spec = FAMILIES["seeds"]
    seed_spec, names = run_names_for(seeds_spec, default_seed=0)
    assert seed_spec == [1234, 5678, 4242]
    assert set(names) == {f"{b}-seed{s}" for b in ("baseline", "jitter12")
                          for s in (1234, 5678, 4242)}
    assert seeds_spec["experiments"]["jitter12"]["jitter_probability"] == 0.12
    # a plain family keeps its single seed and raw names
    seed_spec, names = run_names_for(FAMILIES["batch_sizes"], 1234)
    assert seed_spec == 1234
    assert names == [f"baseline-{b}" for b in (2, 16, 32, 64)]


def test_wavenet_vqvae_e2e_gates_pin_margin_semantics():
    """The e2e quality gates are margins vs uniform NLL (ln 256), not
    absolute numbers — and the committed chip artifact passes them
    (scripts/wavenet_vqvae_e2e_tpu.py::apply_gates; reference model being
    evidenced: src/models/wavenet_vq_vae.py:36-127, untrainable there)."""
    import json
    import sys

    import pytest

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from scripts.wavenet_vqvae_e2e_tpu import UNIFORM_NLL, apply_gates

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # The PINNED NEGATIVE RESULT (RESULTS.md round-5 e2e section): the
    # codes-only arm with the FIXED LC-upsample init keeps the channel
    # structurally alive (post_hoc_diagnostics: nonzero upsampled LC,
    # nonzero logit sensitivity to a codes swap) yet measures ~1e-5 nats
    # of conditional information — far below the 25%-of-ceiling
    # certification bar.  apply_gates must REJECT it: the reference
    # architecture (one 29-way code per 384 samples) does not meet the
    # "genuinely conditional codes->audio model" bar, and this test keeps
    # both the bar and that finding from silently drifting.
    fixed = os.path.join(repo, "wavenet_vqvae_e2e_codesonly_fixedinit",
                         "summary.json")
    with open(fixed) as f:
        fixed_summary = json.load(f)
    diags = fixed_summary["post_hoc_diagnostics"]
    assert diags["upsampled_lc_nonzero_frac"] == 1.0          # channel alive
    assert diags["logit_sensitivity_to_feats_swap"] > 0.0
    with pytest.raises(AssertionError):
        apply_gates(fixed_summary)                            # bar not met
    # ...and the gap that WOULD meet the bar passes the codes-only gates
    ceiling = fixed_summary["code_rate_ceiling_nats_per_sample"]
    passing = dict(fixed_summary, median=dict(
        fixed_summary["median"], wrong_codes_gap_nats=0.5 * ceiling,
        codes_used_val=22, val_code_perplexity=9.0))
    apply_gates(passing)

    # AR-arm gate semantics, exercised on an AR-arm-shaped summary (the
    # codes-only artifact reshaped: dropout off, margins satisfied)
    ar = dict(passing, knobs=dict(passing["knobs"], ar_input_dropout=0.0),
              median=dict(passing["median"], train_ce_final=UNIFORM_NLL - 2.5,
                          val_teacher_forced_nll=UNIFORM_NLL - 0.8,
                          codes_used_val=22, val_code_perplexity=9.0,
                          wrong_codes_gap_nats=0.001))
    apply_gates(ar)
    # a model that only memorized noise (train descends, val at uniform)
    # must NOT pass
    bad = dict(ar, median=dict(
        ar["median"], val_teacher_forced_nll=UNIFORM_NLL - 0.2))
    with pytest.raises(AssertionError):
        apply_gates(bad)
    # a near-collapsed codebook must NOT pass, whatever its NLL margins
    # (round-4's artifact scored 6/29 codes and slipped through)
    bad2 = dict(ar, median=dict(ar["median"], codes_used_val=6))
    with pytest.raises(AssertionError):
        apply_gates(bad2)
    # a NEGATIVE gap beyond measurement noise must NOT pass the AR arm
    bad3 = dict(ar, median=dict(
        ar["median"], wrong_codes_gap_nats=-0.1))
    with pytest.raises(AssertionError):
        apply_gates(bad3)
    # an unconditional-collapse stream scoring above uniform must NOT pass
    first_seed = next(iter(ar["per_seed"]))
    bad_seed = dict(ar["per_seed"][first_seed], generation={"f32": {
        "gen_stream_nll_under_model": UNIFORM_NLL + 0.1}})
    bad4 = dict(ar, per_seed=dict(
        ar["per_seed"], **{first_seed: bad_seed}))
    with pytest.raises(AssertionError):
        apply_gates(bad4)
