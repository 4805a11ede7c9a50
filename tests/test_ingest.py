"""Ingest-layer tests: wav I/O, silence trim, TextGrid parsing, VCTK corpus
tree handling, and end-to-end feature export on a synthetic mini-corpus."""
import os

import numpy as np
from scipy.io import wavfile

from vqvae_speech_tpu.data.audio import (
    load_wav, trim_silence, load_and_preprocess, pad_or_random_crop)
from vqvae_speech_tpu.data.textgrid import read_textgrid, leading_silence_duration
from vqvae_speech_tpu.data.vctk import (
    VCTK, make_manifest, make_speaker_dic, preprocess_utterance)
from vqvae_speech_tpu.data.export import export_to_features
from vqvae_speech_tpu.data.feature_store import FeatureStore

TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 2.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 2.0
            text = "hello"
    item [2]:
        class = "IntervalTier"
        name = "phonemes"
        xmin = 0
        xmax = 2.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.25
            text = "sil"
        intervals [2]:
            xmin = 0.25
            xmax = 0.5
            text = "sil"
        intervals [3]:
            xmin = 0.5
            xmax = 2.0
            text = "ah"
"""


def _write_wav(path, signal, rate=48000):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    wavfile.write(path, rate, (signal * 32767).astype(np.int16))


def _tone(dur, rate=48000, f=220.0, amp=0.5):
    t = np.arange(int(dur * rate)) / rate
    return amp * np.sin(2 * np.pi * f * t)


def test_load_wav_resamples_48k_to_16k(tmp_path):
    sig = _tone(1.0)
    path = str(tmp_path / "a.wav")
    _write_wav(path, sig)
    y = load_wav(path, 16000)
    assert abs(len(y) - 16000) <= 1
    assert y.dtype == np.float32


def test_trim_silence_removes_leading_and_trailing():
    rate = 16000
    sig = np.concatenate([
        np.zeros(rate // 2), _tone(1.0, rate), np.zeros(rate // 2)])
    trimmed, (start, end) = trim_silence(sig.astype(np.float32), top_db=20)
    # leading/trailing 0.5 s silence mostly removed (hop quantization ~512)
    assert abs(start - rate // 2) < 1600
    assert abs((len(sig) - end) - rate // 2) < 2100
    assert len(trimmed) < len(sig)


def test_textgrid_parse_and_leading_silence(tmp_path):
    path = str(tmp_path / "x.TextGrid")
    with open(path, "w") as f:
        f.write(TEXTGRID)
    tg = read_textgrid(path)
    assert len(tg.tiers) == 2
    assert tg.tiers[1].name == "phonemes"
    assert [i.mark for i in tg.tiers[1]] == ["sil", "sil", "ah"]
    assert abs(leading_silence_duration(path) - 0.5) < 1e-9


def test_pad_or_random_crop():
    short = np.ones(100, np.float32)
    padded, start = pad_or_random_crop(short, 200)
    assert start is None and len(padded) == 200 and padded[150] == 0
    long = np.arange(300, dtype=np.float32)
    cropped, start = pad_or_random_crop(long, 200,
                                        np.random.default_rng(0))
    assert len(cropped) == 200 and cropped[0] == start


def _mini_corpus(root):
    """VCTK-like tree: raw/VCTK-Corpus/{wav48/p225,p226; txt; phonemes}."""
    dset = os.path.join(root, "raw", "VCTK-Corpus")
    rng = np.random.default_rng(0)
    for spk_i, spk in enumerate(["p225", "p226"]):
        for utt in range(3):
            name = f"{spk}_{utt:03d}"
            sig = np.concatenate([
                np.zeros(24000),
                _tone(1.0, f=150 + 80 * spk_i, amp=0.4)
                + 0.01 * rng.standard_normal(48000),
                np.zeros(12000)])
            _write_wav(os.path.join(dset, "wav48", spk, name + ".wav"), sig)
            txt_dir = os.path.join(dset, "txt", spk)
            os.makedirs(txt_dir, exist_ok=True)
            with open(os.path.join(txt_dir, name + ".txt"), "w") as f:
                f.write("hello world\n")
            tg_dir = os.path.join(dset, "phonemes", spk)
            os.makedirs(tg_dir, exist_ok=True)
            with open(os.path.join(tg_dir, name + ".TextGrid"), "w") as f:
                f.write(TEXTGRID)
    with open(os.path.join(dset, "speaker-info.txt"), "w") as f:
        f.write("info\n")
    return dset


def test_vctk_corpus_manifest_and_split(tmp_path):
    root = str(tmp_path)
    _mini_corpus(root)
    vctk = VCTK(root, ratio=0.8, shuffle_seed=0)
    assert len(vctk.audios) == 6
    assert len(vctk.audios_train) == 4 and len(vctk.audios_val) == 2
    assert vctk.speaker_dic == {"p225": 0, "p226": 1}
    assert len(vctk.utterences) == 6


def test_preprocess_utterance_uses_textgrid_silence(tmp_path):
    root = str(tmp_path)
    _mini_corpus(root)
    vctk = VCTK(root, shuffle_seed=0)
    item = preprocess_utterance(vctk.audios[0], vctk.speaker_dic,
                                16000, 20, 7680, 256,
                                np.random.default_rng(0))
    assert item["preprocessed_audio"].shape == (7681,)
    assert item["quantized"].shape == (7681,)
    assert item["quantized"].dtype in (np.int32, np.int64)
    # TextGrid says 0.5 s leading silence -> shifting_time includes it
    assert item["shifting_time"] >= 0.5


def test_export_to_features_end_to_end(tmp_path):
    root = str(tmp_path)
    _mini_corpus(root)
    vctk = VCTK(root, ratio=0.8, shuffle_seed=0)
    cfg = dict(sampling_rate=16000, top_db=20, length=7680, quantize=256,
               input_features_type="mfcc", output_features_type="mfcc",
               input_features_filters=13, output_features_filters=13,
               input_features_dim=47, augment_output_features=True)
    store = export_to_features(vctk, os.path.join(root, "features"), cfg,
                               num_workers=2)
    train = store.open("train")
    assert train["input_features"].shape == (4, 47, 39)
    assert train["output_features"].shape == (4, 47, 39)
    assert train["speaker_ids"].shape == (4,)
    meta = store.metadata("train")
    assert len(meta["wav_filenames"]) == 4
    # resume: second call skips (no overwrite)
    export_to_features(vctk, os.path.join(root, "features"), cfg)
