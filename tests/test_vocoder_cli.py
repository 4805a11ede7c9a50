"""Vocoder CLI end-to-end: preprocess -> train-teacher/train-flow ->
synthesize (tiny presets), producing real wav files."""
import os

import numpy as np
import pytest
from scipy.io import wavfile

from vqvae_speech_tpu.vocoder_main import main
from tests.test_ljspeech_vocoder import _mini_ljspeech


@pytest.mark.slow
def test_cli_preprocess_train_synthesize(tmp_path):
    root = _mini_ljspeech(str(tmp_path))
    data = os.path.join(root, "lj")
    assert main(["preprocess", "--in_dir", root, "--out_dir", data]) == 0

    ckpt_dir = os.path.join(root, "ckpt")
    assert main(["train-teacher", "--data_root", data,
                 "--checkpoint_dir", ckpt_dir, "--epochs", "1",
                 "--batch_size", "2", "--tiny"]) == 0
    teacher_ckpt = os.path.join(ckpt_dir, "teacher_best.pkl")
    assert os.path.isfile(teacher_ckpt)

    # student distillation (1 epoch, tiny)
    assert main(["train-student", "--data_root", data,
                 "--checkpoint_dir", ckpt_dir, "--epochs", "1",
                 "--batch_size", "2", "--tiny",
                 "--teacher_checkpoint", teacher_ckpt]) == 0
    student_ckpt = os.path.join(ckpt_dir, "student_best.pkl")
    assert os.path.isfile(student_ckpt)

    # flow (1 epoch, tiny)
    assert main(["train-flow", "--data_root", data,
                 "--checkpoint_dir", ckpt_dir, "--epochs", "1",
                 "--batch_size", "2", "--tiny"]) == 0

    # synthesize from a short mel slice
    mel_full = np.load(os.path.join(
        data, sorted(f for f in os.listdir(data) if "mel" in f)[0]))
    mel_path = os.path.join(root, "mel_short.npy")
    np.save(mel_path, mel_full[:4])  # 4 frames -> 1024 samples

    out_wav = os.path.join(root, "teacher.wav")
    assert main(["synthesize-teacher", "--checkpoint", teacher_ckpt,
                 "--mel_path", mel_path, "--out_wav", out_wav,
                 "--tiny"]) == 0
    sr, audio = wavfile.read(out_wav)
    assert sr == 22050 and len(audio) == 4 * 256

    out_wav2 = os.path.join(root, "student.wav")
    assert main(["synthesize-student", "--checkpoint", student_ckpt,
                 "--teacher_checkpoint", teacher_ckpt,
                 "--mel_path", mel_path, "--out_wav", out_wav2,
                 "--tiny"]) == 0
    sr2, audio2 = wavfile.read(out_wav2)
    assert sr2 == 22050 and len(audio2) == 4 * 256

    out_wav3 = os.path.join(root, "flow.wav")
    assert main(["synthesize-flow",
                 "--checkpoint", os.path.join(ckpt_dir, "flow_best.pkl"),
                 "--mel_path", mel_path, "--out_wav", out_wav3,
                 "--tiny"]) == 0
    sr3, audio3 = wavfile.read(out_wav3)
    assert sr3 == 22050 and len(audio3) == 4 * 256


@pytest.mark.slow
def test_cli_train_teacher_bf16_data_parallel(tmp_path):
    """--bf16 --data_parallel: mixed precision over the full device mesh."""
    root = _mini_ljspeech(str(tmp_path))
    data = os.path.join(root, "lj")
    assert main(["preprocess", "--in_dir", root, "--out_dir", data]) == 0
    ckpt_dir = os.path.join(root, "ckpt")
    assert main(["train-teacher", "--data_root", data,
                 "--checkpoint_dir", ckpt_dir, "--epochs", "1",
                 "--batch_size", "8", "--tiny", "--bf16",
                 "--data_parallel"]) == 0
    assert os.path.isfile(os.path.join(ckpt_dir, "teacher_best.pkl"))


@pytest.mark.slow
def test_example_serve_vocoder_flow(tmp_path):
    """Train a tiny flow via the CLI, then serve mels through the
    one-pass serving example."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    root = _mini_ljspeech(str(tmp_path))
    data = os.path.join(root, "lj")
    assert main(["preprocess", "--in_dir", root, "--out_dir", data]) == 0
    ckpt_dir = os.path.join(root, "ckpt")
    assert main(["train-flow", "--data_root", data,
                 "--checkpoint_dir", ckpt_dir, "--epochs", "1",
                 "--batch_size", "2", "--tiny"]) == 0

    mel_full = np.load(os.path.join(
        data, sorted(f for f in os.listdir(data) if "mel" in f)[0]))
    mels = []
    for i, n in enumerate((4, 3)):
        p = os.path.join(root, f"mel{i}.npy")
        np.save(p, mel_full[:n])
        mels.append(p)

    import serve_vocoder
    out_dir = os.path.join(root, "synth")
    assert serve_vocoder.main(
        ["--kind", "flowavenet",
         "--checkpoint", os.path.join(ckpt_dir, "flow_best.pkl"),
         "--mels", *mels, "--out_dir", out_dir,
         "--buckets", "4", "--tiny"]) == 0
    for i, n in enumerate((4, 3)):
        sr, audio = wavfile.read(os.path.join(out_dir, f"mel{i}.wav"))
        assert sr == 22050 and len(audio) == n * 256


@pytest.mark.slow
def test_cli_train_teacher_resume(tmp_path):
    """--resume restores state + histories and continues from the next
    epoch (reference --load_step, clarinet train.py:261-266)."""
    import numpy as np
    root = _mini_ljspeech(str(tmp_path))
    data = os.path.join(root, "lj")
    assert main(["preprocess", "--in_dir", root, "--out_dir", data]) == 0
    ckpt_dir = os.path.join(root, "ckpt")
    assert main(["train-teacher", "--data_root", data,
                 "--checkpoint_dir", ckpt_dir, "--epochs", "2",
                 "--batch_size", "2", "--tiny"]) == 0
    hist1 = np.load(os.path.join(ckpt_dir, "teacher_train.npy"))
    assert hist1.shape == (2,)
    # resume from epoch-1 checkpoint, train to epoch 3
    assert main(["train-teacher", "--data_root", data,
                 "--checkpoint_dir", ckpt_dir, "--epochs", "3",
                 "--batch_size", "2", "--tiny",
                 "--resume", os.path.join(ckpt_dir, "teacher_1.pkl")]) == 0
    hist2 = np.load(os.path.join(ckpt_dir, "teacher_train.npy"))
    assert hist2.shape == (3,)
    np.testing.assert_allclose(hist2[:2], hist1)
