"""Input-type predicates + hparams builder (reference util.py:31-51,
builder.py:31-68) and eval plotting utils (reference evaluation/utils.py)."""
import os

import numpy as np
import jax

from vqvae_speech_tpu.models.wavenet.util import (
    is_mulaw_quantize, is_mulaw, is_raw, is_scalar_input,
    build_wavenet_from_hparams)
from vqvae_speech_tpu.models.wavenet.model import wavenet_apply


def test_input_type_predicates():
    # reference util.py:31-51 — exact string dispatch
    assert is_mulaw_quantize("mulaw-quantize")
    assert not is_mulaw_quantize("mulaw")
    assert is_mulaw("mulaw") and not is_mulaw("mulaw-quantize")
    assert is_raw("raw") and not is_raw("mulaw")
    assert is_scalar_input("raw") and is_scalar_input("mulaw")
    assert not is_scalar_input("mulaw-quantize")


def test_builder_categorical_mode():
    params, cfg = build_wavenet_from_hparams(
        jax.random.PRNGKey(0),
        {"input_type": "mulaw-quantize", "layers": 4, "stacks": 2,
         "residual_channels": 16, "gate_channels": 16,
         "skip_out_channels": 16, "out_channels": 256})
    assert not cfg.scalar_input
    assert cfg.out_channels == 256
    x = jax.nn.one_hot(np.zeros((2, 32), np.int32), 256)
    y = wavenet_apply(params, cfg, x)
    assert y.shape == (2, 32, 256)
    assert np.isfinite(np.asarray(y)).all()


def test_builder_scalar_mode_defaults_to_mixture_channels():
    params, cfg = build_wavenet_from_hparams(
        jax.random.PRNGKey(0),
        {"input_type": "raw", "layers": 2, "stacks": 1,
         "residual_channels": 8, "gate_channels": 8, "skip_out_channels": 8})
    assert cfg.scalar_input
    assert cfg.out_channels == 30  # 10 mixtures x (logit, mean, log_scale)
    y = wavenet_apply(params, cfg, np.zeros((1, 16, 1), np.float32))
    assert y.shape == (1, 16, 30)


def test_rand_cmap_distinct_colors():
    from vqvae_speech_tpu.eval.utils import rand_cmap
    n = 44
    cmap = rand_cmap(n, seed=3)
    cols = cmap(np.linspace(0, 1, n))
    # all sampled colors distinct (the reference's whole point: adjacent
    # cluster labels must not share a color)
    assert len({tuple(np.round(c, 6)) for c in map(tuple, cols)}) == n
    # deterministic under the same seed
    cols2 = rand_cmap(n, seed=3)(np.linspace(0, 1, n))
    np.testing.assert_array_equal(cols, cols2)


def test_build_gif(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from vqvae_speech_tpu.eval.utils import build_gif

    paths = []
    for i in range(3):
        fig = plt.figure(figsize=(2, 2))
        plt.plot([0, 1], [i, 1])
        p = str(tmp_path / f"f{i}.png")
        fig.savefig(p)
        plt.close(fig)
        paths.append(p)
    out = build_gif(paths, str(tmp_path / "anim.gif"), fps=2)
    assert os.path.exists(out) and os.path.getsize(out) > 0
