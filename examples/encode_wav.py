"""Encode a wav file to VQ code indices with a trained checkpoint.

Usage:
    python examples/encode_wav.py --wav path.wav \
        --experiments_path experiments --experiment_name baseline \
        [--normalizer_path data/vctk/vctk-mfcc-stats.pickle] [--out codes.npy]

Prints the code sequence (one latent code per 20 ms) and optionally saves it.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def encode_wav(wav_path, configuration, params, state, normalizer=None):
    """wav file -> (codes (T_lat,), features (T, C))."""
    import jax
    import jax.numpy as jnp

    from vqvae_speech_tpu.data.audio import load_and_preprocess, pad_or_random_crop
    from vqvae_speech_tpu.ops import speech_features
    from vqvae_speech_tpu.models import conv_vqvae_encode

    cfg = configuration
    audio, _ = load_and_preprocess(wav_path, cfg["sampling_rate"],
                                   cfg["top_db"])
    audio, _ = pad_or_random_crop(audio, cfg["length"] + 1,
                                  np.random.default_rng(0))
    feats = np.asarray(speech_features(
        cfg["input_features_type"], jnp.asarray(audio[None]),
        cfg["sampling_rate"], cfg["input_features_filters"], True),
        np.float32)
    if normalizer is not None:
        feats = ((feats - normalizer["train_mean"])
                 / normalizer["train_std"]).astype(np.float32)
    out = conv_vqvae_encode(params, state, jnp.asarray(feats), cfg,
                            training=False)
    codes = np.asarray(out.indices.reshape(1, -1))[0]
    return codes, feats[0]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wav", required=True)
    p.add_argument("--experiments_path", default="experiments")
    p.add_argument("--experiment_name", default="baseline")
    p.add_argument("--normalizer_path", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from vqvae_speech_tpu.train.config import (
        load_configuration, frozen_configuration_path)
    from vqvae_speech_tpu.train.checkpoint import (
        latest_checkpoint_epoch, load_checkpoint)
    from vqvae_speech_tpu.train.experiment import _as_jax_tree
    from vqvae_speech_tpu.data import load_normalizer

    cfg = load_configuration(frozen_configuration_path(
        args.experiments_path, args.experiment_name))
    epoch, ckpt_path = latest_checkpoint_epoch(args.experiments_path,
                                               args.experiment_name)
    if ckpt_path is None:
        raise SystemExit(f"no checkpoint for '{args.experiment_name}' "
                         f"under '{args.experiments_path}'")
    ckpt = load_checkpoint(ckpt_path)
    params = _as_jax_tree(ckpt["params"])
    state = _as_jax_tree(ckpt["model_state"])
    normalizer = None
    norm_path = args.normalizer_path or (
        cfg["normalizer_path"] if cfg.get("normalize") else None)
    if norm_path:
        normalizer = load_normalizer(norm_path)

    codes, _ = encode_wav(args.wav, cfg, params, state, normalizer)
    print(f"epoch {epoch} checkpoint; {len(codes)} codes "
          f"(one per {2 * 10} ms):")
    print(" ".join(str(int(c)) for c in codes))
    if args.out:
        np.save(args.out, codes)
        print(f"saved -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
