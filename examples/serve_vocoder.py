"""Serve mel -> waveform synthesis with a trained vocoder checkpoint.

Demonstrates the production one-pass serving tier
(serve.BucketedParallelSynthesisServer): mixed-length mel inputs are
bucketed into static shapes, batched, and synthesized in a single
feed-forward pass per launch (RESULTS.md: 1.0-3.2M samples/s).

Usage:
    # FloWaveNet
    python examples/serve_vocoder.py --kind flowavenet \
        --checkpoint vocoder_checkpoints/flow_best.pkl \
        --mels a.npy b.npy c.npy --out_dir synth/ [--bf16] [--tiny]

    # ClariNet IAF student (needs the teacher for mel upsampling)
    python examples/serve_vocoder.py --kind iaf_student \
        --checkpoint vocoder_checkpoints/student_best.pkl \
        --teacher_checkpoint vocoder_checkpoints/teacher_best.pkl \
        --mels a.npy b.npy --out_dir synth/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_server(args):
    import jax
    import jax.numpy as jnp

    from vqvae_speech_tpu.serve import BucketedParallelSynthesisServer
    from vqvae_speech_tpu.train.vocoder import load_vocoder_checkpoint

    compute_dtype = jnp.bfloat16 if args.bf16 else None
    ckpt = load_vocoder_checkpoint(args.checkpoint)
    as_jax = lambda t: jax.tree_util.tree_map(jnp.asarray, t)

    if args.kind == "flowavenet":
        from vqvae_speech_tpu.models.flowavenet import FlowavenetConfig
        cfg = (FlowavenetConfig(in_channel=1, cin_channel=80, n_block=2,
                                n_flow=1, n_layer=1, filter_size=8,
                                block_per_split=8, upsample_scales=(16, 16))
               if args.tiny else FlowavenetConfig())
        return BucketedParallelSynthesisServer(
            "flowavenet", as_jax(ckpt["params"]), cfg,
            frame_buckets=tuple(args.buckets), max_batch=args.max_batch,
            temp=args.temp, compute_dtype=compute_dtype)

    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, StudentConfig)
    t_ckpt = load_vocoder_checkpoint(args.teacher_checkpoint)
    if args.tiny:
        t_cfg = GaussianWaveNetConfig(
            num_blocks=1, num_layers=2, front_channels=4,
            residual_channels=8, gate_channels=8, skip_channels=8,
            kernel_size=2, cin_channels=80, upsample_scales=(16, 16))
        s_cfg = StudentConfig(num_blocks_student=(1, 1), num_layers=2,
                              front_channels=4, residual_channels=8,
                              gate_channels=8, skip_channels=8,
                              kernel_size=3, cin_channels=80)
    else:
        t_cfg, s_cfg = GaussianWaveNetConfig(), StudentConfig()
    return BucketedParallelSynthesisServer(
        "iaf_student", as_jax(ckpt["ema_params"]), s_cfg,
        teacher_params=as_jax(t_ckpt["ema_params"]), teacher_cfg=t_cfg,
        frame_buckets=tuple(args.buckets), max_batch=args.max_batch,
        temp=args.temp, compute_dtype=compute_dtype)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["flowavenet", "iaf_student"],
                    required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--teacher_checkpoint")
    ap.add_argument("--mels", nargs="+", required=True,
                    help=".npy files of (frames, 80) mels")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--buckets", nargs="+", type=int, default=[32, 64, 128])
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny test-scale model configs")
    args = ap.parse_args(argv)

    from scipy.io import wavfile

    server = build_server(args)
    conds = [np.load(p).astype(np.float32) for p in args.mels]
    results = server.synthesize(conds, seed=args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    for p, r in zip(args.mels, results):
        out = os.path.join(
            args.out_dir,
            os.path.splitext(os.path.basename(p))[0] + ".wav")
        wavfile.write(out, 22050,
                      (np.clip(r.wave, -1, 1) * 32767).astype(np.int16))
        print(f"{out}: {len(r.wave)} samples (bucket {r.bucket})")
    print("launches:", server.stats["launches"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
