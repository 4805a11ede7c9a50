"""AR serving operating curve: BucketedSynthesisServer across batch x quant.

VERDICT round-2 item #6: commit the operating curve for the AR WaveNet
serving tier — samples/s/stream and per-request latency at B = 1/8/16/32
for bf16 and int8 weight-only — and name a recommended serving point.

All timings host-fetch bounded (the server returns numpy waves, which
bounds device completion under the tunnel).  vctk_wavenet.yaml scale.

Usage: python scripts/bench_serve_ar_tpu.py [--t 3840] [--batches 1,8,16,32]
Writes serving_curve/summary.json.
"""
import argparse
import itertools
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=3840)
    ap.add_argument("--batches", default="1,8,16,32")
    ap.add_argument("--quants", default="bf16,int8,int8_block")
    ap.add_argument("--out", default="serving_curve")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vqvae_speech_tpu.models.wavenet import WaveNetConfig, wavenet_init
    from vqvae_speech_tpu.serve import BucketedSynthesisServer

    cfg = WaveNetConfig(
        out_channels=256, layers=20, stacks=2, residual_channels=768,
        gate_channels=1536, skip_out_channels=256, kernel_size=3,
        dropout=0.0, cin_channels=64, gin_channels=0, n_speakers=0,
        upsample_conditional_features=True,
        upsample_scales=(2, 2, 2, 2, 2, 12))
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    up = int(np.prod(cfg.upsample_scales))
    frames = args.t // up
    T = frames * up

    rows = []
    for B, quant in itertools.product(
            (int(b) for b in args.batches.split(",")),
            args.quants.split(",")):
        kw = (dict(compute_dtype=jnp.bfloat16) if quant == "bf16"
              else dict(weight_quant=quant))
        server = BucketedSynthesisServer(
            params, cfg, frame_buckets=(frames,), max_batch=B, sample=True,
            **kw)
        conds = [np.random.default_rng(i).standard_normal(
            (frames, cfg.cin_channels)).astype(np.float32)
            for i in range(B)]
        server.synthesize(conds)          # warm: compile + weight prep
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            waves = server.synthesize(conds)
            dt = time.perf_counter() - t0
            assert len(waves) == B and waves[0].wave.shape[0] == T
            best = min(best, dt)
        row = {
            "batch": B, "quant": quant,
            "request_latency_s": round(best, 3),
            "samples_per_s_per_stream": round(T / best, 1),
            "samples_per_s_total": round(B * T / best, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # recommended point: highest total throughput whose per-stream rate
    # still exceeds realtime (16 kHz)
    realtime = [r for r in rows if r["samples_per_s_per_stream"] >= 16000]
    rec = max(realtime or rows, key=lambda r: r["samples_per_s_total"])
    summary = {"platform": jax.devices()[0].platform,
               "gen_samples": T, "rows": rows, "recommended": rec}
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
        f.write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
