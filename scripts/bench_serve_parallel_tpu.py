"""End-to-end BucketedParallelSynthesisServer latency on hardware: mixed
mel lengths, bucketed static-shape launches, wall-clock per batch of
requests (includes host padding, dispatch and fetch through the tunnel).

Usage: python scripts/bench_serve_parallel_tpu.py [n_requests]
"""
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp


def main(n=32):
    from vqvae_speech_tpu.serve import BucketedParallelSynthesisServer
    from vqvae_speech_tpu.models.flowavenet import (
        FlowavenetConfig, flowavenet_init)

    cfg = FlowavenetConfig()
    params = flowavenet_init(jax.random.PRNGKey(0), cfg)
    srv = BucketedParallelSynthesisServer(
        "flowavenet", params, cfg, frame_buckets=(32, 62), max_batch=8,
        compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    conds = [rng.standard_normal(
        (int(rng.integers(16, 63)), 80)).astype(np.float32)
        for _ in range(n)]

    t0 = time.perf_counter()
    out = srv.synthesize(conds, seed=0)
    compile_and_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = srv.synthesize(conds, seed=1)
    warm = time.perf_counter() - t0
    total_samples = sum(len(r.wave) for r in out)

    print(json.dumps({"flow_parallel_server": {
        "n_requests": n,
        "first_call_s": round(compile_and_first, 1),
        "warm_batch_s": round(warm, 3),
        "samples_served": total_samples,
        "warm_samples_per_s": round(total_samples / warm, 0),
        "launches": srv.stats["launches"],
        "buckets": srv.stats["compiled_buckets"]}}), flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
