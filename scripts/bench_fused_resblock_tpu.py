"""Measure the fused Pallas resblock chain vs the XLA conv chain (batch 1).

Settles VERDICT round-2 item #7: is the IAF student's batch-1 synthesis
rate architecture-bound (~34% MFU estimate in RESULTS.md) or fusion-bound?
Runs ONE 6-layer gated resblock chain at student scale (C=128, G=256,
S=128, cin=80) both ways, all-VMEM fused vs XLA lax.conv chain, bf16,
batch 1.  Iterations are chained with lax.scan and bounded by a host fetch
(block_until_ready lies under the tunnel).

Usage: python scripts/bench_fused_resblock_tpu.py [--t 4096] [--iters 50]
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
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--layers", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vqvae_speech_tpu.models.clarinet.modules import (
        resblock_init, resblock_apply)
    from vqvae_speech_tpu.ops.fused_resblock import (
        stack_block_weights, fused_block_chain)

    L, k, C, G, S, cin, T = args.layers, 3, 128, 256, 128, 80, args.t
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, L + 2)
    blocks = [resblock_init(ks[i], C, G, S, k, cin) for i in range(L)]
    x = jax.random.normal(ks[-2], (1, T, C), jnp.float32).astype(
        jnp.bfloat16)
    c = jax.random.normal(ks[-1], (1, T, cin), jnp.float32).astype(
        jnp.bfloat16)

    bblocks = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16), blocks)

    def xla_chain(blocks, xb, cb):
        h, skip = xb, 0.0
        for l, p in enumerate(blocks):
            h, s = resblock_apply(p, h, cb, k, k ** l, causal=True)
            skip = skip + s
        return h, skip

    stacked = stack_block_weights(blocks, compute_dtype=jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_xla(blocks, xb, cb, iters):
        def body(carry, _):
            h, s = xla_chain(blocks, carry, cb)
            return h, jnp.sum(s)
        out, sums = jax.lax.scan(body, xb, None, length=iters)
        return out, sums

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_fused(stacked, xb, cb, iters):
        c2 = cb[0]                       # kernel is batch-1 (T, cin)
        def body(carry, _):
            h, s = fused_block_chain(carry, c2, stacked, layers=L,
                                     kernel_size=k)
            return h, jnp.sum(s)
        out, sums = jax.lax.scan(body, xb[0], None, length=iters)
        return out, sums

    # correctness on-device first
    fx, fs = fused_block_chain(x[0], c[0], stacked, layers=L, kernel_size=k)
    wx, ws = xla_chain(bblocks, x, c)
    cos = float(np.asarray(fx, np.float32).ravel() @
                np.asarray(wx[0], np.float32).ravel()
                / (np.linalg.norm(np.asarray(fx, np.float32)) *
                   np.linalg.norm(np.asarray(wx[0], np.float32)) + 1e-12))
    print(json.dumps({"device_cosine_fused_vs_xla": round(cos, 6)}),
          flush=True)

    results = {}
    flops_per_iter = (  # dense FLOPs in one chain pass
        L * (2 * k * C * G            # filter+gate dilated convs
             + 2 * cin * G            # conditioning 1x1s
             + G // 2 * 0             # (gate split not used here: G is out)
             + G * C + G * S) * 2 * T)
    for name, fn, arg in (("xla", run_xla, bblocks),
                          ("fused", run_fused, stacked)):
        out, sums = fn(arg, x, c, iters=args.iters)
        float(jnp.sum(sums))  # warm/compile + fetch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out, sums = fn(arg, x, c, iters=args.iters)
            float(jnp.sum(sums))
            best = min(best, time.perf_counter() - t0)
        us_per_chain = best / args.iters * 1e6
        tflops = flops_per_iter / (best / args.iters) / 1e12
        results[name] = {"us_per_chain": round(us_per_chain, 1),
                         "tflops": round(tflops, 1)}
        print(json.dumps({name: results[name]}), flush=True)

    results["speedup_fused_over_xla"] = round(
        results["xla"]["us_per_chain"] / results["fused"]["us_per_chain"], 3)
    results["config"] = {"T": T, "layers": L, "C": C, "G": G, "S": S,
                         "cin": cin, "dtype": "bf16", "batch": 1}
    print(json.dumps(results))
    os.makedirs("fused_resblock_bench", exist_ok=True)
    with open("fused_resblock_bench/summary.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
