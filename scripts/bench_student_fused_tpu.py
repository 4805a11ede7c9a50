"""End-to-end IAF student one-pass synthesis: fused Pallas chains vs XLA.

The production follow-up to bench_fused_resblock_tpu.py: measures the full
``wavenet_student_generate`` (4 flows, blocks (1,1,1,4) = 7 six-layer
chains, front/head/IAF composition included) at batch 1, bf16, serving
length — the single-stream latency case the fused path targets.  The
fused path runs fused_block_chain_tiled (VMEM-resident tails across time
tiles, zero recompute) so T is NOT VMEM-bounded.

Iterations chain with lax.scan and are bounded by a host fetch
(block_until_ready lies under the axon tunnel).

Usage: python scripts/bench_student_fused_tpu.py [--t 20480] [--iters 20]
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
    ap.add_argument("--t", type=int, default=20480,
                    help="samples (default: the 80-mel-frame bucket)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="fused_resblock_bench")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    from vqvae_speech_tpu.models.clarinet import (
        StudentConfig, wavenet_student_init, wavenet_student_generate)

    cfg = StudentConfig()        # flagship: 128/256/128, blocks (1,1,1,4)
    params = wavenet_student_init(jax.random.PRNGKey(0), cfg)
    T = args.t
    z = jax.random.normal(jax.random.PRNGKey(1), (1, T, 1), jnp.float32)
    c_up = jax.random.normal(jax.random.PRNGKey(2), (1, T, cfg.cin_channels),
                             jnp.float32)

    @functools.partial(jax.jit, static_argnames=("fused", "iters"))
    def run(params, z, c_up, fused, iters):
        def body(carry, _):
            x = wavenet_student_generate(params, cfg, carry, c_up,
                                         compute_dtype=jnp.bfloat16,
                                         use_fused=fused)
            return x, jnp.sum(x)
        out, sums = jax.lax.scan(body, z, None, length=iters)
        return out, sums

    # on-device correctness first
    xf = wavenet_student_generate(params, cfg, z, c_up,
                                  compute_dtype=jnp.bfloat16, use_fused=True)
    xd = wavenet_student_generate(params, cfg, z, c_up,
                                  compute_dtype=jnp.bfloat16)
    a = np.asarray(xf, np.float32).ravel()
    b = np.asarray(xd, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    print(json.dumps({"device_cosine_fused_vs_xla": round(cos, 6)}),
          flush=True)

    results = {}
    for name, fused in (("xla", False), ("fused", True)):
        out, sums = run(params, z, c_up, fused, args.iters)
        float(jnp.sum(sums))                      # compile + fetch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out, sums = run(params, z, c_up, fused, args.iters)
            float(jnp.sum(sums))
            best = min(best, time.perf_counter() - t0)
        per = best / args.iters
        results[name] = {"ms_per_synthesis": round(per * 1e3, 2),
                         "samples_per_s": round(T / per, 0)}
        print(json.dumps({name: results[name]}), flush=True)

    results["speedup_fused_over_xla"] = round(
        results["xla"]["ms_per_synthesis"]
        / results["fused"]["ms_per_synthesis"], 3)
    results["config"] = {"T": T, "batch": 1, "dtype": "bf16",
                         "flows": list(cfg.num_blocks_student),
                         "num_layers": cfg.num_layers,
                         "C": cfg.residual_channels,
                         "G": cfg.gate_channels, "S": cfg.skip_channels}
    print(json.dumps({"student_e2e": results}))
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "student_e2e.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
