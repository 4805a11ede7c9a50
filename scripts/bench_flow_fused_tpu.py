"""End-to-end FloWaveNet one-pass synthesis: fused Pallas chains vs XLA.

Companion to bench_student_fused_tpu.py for the flow vocoder: measures
``flowavenet_reverse`` at paper scale (8 blocks x 6 flows, filter 256,
T=15872 — the reference flow_wavenet/synthesize.py operating point) at
batch 1, bf16, the single-stream latency case.  The fused path runs
``fused_block_chain_nc`` (non-causal halo windows) on every block whose
conditioning width keeps the weight stack VMEM-resident (blocks 0-3,
~94% of the resblock FLOPs; channel doubling under squeeze makes late
blocks wide but exponentially shorter).

Iterations chain with lax.scan and are bounded by a host fetch
(block_until_ready lies under the axon tunnel).

Usage: python scripts/bench_flow_fused_tpu.py [--t 15872] [--iters 10]
"""
import argparse
import functools
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=15872)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="fused_resblock_bench")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vqvae_speech_tpu.models.flowavenet import (
        FlowavenetConfig, flowavenet_init, flowavenet_reverse,
        flowavenet_upsample)

    cfg = FlowavenetConfig()     # paper scale: 8 blocks x 6 flows, 256
    params = flowavenet_init(jax.random.PRNGKey(0), cfg)
    T = args.t
    Tc = T // 256
    z = jax.random.normal(jax.random.PRNGKey(1), (1, T, 1), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(2), (1, Tc, cfg.cin_channel),
                          jnp.float32)

    @functools.partial(jax.jit, static_argnames=("fused", "iters"))
    def run(params, z, c, fused, iters):
        c_up = flowavenet_upsample(params, c, cfg)

        def body(carry, _):
            x = flowavenet_reverse(params, cfg, carry, c_up,
                                   compute_dtype=jnp.bfloat16,
                                   use_fused=fused)
            return carry, jnp.sum(x)
        _, sums = jax.lax.scan(body, z, None, length=iters)
        return sums

    # on-device fidelity first: each bf16 path vs the f32 reference
    ref = np.asarray(flowavenet_reverse(params, cfg, z, c),
                     np.float32).ravel()
    xla = np.asarray(flowavenet_reverse(params, cfg, z, c,
                                        compute_dtype=jnp.bfloat16),
                     np.float32).ravel()
    fus = np.asarray(flowavenet_reverse(params, cfg, z, c,
                                        compute_dtype=jnp.bfloat16,
                                        use_fused=True),
                     np.float32).ravel()

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    fid = {"cos_xla_bf16_vs_f32": round(cos(xla, ref), 5),
           "cos_fused_bf16_vs_f32": round(cos(fus, ref), 5),
           "cos_fused_vs_xla_bf16": round(cos(fus, xla), 5)}
    print(json.dumps(fid), flush=True)

    results = {"fidelity": fid}
    for name, fused in (("xla", False), ("fused", True)):
        sums = run(params, z, c, fused, args.iters)
        float(jnp.sum(sums))                      # compile + fetch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sums = run(params, z, c, fused, args.iters)
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
                         "n_block": cfg.n_block, "n_flow": cfg.n_flow,
                         "n_layer": cfg.n_layer,
                         "filter_size": cfg.filter_size}
    print(json.dumps({"flow_e2e": results}))
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "flow_e2e.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
