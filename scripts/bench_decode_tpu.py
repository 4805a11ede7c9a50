"""Single-stream autoregressive WaveNet decode benchmark on hardware.

Measures samples/s at vctk_wavenet.yaml scale for each decode configuration
(f32, fused Pallas stack, bf16, int8 weight-only per-channel and blockwise).
All timings are bounded by a host fetch (block_until_ready does
not bound execution under this image's remote-TPU tunnel — RESULTS.md).

Usage: python scripts/bench_decode_tpu.py [T] [configs...]
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

from vqvae_speech_tpu.models.wavenet import (
    WaveNetConfig, wavenet_init, wavenet_incremental_generate)

CFG = WaveNetConfig(
    out_channels=256, layers=20, stacks=2, residual_channels=768,
    gate_channels=1536, skip_out_channels=256, kernel_size=3, dropout=0.0,
    cin_channels=64, gin_channels=0, n_speakers=0,
    upsample_conditional_features=True, upsample_scales=(2, 2, 2, 2, 2, 12),
)

CONFIGS = {
    "f32": {},
    "fused": dict(use_fused_stack=True),
    "bf16": dict(compute_dtype=jnp.bfloat16),
    "int8": dict(weight_quant="int8"),
    "int8_block": dict(weight_quant="int8_block"),
    # NOTE: an "int8_fused" row (int8 + use_fused_stack) existed in rounds
    # 1-2 and was REMOVED with the kernel: the plain int8 scan runs at ~95%
    # of the HBM streaming floor (RESULTS.md roofline) and the generate path
    # now asserts the composition away.
}


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 3840
    names = sys.argv[2:] or list(CONFIGS)
    unknown = [n for n in names if n not in CONFIGS]
    if unknown:
        valid = ", ".join(CONFIGS)
        for n in unknown:
            note = (" ('int8_fused' was removed with the dead int8 fused "
                    "kernel — the plain int8 scan runs at ~95% of the HBM "
                    "streaming floor, see RESULTS.md)"
                    if n == "int8_fused" else "")
            print(f"unknown config {n!r}{note}; valid: {valid}",
                  file=sys.stderr)
        raise SystemExit(2)
    params = wavenet_init(jax.random.PRNGKey(0), CFG)
    up = int(np.prod(CFG.upsample_scales))
    c = jax.random.normal(jax.random.PRNGKey(1), (1, T // up, CFG.cin_channels))

    results = {}
    for name in names:
        kw = CONFIGS[name]
        outs, em = wavenet_incremental_generate(
            params, CFG, jax.random.PRNGKey(2), T, c=c, sample=True, **kw)
        np.asarray(em)  # warm + compile + full fetch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs, em = wavenet_incremental_generate(
                params, CFG, jax.random.PRNGKey(2), T, c=c, sample=True, **kw)
            np.asarray(em)  # host fetch bounds completion
            best = min(best, time.perf_counter() - t0)
        results[name] = round(T / best, 1)
        print(json.dumps({"config": name, "samples_per_s": results[name],
                          "ms_per_step": round(best / T * 1e3, 4)}),
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
