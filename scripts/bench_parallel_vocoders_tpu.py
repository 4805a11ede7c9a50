"""Throughput of the PARALLEL (single-pass) vocoders on TPU: ClariNet IAF
student generation and FloWaveNet reverse sampling.

These are the reference's fast-synthesis paths (ksw0306 vendored trainers,
SURVEY.md 2.6/2.7); unlike the AR WaveNet scan they are one feed-forward
pass, so on TPU they should run at MXU-bound rates.  Methodology per
RESULTS.md: scan-chained iterations, host-fetch bounded.

Usage: python scripts/bench_parallel_vocoders_tpu.py [T] [batch]
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


def timeit(fn, args, iters=3):
    """args[0] gets a per-iteration gain nudge so the scan can't be CSE'd.
    Model params MUST be in `args` (not closed over): captured param trees
    become XLA constants and the in-model jnp.stack over flow params then
    constant-folds for minutes at compile time."""
    @jax.jit
    def loop(*xs):
        def body(c, g):
            out = fn(xs[0] * g, *xs[1:])
            return c + jnp.sum(out[0, :2].astype(jnp.float32)), None
        gains = 1.0 + 1e-6 * jnp.arange(iters, dtype=jnp.float32)
        t, _ = jax.lax.scan(body, jnp.float32(0), gains)
        return t
    float(loop(*args))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_clarinet_student(T, B):
    """LJSpeech-scale IAF student (the clarinet repo's config_student):
    6 IAF flows x 10-layer Gaussian WaveNets, 128 residual/gate, 80-mel."""
    from vqvae_speech_tpu.models.clarinet import (
        StudentConfig, wavenet_student_init, wavenet_student_generate)

    cfg = StudentConfig()  # ksw0306 config_student defaults (cin 80)
    params = wavenet_student_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((B, T, 1)).astype(np.float32))
    c_up = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    dt = timeit(lambda zz, cc, pp: wavenet_student_generate(
                    pp, cfg, zz, cc, compute_dtype=DTYPE),
                (z, c_up, params))
    return B * T / dt


def bench_flowavenet(T, B):
    """FloWaveNet paper scale: 8 blocks x 6 flows, 2-layer WaveNets,
    256 channels, squeeze x2 per block."""
    from vqvae_speech_tpu.models.flowavenet import (
        FlowavenetConfig, flowavenet_init, flowavenet_reverse)

    cfg = FlowavenetConfig()  # paper scale: 8 blocks x 6 flows, 256 filters
    params = flowavenet_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((B, T, 1)).astype(np.float32) * 0.8)
    # mel-rate conditioning; flowavenet_reverse upsamples via (16,16) convT
    c = jnp.asarray(rng.standard_normal((B, T // 256, 80)).astype(np.float32))
    dt = timeit(lambda zz, cc, pp: flowavenet_reverse(
                    pp, cfg, zz, cc, compute_dtype=DTYPE),
                (z, c, params))
    return B * T / dt


DTYPE = None


def main(T=15872, B=1, which="both"):
    out = {}
    todo = [("clarinet_iaf_student", bench_clarinet_student),
            ("flowavenet_reverse", bench_flowavenet)]
    if which != "both":
        todo = [t for t in todo if which in t[0]]
    for name, fn in todo:
        try:
            sps = fn(T, B)
            out[name] = {"samples_per_s": round(sps, 0), "T": T, "batch": B}
        except Exception as e:  # pragma: no cover - report, keep going
            out[name] = {"error": repr(e)[:300]}
        print(json.dumps({name: out[name]}), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    if "bf16" in args:
        args.remove("bf16")
        DTYPE = jnp.bfloat16
    which = args.pop() if args and not args[-1].isdigit() else "both"
    main(*(int(a) for a in args), which=which)
