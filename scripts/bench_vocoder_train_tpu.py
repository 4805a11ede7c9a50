"""Vocoder TRAINING step throughput on TPU at the reference operating
points (ksw0306 defaults): ClariNet teacher batch 8 x 6400 samples,
IAF-student distillation batch 8 x 6400, FloWaveNet MLE batch 2 x 15872
(reference src/clarinet/data.py:33, src/flow_wavenet/data.py:30).

Methodology per RESULTS.md: steps chained on-device with lax.scan (the
jitted step inlines), one host fetch bounds the run.  Params enter as jit
arguments via the carried state (never captured constants).

Usage: python scripts/bench_vocoder_train_tpu.py [teacher|student|flow|all]
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


def time_steps(step, state, batch, iters=3):
    @jax.jit
    def run(state, batch):
        def body(s, _):
            s, out = step(s, batch)
            return s, None
        s, _ = jax.lax.scan(body, state, None, length=iters)
        return s
    out = run(state, batch)
    float(out.step)  # host fetch bounds compile+run
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(run(state, batch).step)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def make_batch(B, T, cin, hop=256, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": jnp.asarray(rng.standard_normal((B, T, 1)).astype(np.float32)
                         * 0.1),
        "c": jnp.asarray(rng.standard_normal(
            (B, T // hop, cin)).astype(np.float32)),
    }


def bench_teacher(B=8, T=6400, dtype=None):
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init)
    from vqvae_speech_tpu.train.vocoder import (
        make_teacher_train_step, make_vocoder_optimizer, create_vocoder_state)
    cfg = GaussianWaveNetConfig()
    opt = make_vocoder_optimizer(1e-3, 10.0)
    state = create_vocoder_state(
        jax.random.PRNGKey(1),
        gaussian_wavenet_init(jax.random.PRNGKey(0), cfg), opt)
    dt = time_steps(make_teacher_train_step(cfg, opt, compute_dtype=dtype),
                    state, make_batch(B, T, cfg.cin_channels))
    return {"ms_per_step": round(dt * 1e3, 2),
            "samples_per_s": round(B * T / dt, 0), "batch": B, "T": T}


def bench_student(B=8, T=6400, dtype=None):
    from vqvae_speech_tpu.models.clarinet import (
        GaussianWaveNetConfig, gaussian_wavenet_init,
        StudentConfig, wavenet_student_init)
    from vqvae_speech_tpu.train.vocoder import (
        make_student_train_step, make_vocoder_optimizer, create_vocoder_state)
    t_cfg, s_cfg = GaussianWaveNetConfig(), StudentConfig()
    t_params = gaussian_wavenet_init(jax.random.PRNGKey(0), t_cfg)
    opt = make_vocoder_optimizer(5e-4, 10.0)
    state = create_vocoder_state(
        jax.random.PRNGKey(2),
        wavenet_student_init(jax.random.PRNGKey(1), s_cfg), opt)
    dt = time_steps(
        make_student_train_step(t_cfg, s_cfg, t_params, opt,
                                compute_dtype=dtype),
        state, make_batch(B, T, t_cfg.cin_channels))
    return {"ms_per_step": round(dt * 1e3, 2),
            "samples_per_s": round(B * T / dt, 0), "batch": B, "T": T}


def bench_flow(B=2, T=15872, dtype=None):
    from vqvae_speech_tpu.models.flowavenet import (
        FlowavenetConfig, flowavenet_init)
    from vqvae_speech_tpu.train.vocoder import (
        make_flow_train_step, make_vocoder_optimizer, create_vocoder_state)
    cfg = FlowavenetConfig()
    opt = make_vocoder_optimizer(1e-3, 1.0)
    state = create_vocoder_state(
        jax.random.PRNGKey(1),
        flowavenet_init(jax.random.PRNGKey(0), cfg), opt)
    dt = time_steps(make_flow_train_step(cfg, opt, compute_dtype=dtype),
                    state, make_batch(B, T, cfg.cin_channel))
    return {"ms_per_step": round(dt * 1e3, 2),
            "samples_per_s": round(B * T / dt, 0), "batch": B, "T": T}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rest = sys.argv[2:]
    dtype = None
    if "bf16" in rest:
        rest.remove("bf16")
        dtype = jnp.bfloat16
    extra = [int(a) for a in rest]
    if dtype is not None:
        defaults = {"teacher": [8, 6400], "student": [8, 6400],
                    "flow": [2, 15872]}
        extra = (extra if extra else defaults.get(which, [])) + [dtype]
    for name, fn in [("teacher", bench_teacher), ("student", bench_student),
                     ("flow", bench_flow)]:
        if which not in ("all", name):
            continue
        try:
            res = fn(*extra) if which == name and extra else fn()
        except Exception as e:  # pragma: no cover - report, keep going
            res = {"error": repr(e)[:300]}
        print(json.dumps({name: res}), flush=True)
