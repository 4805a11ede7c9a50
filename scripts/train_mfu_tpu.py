"""Train-step MFU attribution for the flagship trainer (VERDICT r3 #7).

The encode path has an exact-FLOP roofline (86% of bf16 peak at batch 1024,
RESULTS.md); this script gives the FULL train step the same treatment:

* FLOPs for forward+backward+Adam from XLA's own cost model
  (``compiled.cost_analysis()['flops']`` — counts matmul/conv/elementwise
  of the exact HLO that runs), cross-checked against the analytic encoder
  count (708.3 GFLOP at B=1024 => 0.6917 GFLOP/utterance, RESULTS.md),
* measured ms/step with the RESULTS.md methodology (steps scan-chained
  into ONE device program, host fetch bounds completion — under the axon
  tunnel ``block_until_ready`` returns early, see bench.py),
* MFU against the 197 TFLOP/s bf16 MXU peak (XLA's default f32 matmul
  path uses bf16 passes with f32 accumulation on v5e — the same
  convention as the encode roofline),
* the optimizer bound: Adam-amsgrad traffic = 9 HBM arrays per parameter
  per step (read p,g,m,v,vhat; write p,m,v,vhat) at ~819 GB/s v5e HBM BW,
  which dominates when the per-step matmul work is small (batch 64).

Writes train_mfu/summary.json.  Reference being attributed: the
ConvolutionalTrainer step (reference convolutional_trainer.py:44-74 runs
~7 framework calls per step; ours is ONE compiled program).

Round-5 extension (VERDICT r4 weak #4): a batch-2 row — the reference's
flagship operating point (experiments_vq44-mfcc39.json batch_size 2) and the
regime every quality gate trains in — plus an attribution that separates
* device-side step time (scan-chained, the usual methodology),
* fwd+bwd-only and Adam-update-only device time at batch 2 (which of
  compute vs optimizer HBM traffic owns the device step), and
* the REAL per-step dispatch loop (one host dispatch per step, prefetched
  constant batch — what ConvolutionalTrainer.train actually does), whose
  gap vs the scan-chained number is the host/tunnel dispatch overhead.

Usage: python scripts/train_mfu_tpu.py [iters]
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
import optax

from bench import FRAMES, NUMCEP, HID, EMB_DIM, CODES, N_RES

BF16_PEAK = 197e12          # v5e MXU bf16 peak (RESULTS.md convention)
HBM_BW = 819e9              # v5e HBM bandwidth
ADAM_ARRAYS = 9             # amsgrad: read p,g,m,v,vhat / write p,m,v,vhat


def make_cfg(batch):
    return dict(
        batch_size=batch, learning_rate=2e-4, num_hiddens=HID,
        embedding_dim=EMB_DIM, num_embeddings=CODES, commitment_cost=0.25,
        decay=0.0, num_residual_layers=N_RES, residual_channels=HID,
        use_kaiming_normal=False, use_jitter=True, jitter_probability=0.12,
        use_speaker_conditioning=False, input_features_dim=FRAMES,
        input_features_filters=NUMCEP, augment_input_features=True,
        output_features_dim=FRAMES, output_features_filters=NUMCEP,
        augment_output_features=True, verbose=False,
    )


def main(iters=50):
    from vqvae_speech_tpu.models.conv_vqvae import conv_vqvae_init
    from vqvae_speech_tpu.train.trainer import (
        TrainState, make_optimizer, make_train_step)

    out = {"platform": jax.default_backend(), "iters": iters,
           "bf16_peak_tflops": BF16_PEAK / 1e12,
           "hbm_bw_gbs": HBM_BW / 1e9, "rows": {}}
    for batch in (2, 64, 512):
        cfg = make_cfg(batch)
        params, model_state = conv_vqvae_init(jax.random.PRNGKey(0), cfg)
        n_params = sum(int(np.prod(l.shape))
                       for l in jax.tree_util.tree_leaves(params))
        opt = make_optimizer(cfg["learning_rate"])
        state = TrainState(params, model_state, opt.init(params),
                           jax.random.PRNGKey(1))
        step = make_train_step(cfg, opt, mesh=None)

        x = jax.random.normal(jax.random.PRNGKey(2),
                              (batch, FRAMES, NUMCEP * 3), jnp.float32)
        batch_dict = {"input_features": x, "output_features": x}

        # XLA's own FLOP count of the exact step HLO
        lowered = jax.jit(lambda s, b: step(s, b)).lower(state, batch_dict)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan"))) if cost else float("nan")

        # ms/step: scan-chain `iters` steps into ONE program; vary only the
        # rng so XLA cannot hoist the step out of the loop; fetch bounds
        @jax.jit
        def run(state0, b):
            def body(s, key):
                s2, metrics = step(s._replace(rng=key), b)
                return s2, metrics["loss"]
            keys = jax.random.split(jnp.asarray(state0.rng), iters)
            s_final, losses = jax.lax.scan(body, state0, keys)
            return losses[-1], s_final.params["vq"]["codebook"][0, 0]

        loss, probe = run(state, batch_dict)
        float(loss); float(probe)       # warm + compile + fetch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loss, probe = run(state, batch_dict)
            float(loss); float(probe)
            best = min(best, time.perf_counter() - t0)
        ms_per_step = best / iters * 1e3

        mfu = flops / (ms_per_step / 1e3) / BF16_PEAK
        opt_bytes = n_params * 4 * ADAM_ARRAYS
        opt_floor_ms = opt_bytes / HBM_BW * 1e3
        row = {
            "ms_per_step": round(ms_per_step, 3),
            "xla_flops_per_step": flops,
            "gflops_per_step": round(flops / 1e9, 2),
            "effective_tflops": round(flops / (ms_per_step / 1e3) / 1e12, 2),
            "mfu_vs_bf16_peak": round(mfu, 4),
            "n_params": n_params,
            "adam_hbm_bytes": opt_bytes,
            "adam_hbm_floor_ms": round(opt_floor_ms, 3),
            "adam_floor_fraction_of_step": round(
                opt_floor_ms / ms_per_step, 4),
            "utterances_per_s": round(batch / (ms_per_step / 1e3), 1),
        }
        if batch == 2:
            # ---- attribution at the gate operating point ----
            # (a) fwd+bwd only (grads computed and reduced to a probe, no
            #     optimizer update): the compute share of the device step
            @jax.jit
            def run_fwdbwd(state0, b):
                def body(key, _):
                    key, sub = jax.random.split(key)

                    def loss_of(p):
                        # mirror the step's loss (trainer.py loss_fn)
                        from vqvae_speech_tpu.models import conv_vqvae_apply
                        o = conv_vqvae_apply(p, state0.model_state,
                                             b["input_features"], cfg,
                                             training=True, rng=sub)
                        return o.vq_loss + jnp.mean(jnp.square(
                            o.reconstructed_x - b["output_features"]))

                    g = jax.grad(loss_of)(state0.params)
                    probe = sum(jnp.sum(l) for l in
                                jax.tree_util.tree_leaves(g))
                    return key, probe
                _, probes = jax.lax.scan(body, jnp.asarray(state0.rng),
                                         None, length=iters)
                return probes[-1]

            # (b) Adam-amsgrad update only on frozen grads: the optimizer
            #     HBM-traffic share, isolated
            grads_const = jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, 1e-6), state.params)

            @jax.jit
            def run_opt(state0, g):
                def body(carry, _):
                    p, o = carry
                    upd, o2 = opt.update(g, o, p)
                    return (optax.apply_updates(p, upd), o2), upd[
                        "vq"]["codebook"][0, 0] if isinstance(
                            upd, dict) else jnp.float32(0)
                (p_f, _), probes = jax.lax.scan(
                    body, (state0.params, state0.opt_state), None,
                    length=iters)
                return p_f["vq"]["codebook"][0, 0]

            for label, fn, arg in (("fwd_bwd_only", run_fwdbwd, batch_dict),
                                   ("adam_update_only", run_opt,
                                    grads_const)):
                float(fn(state, arg))  # compile + run
                best_part = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(fn(state, arg))
                    best_part = min(best_part, time.perf_counter() - t0)
                row[f"{label}_ms"] = round(best_part / iters * 1e3, 3)

            # (c) the REAL dispatch loop: one host->device dispatch per
            #     step on a device-resident batch (what the trainer's epoch
            #     loop does, minus the data loader) — the gap vs the
            #     scan-chained ms/step is host+tunnel dispatch overhead
            dev_batch = jax.device_put(batch_dict)
            st = state
            for _ in range(5):                       # warm the dispatch path
                st, m = step(st, dev_batch)
            jax.block_until_ready(m)
            n_loop = min(iters, 50)
            t0 = time.perf_counter()
            for _ in range(n_loop):
                st, m = step(st, dev_batch)
            # bound completion by a HOST FETCH (tunnel: block_until_ready
            # returns early, bench.py note)
            float(m["loss"])
            row["dispatch_loop_ms_per_step"] = round(
                (time.perf_counter() - t0) / n_loop * 1e3, 3)
            row["dispatch_overhead_ms_per_step"] = round(
                row["dispatch_loop_ms_per_step"] - row["ms_per_step"], 3)

        out["rows"][str(batch)] = row
        print(json.dumps({str(batch): row}), flush=True)

    os.makedirs(os.path.join(REPO_ROOT, "train_mfu"), exist_ok=True)
    with open(os.path.join(REPO_ROOT, "train_mfu", "summary.json"),
              "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
