"""Codebook-revival extension shared by both trainers (default OFF).

Tracks a usage EMA of per-code assignment fractions and re-seeds codes whose
usage falls below a threshold from random pre-VQ latent rows of the current
batch.  The reference explored exactly this in its standalone demos
(old/vqvae_2d_improved.py:153-169, reproduced as
models/vq_repulsion.py:reset_dead_codes); here it is lifted into the
production trainers for both VQ variants.  Adam moments of re-seeded rows
are left untouched (gradient variant), matching the demo.

Used by train/trainer.py (ConvolutionalTrainer, chip-gated 3-seed in
quality_run_flagship37_revival/) and train/wavenet_trainer.py (where the
powerful AR decoder makes the gradient-VQ codebook collapse to one code —
observed live in wavenet_vqvae_e2e/, the classic posterior-collapse mode
the reference could never hit because its WaveNetVQVAE path is untrainable,
reference pipeline_factory.py:52-53).
"""
import jax
import jax.numpy as jnp


def revival_settings(config: dict):
    """(enabled, usage_decay, threshold) from the config knobs."""
    enabled = bool(config.get("codebook_revival", False))
    decay = float(config.get("revival_usage_decay", 0.99))
    threshold = config.get("revival_threshold")
    if enabled and threshold is None:
        # usage is a fraction (uniform = 1/K): default to 10% of uniform
        threshold = 0.1 / config["num_embeddings"]
    return enabled, decay, threshold


def apply_revival(key, params, model_state, rev_aux, metrics, config,
                  rev_decay, rev_threshold):
    """One post-update revival pass; returns (params, model_state, metrics).

    ``rev_aux`` = {"counts": (K,) per-code assignment counts this batch,
    "flat": (N, D) reference-flattened pre-VQ latent rows} — both produced
    under stop_gradient inside the loss function.
    """
    from vqvae_speech_tpu.models.vq_repulsion import reset_dead_codes
    K = config["num_embeddings"]
    frac = rev_aux["counts"] / jnp.maximum(jnp.sum(rev_aux["counts"]), 1.0)
    usage = (model_state["revival"]["usage"] * rev_decay
             + (1.0 - rev_decay) * frac)
    ema = config["decay"] > 0.0
    if ema:
        vqst = model_state["vq"]
        rr = reset_dead_codes(
            key, vqst["codebook"], vqst["ema_w"],
            vqst["ema_cluster_size"], usage, rev_aux["flat"],
            threshold=rev_threshold, usage_init=1.0 / K)
        model_state = dict(model_state, vq=dict(
            vqst, codebook=rr.codebook, ema_w=rr.ema_w,
            ema_cluster_size=rr.cluster_size))
    else:
        cb = params["vq"]["codebook"]
        rr = reset_dead_codes(
            key, cb, cb, jnp.zeros((K,), cb.dtype), usage,
            rev_aux["flat"].astype(cb.dtype),
            threshold=rev_threshold, usage_init=1.0 / K)
        params = dict(params, vq=dict(params["vq"], codebook=rr.codebook))
    model_state = dict(model_state, revival={"usage": rr.usage})
    metrics = dict(metrics, revived_codes=rr.num_reset.astype(jnp.float32))
    return params, model_state, metrics
