"""Bisect the flagship-scale e_latent divergence (jax vs reference-torch).

Context: at the reference's exact flagship operating point (768 hiddens /
44 codes / batch 2 / lr 2e-4 / jitter12, quality_probe_scale features) the
torch twin trains drift-stable (e_latent -> 0.68) while this framework's
step drifts (e_latent -> ~3, with a much higher early excursion), under the
SAME FeatureLoader batch order (same class, same seed).  The candidate
causes are the only unshared pieces: parameter-init sampling, the jitter
draws, and Adam-amsgrad semantics.  This script swaps one piece at a time:

  --mode torch-init   jax training from the torch twin's *exact* initial
                      weights (torch.manual_seed(seed)); isolates init
                      sampling from step semantics
  --mode jax-init     control: jax training from its own init (same code
                      path as torch-init, so the two runs differ ONLY in
                      the initial weights)
  --mode no-jitter    jax init, jitter disabled (vs a torch --no-jitter
                      run) — isolates the jitter draws

Per-epoch e_latent/perplexity trajectories are printed and written to
<out>/bisect_<mode>_seed<seed>.json.

Usage: python scripts/flagship_bisect.py --root quality_probe_scale \
           --mode torch-init --seeds 1234
"""
import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

FLAGSHIP_SPEC = dict(batch_size=2, learning_rate=2e-4, num_hiddens=768,
                     residual_channels=768, embedding_dim=64,
                     num_embeddings=44, use_jitter=True,
                     jitter_probability=0.12)


def torch_init_params(cfg, seed, jax_params):
    """Build the (forward-exact) torch twin at torch.manual_seed(seed) and
    copy its initial weights into the jax param tree (the mapping
    tests/test_model_parity.py proves output-exact)."""
    import torch
    import jax.numpy as jnp
    from quality_parity_torch import build_torch_model

    torch.manual_seed(seed)
    np.random.seed(seed)
    tm = build_torch_model(cfg)

    def cp(tc):
        p = {"w": jnp.asarray(tc.weight.detach().numpy().transpose(2, 1, 0))}
        if tc.bias is not None:
            p["b"] = jnp.asarray(tc.bias.detach().numpy())
        return p

    params = jax_params
    params["encoder"]["conv_1"] = cp(tm.e1)
    params["encoder"]["conv_2"] = cp(tm.e2)
    params["encoder"]["conv_3"] = cp(tm.e3)
    params["encoder"]["conv_4"] = cp(tm.e4)
    params["encoder"]["conv_5"] = cp(tm.e5)
    params["encoder"]["residual_stack"]["block"]["conv1"] = cp(tm.eres.c1)
    params["encoder"]["residual_stack"]["block"]["conv2"] = cp(tm.eres.c2)
    params["pre_vq_conv"] = cp(tm.pre)
    params["vq"]["codebook"] = jnp.asarray(tm.codebook.detach().numpy())
    params["decoder"]["conv_1"] = cp(tm.d1)
    params["decoder"]["residual_stack"]["block"]["conv1"] = cp(tm.dres.c1)
    params["decoder"]["residual_stack"]["block"]["conv2"] = cp(tm.dres.c2)
    params["decoder"]["conv_trans_1"] = cp(tm.t1)
    params["decoder"]["conv_trans_2"] = cp(tm.t2)
    params["decoder"]["conv_trans_3"] = cp(tm.t3)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="quality_probe_scale")
    ap.add_argument("--mode", required=True,
                    choices=["torch-init", "jax-init", "no-jitter"])
    ap.add_argument("--seeds", default="1234")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--out", default="flagship_bisect")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import yaml
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    with open(os.path.join(args.root, "base.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg.update(FLAGSHIP_SPEC)
    if args.mode == "no-jitter":
        cfg["use_jitter"] = False

    from vqvae_speech_tpu.models import conv_vqvae_init
    from vqvae_speech_tpu.train.trainer import (
        make_train_step, make_optimizer, TrainState)
    from vqvae_speech_tpu.data.feature_store import (
        FeatureStore, FeatureLoader, load_normalizer)

    store = FeatureStore(os.path.join(args.root, "features"))
    norm = load_normalizer(cfg["normalizer_path"])
    os.makedirs(args.out, exist_ok=True)

    for seed in [int(s) for s in args.seeds.split(",")]:
        params, model_state = conv_vqvae_init(jax.random.PRNGKey(seed), cfg)
        if args.mode == "torch-init":
            params = torch_init_params(cfg, seed, params)
        opt = make_optimizer(cfg["learning_rate"])
        step = make_train_step(cfg, opt)
        state = TrainState(params, model_state, opt.init(params),
                           jax.random.PRNGKey(seed))
        loader = FeatureLoader(store, "train", cfg["batch_size"],
                               normalizer=norm, shuffle=True,
                               drop_last=True, seed=seed)
        hist = {"e_latent": [], "perplexity": [], "recon": []}
        for epoch in range(args.epochs):
            sums = {k: 0.0 for k in hist}
            nb = 0
            for batch in loader:
                state, metrics = step(state, batch)
                sums["e_latent"] += float(metrics["e_latent_loss"])
                sums["perplexity"] += float(metrics["perplexity"])
                sums["recon"] += float(metrics["reconstruction_loss"])
                nb += 1
            for k in hist:
                hist[k].append(sums[k] / nb)
            print(f"  {args.mode} seed{seed} epoch {epoch}: "
                  f"e_latent {hist['e_latent'][-1]:.4f} "
                  f"perplexity {hist['perplexity'][-1]:.3f} "
                  f"recon {hist['recon'][-1]:.4f}", flush=True)
        out = os.path.join(args.out,
                           f"bisect_{args.mode}_seed{seed}.json")
        with open(out, "w") as f:
            json.dump({"mode": args.mode, "seed": seed, "cfg_width":
                       cfg["num_hiddens"], "history": hist}, f, indent=2)
        print(json.dumps({"mode": args.mode, "seed": seed,
                          "final_e_latent": hist["e_latent"][-1],
                          "final_perplexity": hist["perplexity"][-1]}),
              flush=True)


if __name__ == "__main__":
    main()
