"""Head-to-head quality parity: reference-semantics torch vs this framework.

Settles VERDICT round-2 item #1: the claim that gradient-VQ latent drift at
width >= 256 on the synthetic phoneme corpus is a property of the reference
DESIGN on this corpus (not a bug in this framework) was never verified.  This
script trains BOTH implementations on the SAME exported features, same seeds:

* torch side: an inline PyTorch build of the reference's training semantics —
  model topology from src/models/convolutional_{encoder,vq_vae}.py +
  deconvolutional_decoder.py (the same twin tests/test_model_parity.py proves
  forward-exact against this framework), the reference's gradient VQ
  (src/models/vector_quantizer.py:96-148: (C,T,B) flatten, straight-through,
  q_latent + commitment*e_latent), jitter (src/modules/jitter.py: one draw
  shared across the batch, detached neighbors), MSE criterion and
  Adam(amsgrad=True) exactly as src/experiments/convolutional_trainer.py:41-68.
* jax side: this framework's ConvolutionalTrainer via the real Experiments
  driver (the same path scripts/quality_run_tpu.py grades).

Per (width, seed): e_latent trajectory, final perplexity, ARI/AMI/NMI on the
val split against the TextGrid groundtruth (both sides scored by the SAME
eval/alignment_stats.py code — the torch side writes its index sequences in
the identical empirical-alignments pickle format).

Usage: python scripts/quality_parity_torch.py [--root quality_parity]
           [--widths 24,256,768] [--seeds 1234,5678,4242] [--epochs N]
Writes <root>/summary.json.
"""
import argparse
import json
import os
import pickle
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

from vqvae_speech_tpu.data.synthetic_phonemes import build_phoneme_corpus
from vqvae_speech_tpu.data.vctk import VCTK
from vqvae_speech_tpu.data.export import export_to_features
from vqvae_speech_tpu.data.feature_store import (
    FeatureStore, FeatureLoader, compute_dataset_stats, load_normalizer)

# one corpus for every width: the WIDE corpus from quality_run_tpu.py (the
# one the drift was observed on)
CORPUS = dict(num_speakers=8, utts_per_speaker=50, utt_seconds=0.6)
RATIO = 0.9

BASE_CFG = dict(
    decoder_type="deconvolutional", trainer_type="convolutional",
    verbose=False, data_root=".", start_epoch=0, num_workers=8,
    train_val_split=RATIO, normalize=True, normalizer_path="",
    use_speaker_conditioning=False, record_codebook_stats=False,
    record_gradient_stats=False, features_path="features",
    export_one_hot_features=False, use_cuda=False, use_data_parallel=False,
    use_device=None, sampling_rate=16000, res_type="kaiser_fast", top_db=20,
    length=7680, quantize=256, input_dim=256, commitment_cost=0.25,
    decay=0.0, num_residual_layers=2, input_features_type="mfcc",
    output_features_type="mfcc", input_features_dim=47,
    input_features_filters=13, output_features_dim=47,
    output_features_filters=13, augment_input_features=True,
    augment_output_features=True, use_kaiming_normal=False,
    jitter_probability=0.12, use_jitter=False,
)

# per-width hyperparameters: w24 mirrors the PINNED stable regime (jitter12,
# lr 1e-3 batch 4); w256 is the WIDE drift config; w768 is the FLAGSHIP
# (reference configurations/vctk_features.yaml: 768 hiddens, 44 codes,
# dim 64, lr 2e-4)
WIDTH_SPECS = {
    24: dict(batch_size=4, learning_rate=1e-3, num_hiddens=24,
             residual_channels=24, embedding_dim=8, num_embeddings=8,
             use_jitter=True, epochs=60),
    256: dict(batch_size=16, learning_rate=2e-4, num_hiddens=256,
              residual_channels=256, embedding_dim=64, num_embeddings=8,
              epochs=40),
    768: dict(batch_size=16, learning_rate=2e-4, num_hiddens=768,
              residual_channels=768, embedding_dim=64, num_embeddings=44,
              epochs=40),
}

# The reference's EXACT flagship operating point (vctk_features.yaml:6,12 +
# experiments_vq44-mfcc39.json: batch 2, 15 epochs, lr 2e-4, jitter12) —
# the configuration scripts/quality_run_tpu.py --flagship grades on TPU.
# Run with --existing-root <probe root> to train the torch twin on the very
# features/normalizer/groundtruth that TPU run exported.
FLAGSHIP_SPEC = dict(batch_size=2, learning_rate=2e-4, num_hiddens=768,
                     residual_channels=768, embedding_dim=64,
                     num_embeddings=44, use_jitter=True,
                     jitter_probability=0.12, epochs=15)


# ---------------- torch twin (reference training semantics) ----------------


def build_torch_model(cfg):
    """Parameterized version of tests/test_model_parity.py::TorchModel —
    the twin whose forward is proven index- and output-exact against this
    framework's conv_vqvae_apply."""
    import torch
    import torch.nn as tnn

    class TorchResBlock(tnn.Module):
        def __init__(self, ch, rch):
            super().__init__()
            self.c1 = tnn.Conv1d(ch, rch, 3, padding=1, bias=False)
            self.c2 = tnn.Conv1d(rch, ch, 1, bias=False)

        def forward(self, x):
            import torch.nn.functional as F
            return x + self.c2(F.relu(self.c1(F.relu(x))))

    class TorchTwin(tnn.Module):
        def __init__(self, cfg):
            super().__init__()
            import torch
            h = cfg["num_hiddens"]
            fin = cfg["input_features_filters"] * 3
            fout = cfg["output_features_filters"] * 3
            d = cfg["embedding_dim"]
            self.e1 = tnn.Conv1d(fin, h, 3, padding=1)
            self.e2 = tnn.Conv1d(h, h, 3, padding=1)
            self.e3 = tnn.Conv1d(h, h, 4, stride=2, padding=2)
            self.e4 = tnn.Conv1d(h, h, 3, padding=1)
            self.e5 = tnn.Conv1d(h, h, 3, padding=1)
            self.eres = TorchResBlock(h, h)
            self.pre = tnn.Conv1d(h, d, 3, padding=1)
            self.codebook = tnn.Parameter(
                torch.empty(cfg["num_embeddings"], d).uniform_(
                    -1 / cfg["num_embeddings"], 1 / cfg["num_embeddings"]))
            self.d1 = tnn.Conv1d(d, h, 3, padding=1)
            self.dres = TorchResBlock(h, cfg["residual_channels"])
            self.t1 = tnn.ConvTranspose1d(h, h, 3, padding=1)
            self.t2 = tnn.ConvTranspose1d(h, h, 3, padding=0)
            self.t3 = tnn.ConvTranspose1d(h, fout, 2, padding=0)
            self.n_res = cfg["num_residual_layers"]
            self.cc = cfg["commitment_cost"]
            self.use_jitter = cfg.get("use_jitter", False)
            self.jitter_p = cfg.get("jitter_probability", 0.12)

        def res_stack(self, block, x):
            import torch.nn.functional as F
            for _ in range(self.n_res):
                x = block(x)
            return F.relu(x)

        def encode_indices(self, x_btc):
            """Eval-mode index stream reshaped (B, T_lat) like the
            reference alignment path (.view(B, -1) on the (C,T,B)-flat
            argmin stream)."""
            import torch
            with torch.no_grad():
                _, _, idx, _, _ = self.forward(x_btc, training=False)
            B = x_btc.shape[0]
            return idx.view(B, -1).numpy()

        def forward(self, x_btc, training=True):
            import torch
            import torch.nn.functional as F
            x = x_btc.permute(0, 2, 1).contiguous().float()
            x1 = F.relu(self.e1(x))
            h = F.relu(self.e2(x1)) + x1
            x3 = F.relu(self.e3(h))
            x4 = F.relu(self.e4(x3)) + x3
            x5 = F.relu(self.e5(x4)) + x4
            z = self.res_stack(self.eres, x5) + x5
            z = self.pre(z)
            # reference VQ: (C,T,B) flatten (vector_quantizer.py:88-104)
            inputs = z.permute(1, 2, 0).contiguous()
            shape = inputs.shape
            flat = inputs.view(-1, self.codebook.shape[1])
            dmat = (flat.pow(2).sum(1, keepdim=True)
                    + self.codebook.pow(2).sum(1)
                    - 2 * flat @ self.codebook.t())
            idx = torch.argmin(dmat, dim=1)
            onehot = torch.zeros(flat.shape[0], self.codebook.shape[0])
            onehot.scatter_(1, idx.unsqueeze(1), 1)
            q = (onehot @ self.codebook).view(shape)
            e_lat = torch.mean((q.detach() - inputs) ** 2)
            q_lat = torch.mean((q - inputs.detach()) ** 2)
            vq_loss = q_lat + self.cc * e_lat
            avg = onehot.mean(0)
            perp = torch.exp(-torch.sum(avg * torch.log(avg + 1e-10)))
            q = inputs + (q - inputs).detach()
            q = q.permute(2, 0, 1).contiguous()
            if self.use_jitter and training:
                # reference jitter.py:47-70: ONE draw shared across the
                # batch, replacement from the detached copy, and the
                # inversion quirk — `[True, False][choice([1, 0],
                # p=[p, 1-p])]` replaces w.p. **1-p** (jitter.py:55)
                orig = q.detach().clone()
                L = orig.size(2)
                for i in range(L):
                    if [True, False][np.random.choice(
                            [1, 0], p=[self.jitter_p, 1 - self.jitter_p])]:
                        if i == 0:
                            nb = 1
                        elif i == L - 1:
                            nb = L - 2
                        else:
                            nb = i + np.random.choice([-1, 1])
                        q[:, :, i] = orig[:, :, nb]
            y = self.d1(q)
            y = F.interpolate(y, scale_factor=2)
            y = self.res_stack(self.dres, y)
            y = F.relu(self.t1(y))
            y = F.relu(self.t2(y))
            y = self.t3(y)
            Tin, Tout = x.shape[2], y.shape[2]
            y = y[:, :, : -(Tout - Tin)]
            return y, vq_loss, idx, float(e_lat), float(perp)

    return TorchTwin(cfg)


def run_torch(cfg, store_root, results_path, name, seed, epochs):
    """Reference training loop semantics (convolutional_trainer.py:44-68):
    Adam(amsgrad=True), loss = vq_loss + MSE(recon, target)."""
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    torch.set_num_threads(os.cpu_count() or 8)
    model = build_torch_model(cfg)
    opt = torch.optim.Adam(model.parameters(), lr=cfg["learning_rate"],
                           amsgrad=True)
    crit = torch.nn.MSELoss()

    store = FeatureStore(store_root)
    norm = load_normalizer(cfg["normalizer_path"])
    loader = FeatureLoader(store, "train", cfg["batch_size"],
                           normalizer=norm, shuffle=True, drop_last=True,
                           seed=seed)
    e_lat_hist, perp_hist = [], []
    model.train()
    for epoch in range(epochs):
        e_sum = p_sum = 0.0
        nb = 0
        for batch in loader:
            src = torch.from_numpy(batch["input_features"])
            tgt = torch.from_numpy(
                batch["output_features"]).permute(0, 2, 1).contiguous()
            opt.zero_grad()
            y, vq_loss, _, e_lat, perp = model(src, training=True)
            loss = vq_loss + crit(y, tgt.float())
            loss.backward()
            opt.step()
            e_sum += e_lat
            p_sum += perp
            nb += 1
        e_lat_hist.append(e_sum / nb)
        perp_hist.append(p_sum / nb)
        print(f"  torch {name} epoch {epoch}: e_latent {e_lat_hist[-1]:.4f} "
              f"perplexity {perp_hist[-1]:.3f}", flush=True)

    # empirical alignments on val, identical pickle format so the SAME
    # compute_clustering_metrics scores both sides
    model.eval()
    data = store.open("val")
    meta = store.metadata("val")
    wavs = meta.get("wav_filenames", [])
    feats = np.asarray(data["input_features"], np.float32)
    feats = ((feats - norm["train_mean"]) / norm["train_std"]).astype(
        np.float32)
    all_alignments, counter, total = [], {}, 0
    for start in range(0, feats.shape[0], 32):
        chunk = feats[start:start + 32]
        idx = model.encode_indices(torch.from_numpy(chunk))
        for i in range(chunk.shape[0]):
            gi = start + i
            key = (os.path.basename(wavs[gi]).rsplit(".", 1)[0]
                   if gi < len(wavs) else str(gi))
            seq = idx[i]
            all_alignments.append((key, seq))
            total += len(seq)
            for v in seq:
                counter[str(v)] = counter.get(str(v), 0) + 1
    os.makedirs(results_path, exist_ok=True)
    with open(os.path.join(
            results_path,
            f"{name}_vctk_val_empirical_alignments.pickle"), "wb") as f:
        pickle.dump({
            "all_alignments": all_alignments,
            "encodings_counter": counter,
            "desired_time_interval": 0.02,
            "total_indices_apparations": total,
            "num_embeddings": cfg["num_embeddings"],
        }, f)
    return e_lat_hist, perp_hist


# ---------------- jax side (this framework's real trainer) ----------------


def run_jax(cfg, store_root, results_path, name, seed, epochs):
    import jax
    from vqvae_speech_tpu.models import conv_vqvae_init
    from vqvae_speech_tpu.train.trainer import (
        make_train_step, make_optimizer, TrainState)

    params, model_state = conv_vqvae_init(jax.random.PRNGKey(seed), cfg)
    opt = make_optimizer(cfg["learning_rate"])  # Adam-amsgrad, as the
    # reference (convolutional_trainer.py:41-42) and this repo's Experiments
    step = make_train_step(cfg, opt)
    state = TrainState(params, model_state, opt.init(params),
                       jax.random.PRNGKey(seed))

    store = FeatureStore(store_root)
    norm = load_normalizer(cfg["normalizer_path"])
    loader = FeatureLoader(store, "train", cfg["batch_size"],
                           normalizer=norm, shuffle=True, drop_last=True,
                           seed=seed)
    e_lat_hist, perp_hist = [], []
    for epoch in range(epochs):
        e_sum = p_sum = 0.0
        nb = 0
        for batch in loader:
            state, metrics = step(state, batch)
            e_sum += float(metrics["e_latent_loss"])
            p_sum += float(metrics["perplexity"])
            nb += 1
        e_lat_hist.append(e_sum / nb)
        perp_hist.append(p_sum / nb)
        print(f"  jax {name} epoch {epoch}: e_latent {e_lat_hist[-1]:.4f} "
              f"perplexity {perp_hist[-1]:.3f}", flush=True)

    from vqvae_speech_tpu.eval.alignment_stats import (
        compute_empirical_alignments)
    compute_empirical_alignments(state.params, state.model_state, store,
                                 "val", cfg, results_path, name)
    return e_lat_hist, perp_hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="quality_parity")
    ap.add_argument("--widths", default="24,256,768")
    ap.add_argument("--seeds", default="1234,5678,4242")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the per-width epoch defaults")
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-jax", action="store_true")
    ap.add_argument("--flagship", action="store_true",
                    help="run the reference's exact flagship operating "
                         "point (batch 2, 15 epochs, jitter12) instead of "
                         "the width sweep")
    ap.add_argument("--existing-root", default=None,
                    help="reuse an already-exported corpus root "
                         "(features/, stats.pickle, results/ groundtruth) "
                         "— e.g. the quality_run_tpu probe output, so both "
                         "sides train on byte-identical features")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (so a torch-only run "
                         "never touches the TPU a concurrent job owns)")
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]
    seeds = [int(s) for s in args.seeds.split(",")]

    import jax
    if args.cpu:
        # the axon plugin overrides JAX_PLATFORMS=cpu; the config update
        # must happen before first backend use (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    # reference trains true-f32 CUDA; match it so trajectory deltas are
    # algorithmic, not matmul-precision artifacts
    jax.config.update("jax_default_matmul_precision", "highest")

    from vqvae_speech_tpu.eval.alignment_stats import (
        compute_groundtruth_alignments, compute_clustering_metrics)

    out_root = args.root
    os.makedirs(out_root, exist_ok=True)
    if args.existing_root:
        import yaml
        root = args.existing_root
        with open(os.path.join(root, "base.yaml")) as f:
            cfg0 = yaml.safe_load(f)
        store_root = os.path.join(root, "features")
        results_path = os.path.join(root, "results")
        if not os.path.isfile(os.path.join(
                results_path, "vctk_val_groundtruth_alignments.pickle")):
            compute_groundtruth_alignments(
                FeatureStore(store_root), "val", cfg0, results_path,
                os.path.join(root, "raw", "VCTK-Corpus", "phonemes"))
        corpus_desc = {"existing_root": root}
    else:
        root = out_root
        build_phoneme_corpus(root, **CORPUS)
        vctk = VCTK(root, ratio=RATIO, shuffle_seed=0)
        cfg0 = dict(BASE_CFG)
        cfg0["data_root"] = root
        cfg0["normalizer_path"] = os.path.join(root, "stats.pickle")
        store_root = os.path.join(root, "features")
        export_to_features(vctk, store_root, cfg0, num_workers=8)
        compute_dataset_stats(FeatureStore(store_root),
                              cfg0["normalizer_path"])
        results_path = os.path.join(root, "results")
        compute_groundtruth_alignments(
            FeatureStore(store_root), "val", cfg0, results_path,
            os.path.join(root, "raw", "VCTK-Corpus", "phonemes"))
        corpus_desc = CORPUS

    spec_items = ([("flagship", FLAGSHIP_SPEC)] if args.flagship
                  else [(w, WIDTH_SPECS[w]) for w in widths])
    summary = {"corpus": corpus_desc, "widths": {}}
    for w, width_spec in spec_items:
        cfg = dict(cfg0)
        cfg.update(width_spec)
        epochs = args.epochs or cfg.pop("epochs")
        cfg.pop("epochs", None)
        wsum = {"epochs": epochs}
        for seed in seeds:
            entry = {}
            for side, runner, skip in (
                    ("torch", run_torch, args.skip_torch),
                    ("jax", run_jax, args.skip_jax)):
                if skip:
                    continue
                name = f"{side}-w{w}-seed{seed}"
                t0 = time.time()
                e_hist, p_hist = runner(cfg, store_root, results_path,
                                        name, seed, epochs)
                scores = compute_clustering_metrics(
                    results_path, name, "val", cfg)
                entry[side] = {
                    "e_latent_trajectory": [round(v, 4) for v in e_hist],
                    "final_perplexity": round(p_hist[-1], 3),
                    "scores": {k: round(float(v), 5)
                               for k, v in scores.items()},
                    "wall_s": round(time.time() - t0, 1),
                }
                print(json.dumps({"width": w, "seed": seed, "side": side,
                                  "final_e_latent": e_hist[-1],
                                  "scores": entry[side]["scores"]}),
                      flush=True)
            wsum[str(seed)] = entry
        summary["widths"][str(w)] = wsum
        with open(os.path.join(out_root, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
