"""Per-epoch checkpointing with auto-resume discovery.

Contract-parity with reference src/experiments/checkpoint_utils.py:35-135 and
src/experiments/convolutional_trainer.py:76-86:

* one checkpoint per epoch named ``{name}_{epoch}_checkpoint.pkl`` holding
  {experiment_name, epoch, model params+state, optimizer state, loss lists},
* resume picks the latest epoch by filename parse,
* loss histories live inside checkpoints and are merged across epochs for
  plotting.

Format: a pickle of numpy-ified pytrees (host arrays — device placement is
re-established by the trainer on load; the functional analogue of torch.load's
map_location dance at reference pipeline_factory.py:108-126).
"""
import os
import pickle
import re

import jax
import numpy as np

_CKPT_RE = re.compile(r"^(?P<name>.+)_(?P<epoch>\d+)_checkpoint\.pkl$")


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(experiments_path: str, experiment_name: str, epoch: int,
                    params, model_state, opt_state,
                    train_res_recon_error=None, train_res_perplexity=None):
    """epoch is 0-based here; stored as epoch+1 like the reference."""
    os.makedirs(experiments_path, exist_ok=True)
    payload = {
        "experiment_name": experiment_name,
        "epoch": epoch + 1,
        "params": _to_host(params),
        "model_state": _to_host(model_state),
        "opt_state": _to_host(opt_state),
        "train_res_recon_error": train_res_recon_error or [],
        "train_res_perplexity": train_res_perplexity or [],
    }
    path = os.path.join(experiments_path,
                        f"{experiment_name}_{epoch + 1}_checkpoint.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)  # atomic publish: no torn checkpoints on crash
    return path


def find_checkpoints(experiments_path: str, experiment_name: str):
    """All (epoch, path) pairs for an experiment, ascending by epoch."""
    if not os.path.isdir(experiments_path):
        return []
    out = []
    for fname in os.listdir(experiments_path):
        m = _CKPT_RE.match(fname)
        if m and m.group("name") == experiment_name:
            out.append((int(m.group("epoch")),
                        os.path.join(experiments_path, fname)))
    return sorted(out)


def latest_checkpoint_epoch(experiments_path: str, experiment_name: str):
    ckpts = find_checkpoints(experiments_path, experiment_name)
    return ckpts[-1] if ckpts else (None, None)


def prune_checkpoints(experiments_path: str, experiment_name: str,
                      keep_last: int = 2, keep_first: bool = True):
    """Delete all but the newest ``keep_last`` checkpoints (plus the very
    first epoch's, which carries the first training step's losses).

    Opt-in disk-bound extension: the reference keeps every epoch
    (convolutional_trainer.py:76-86) because its checkpoints are small; a
    reference-scale WaveNetVQVAE checkpoint is ~1 GB, so an 80-epoch run
    would need ~80 GB. Pruning trades the merged cross-epoch loss history
    (merge_checkpoint_losses) for bounded disk — callers that need full
    curves should leave it off."""
    ckpts = find_checkpoints(experiments_path, experiment_name)
    protected = set(e for e, _ in ckpts[-keep_last:])
    if keep_first and ckpts:
        protected.add(ckpts[0][0])
    for epoch, path in ckpts:
        if epoch not in protected:
            os.remove(path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def merge_checkpoint_losses(experiments_path: str, experiment_name: str):
    """Merge per-epoch loss dicts across all checkpoints for plotting
    (reference checkpoint_utils.py:80-98)."""
    merged_losses, merged_perplexities = [], []
    for _, path in find_checkpoints(experiments_path, experiment_name):
        ckpt = load_checkpoint(path)
        merged_losses.extend(ckpt.get("train_res_recon_error", []))
        merged_perplexities.extend(ckpt.get("train_res_perplexity", []))
    return merged_losses, merged_perplexities
