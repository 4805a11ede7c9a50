"""Orbax checkpoint backend (production alternative to the pickle format).

Same logical contract as train/checkpoint.py (per-epoch save, latest-epoch
discovery, payload of params/model_state/opt_state/loss lists — the
reference's torch.save contract, convolutional_trainer.py:76-86) but stored
via orbax-checkpoint: sharded-array aware, works for multi-host meshes
(each host writes its shards), directory layout
``{experiments_path}/{name}_orbax/{epoch}/``.
"""
import os
import re

_EPOCH_RE = re.compile(r"^\d+$")


def _manager(experiments_path: str, experiment_name: str):
    import orbax.checkpoint as ocp

    root = os.path.abspath(
        os.path.join(experiments_path, f"{experiment_name}_orbax"))
    os.makedirs(root, exist_ok=True)
    return ocp.CheckpointManager(root)


def save_checkpoint_orbax(experiments_path: str, experiment_name: str,
                          epoch: int, params, model_state, opt_state,
                          train_res_recon_error=None,
                          train_res_perplexity=None):
    import orbax.checkpoint as ocp

    mgr = _manager(experiments_path, experiment_name)
    payload = {
        "params": params,
        "model_state": model_state,
        "opt_state": opt_state,
    }
    extra = {
        "experiment_name": experiment_name,
        "epoch": epoch + 1,
        "train_res_recon_error": train_res_recon_error or [],
        "train_res_perplexity": train_res_perplexity or [],
    }
    mgr.save(epoch + 1, args=ocp.args.Composite(
        state=ocp.args.StandardSave(payload),
        meta=ocp.args.JsonSave(extra)))
    mgr.wait_until_finished()
    mgr.close()
    return os.path.join(experiments_path, f"{experiment_name}_orbax",
                        str(epoch + 1))


def latest_checkpoint_epoch_orbax(experiments_path: str,
                                  experiment_name: str):
    root = os.path.join(experiments_path, f"{experiment_name}_orbax")
    if not os.path.isdir(root):
        return None, None
    epochs = sorted(int(d) for d in os.listdir(root) if _EPOCH_RE.match(d))
    if not epochs:
        return None, None
    return epochs[-1], os.path.join(root, str(epochs[-1]))


def load_checkpoint_orbax(experiments_path: str, experiment_name: str,
                          epoch: int = None, target=None):
    """Restore a checkpoint.  ``target`` (optional) is an abstract payload
    pytree of ``jax.ShapeDtypeStruct`` leaves carrying ``sharding`` — the
    multi-chip resume path: each host/device restores its shards directly to
    the requested mesh placement instead of round-tripping through host
    memory (this is what the pickle backend cannot do)."""
    import orbax.checkpoint as ocp

    if epoch is None:
        epoch, _ = latest_checkpoint_epoch_orbax(experiments_path,
                                                 experiment_name)
        if epoch is None:
            raise FileNotFoundError(
                f"no orbax checkpoints for '{experiment_name}'")
    mgr = _manager(experiments_path, experiment_name)
    restored = mgr.restore(epoch, args=ocp.args.Composite(
        state=ocp.args.StandardRestore(target),
        meta=ocp.args.JsonRestore()))
    mgr.close()
    out = dict(restored["meta"])
    out.update(restored["state"])
    return out


def sharded_restore_target(tree, sharding):
    """Abstract restore target pinning every floating/array leaf of ``tree``
    to ``sharding`` (e.g. ``NamedSharding(mesh, P())`` for replicated DP
    state)."""
    import jax

    return jax.tree_util.tree_map(
        lambda v: jax.ShapeDtypeStruct(jax.numpy.shape(v),
                                       jax.numpy.asarray(v).dtype,
                                       sharding=sharding), tree)
