"""Device mesh + sharding: the TPU-native replacement for DeviceConfiguration.

The reference's entire distributed story is single-process
``nn.DataParallel`` (replicate params, scatter the batch, gather outputs —
reference src/experiments/pipeline_factory.py:61,153-154 gated by
src/experiments/device_configuration.py:56-76).  On TPU the idiom is the
opposite: ONE program compiled over a ``jax.sharding.Mesh``; the batch is
sharded over the ``data`` axis, parameters are replicated, and XLA inserts the
gradient all-reduce as ICI collectives.  Multi-host scaling over DCN is the
same code after ``jax.distributed.initialize``.

Axes:
  data  — batch sharding (DP).  Always present.
  model — reserved for codebook/channel sharding (TP); size 1 by default.
"""
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_multihost_initialized = False


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Multi-host (DCN) initialization: call once per host before building
    the mesh; afterwards `jax.devices()` spans all hosts and the same
    mesh/sharding code scales over DCN.  No-op when already initialized or
    single-process (the TPU-native replacement for a torch.distributed init
    — the reference has none).

    Ordering contract: ``jax.distributed.initialize`` must run BEFORE any
    backend use, so the already-initialized guard must NOT touch the backend
    (``jax.process_count()`` would instantiate it).  We track init state
    ourselves and additionally consult ``jax.distributed.global_state``,
    which is plain client state with no backend side effects.
    """
    global _multihost_initialized
    if coordinator_address is None:
        return  # single-host run
    already = _multihost_initialized
    if not already:
        try:  # distributed client state is plain Python — no backend init
            from jax._src.distributed import global_state
            already = getattr(global_state, "client", None) is not None
        except ImportError:
            pass
    if already:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _multihost_initialized = True


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    devs = np.asarray(devices[: num_data * num_model]).reshape(
        num_data, num_model)
    return Mesh(devs, axis_names=("data", "model"))


@dataclass
class MeshConfiguration:
    """Resolved device/mesh configuration for a run.

    Replaces the reference's DeviceConfiguration (cuda/cpu/gpu_ids/
    use_data_parallel resolution, device_configuration.py:32-76) with
    mesh axes.  ``use_data_parallel`` maps to ``data_axis_size > 1``.
    """

    mesh: Mesh
    backend: str

    @classmethod
    def load_from_configuration(cls, configuration: dict) -> "MeshConfiguration":
        num_model = int(configuration.get("num_model_shards", 1) or 1)
        want_dp = bool(configuration.get("use_data_parallel", False))
        devices = jax.devices()
        num_data = len(devices) // num_model if want_dp else 1
        num_data = max(num_data, 1)
        mesh = make_mesh(num_data, num_model, devices)
        return cls(mesh=mesh, backend=jax.default_backend())

    @property
    def data_axis_size(self) -> int:
        return self.mesh.shape["data"]

    @property
    def use_data_parallel(self) -> bool:
        return self.data_axis_size > 1

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P("data"))

    def replicated_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with its leading axis sharded over ``data``."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
