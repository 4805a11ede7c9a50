"""Tensor-parallel VQ codebook search: codebook sharded over the mesh.

The optional TP extension flagged in SURVEY.md section 2.10 (the reference
has no tensor parallelism at all): for large codebooks the (K, D) table is
sharded over the ``model`` mesh axis; each device computes distances/argmin
against its K/m codebook shard, then the winner is combined with one tiny
all-gather of (min_distance, global_index) pairs over ICI — the N x K
distance work is fully parallel.

Implemented with `shard_map` so the collective is explicit and the compiler
sees static shapes per shard.
"""
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def sharded_vq_search(flat, codebook, mesh: Mesh, axis: str = "model"):
    """flat (N, D) replicated; codebook (K, D) sharded over ``axis``.

    Returns (indices (N,) int32 global code ids, min_distances (N,)).
    K must divide by the axis size.
    """
    m = mesh.shape[axis]
    K = codebook.shape[0]
    assert K % m == 0, (K, m)
    shard_k = K // m

    def local_search(flat_l, cb_l):
        # cb_l: (K/m, D) local shard
        d = (jnp.sum(jnp.square(flat_l), axis=1, keepdims=True)
             + jnp.sum(jnp.square(cb_l), axis=1)
             - 2.0 * flat_l @ cb_l.T)
        local_idx = jnp.argmin(d, axis=1)
        local_min = jnp.min(d, axis=1)
        shard_id = jax.lax.axis_index(axis)
        global_idx = local_idx + shard_id * shard_k
        # combine across shards: all_gather the per-shard winners (m entries
        # per row — tiny), then reduce
        mins = jax.lax.all_gather(local_min, axis)       # (m, N)
        idxs = jax.lax.all_gather(global_idx, axis)      # (m, N)
        best_shard = jnp.argmin(mins, axis=0)            # (N,)
        take = lambda a: jnp.take_along_axis(a, best_shard[None, :],
                                             axis=0)[0]
        return take(idxs).astype(jnp.int32), take(mins)

    # data axis unused here: flat replicated over it, results replicated
    fn = shard_map(
        local_search, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_rep=False)
    return fn(flat, codebook)


def place_sharded_codebook(codebook, mesh: Mesh, axis: str = "model"):
    """Device-put a host codebook sharded over ``axis``."""
    return jax.device_put(codebook, NamedSharding(mesh, P(axis)))
