"""Vectorized pairwise L2 distances (eval path).

The reference computes eval-mode pairwise distances with Python loops over
``itertools.combinations`` / ``product`` of tensor rows — thousands of
one-element torch.dist kernel launches per batch
(reference src/models/vector_quantizer.py:109-127, the single slowest eval
path).  Here each is ONE broadcasted XLA expression (matmul + rsqrt on MXU/VPU).
Orders match itertools: ``combinations`` == upper-triangle row-major (i<j),
``product`` == row-major cartesian.
"""
import jax.numpy as jnp


def cdist(x, y):
    """(N, D), (M, D) -> (N, M) euclidean distances (product order when
    raveled)."""
    sq = (jnp.sum(jnp.square(x), axis=1, keepdims=True)
          + jnp.sum(jnp.square(y), axis=1)
          - 2.0 * x @ y.T)
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def pdist(x):
    """(N, D) -> (N*(N-1)/2,) condensed euclidean distances in
    itertools.combinations order (upper triangle, row-major)."""
    full = cdist(x, x)
    n = x.shape[0]
    iu = jnp.triu_indices(n, k=1)
    return full[iu]
