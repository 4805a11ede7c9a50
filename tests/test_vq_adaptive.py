"""Adaptive VQ-EMA tests: pruning, merging, convergence to cluster count."""
import numpy as np
import jax
import jax.numpy as jnp

from vqvae_speech_tpu.models.vq_adaptive import (
    adaptive_vq_init, adaptive_vq_apply, adaptive_prune_and_merge,
    active_codes_count, suggest_initial_codes, is_stable)
from examples.vq_2d_clustering import generate_2d_clusters


def test_suggest_initial_codes():
    assert suggest_initial_codes(400) == 20
    assert suggest_initial_codes(10) == 5
    assert suggest_initial_codes(10000, max_embeddings=30) == 30


def test_inactive_codes_never_selected():
    key = jax.random.PRNGKey(0)
    state = adaptive_vq_init(key, 16, 2, initial_num_embeddings=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (100, 2))
    out = adaptive_vq_apply(state, x, training=False)
    assert np.all(np.asarray(out.indices) < 4)


def test_prune_removes_unused_codes():
    key = jax.random.PRNGKey(0)
    state = adaptive_vq_init(key, 8, 2, initial_num_embeddings=8)
    # give usage to only 3 codes
    usage = np.zeros(8, np.float32)
    usage[:3] = 1.0
    state["ema_usage"] = jnp.asarray(usage)
    # spread codebook so nothing merges
    state["codebook"] = jnp.asarray(
        10.0 * np.arange(16, dtype=np.float32).reshape(8, 2))
    state = adaptive_prune_and_merge(state)
    assert active_codes_count(state) == 3


def test_merge_collapses_close_codes():
    key = jax.random.PRNGKey(0)
    state = adaptive_vq_init(key, 4, 2, initial_num_embeddings=4)
    cb = np.array([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [-5.0, 5.0]],
                  np.float32)
    state["codebook"] = jnp.asarray(cb)
    state["ema_usage"] = jnp.asarray([0.4, 0.2, 0.2, 0.2], np.float32)
    state = adaptive_prune_and_merge(state, min_usage_threshold=0.0,
                                     merge_distance_threshold=0.5)
    assert active_codes_count(state) == 3
    active = np.asarray(state["active"])
    assert active[0] and not active[1]  # lower-usage member absorbed
    # survivor moved to the usage-weighted average
    merged = np.asarray(state["codebook"])[0]
    want = (0.4 * cb[0] + 0.2 * cb[1]) / 0.6
    np.testing.assert_allclose(merged, want, rtol=1e-5)


def test_adaptive_training_converges_to_cluster_count():
    data, labels = generate_2d_clusters(n_points=600, n_clusters=5, noise=0.2)
    key = jax.random.PRNGKey(0)
    state = adaptive_vq_init(key, 30, 2, initial_num_embeddings=20)
    # seed codebook in the data range
    state["codebook"] = jnp.asarray(
        data.mean(0) + data.std(0)
        * np.random.default_rng(0).standard_normal((30, 2)).astype(np.float32))
    points = jnp.asarray(data)

    @jax.jit
    def step(state):
        out = adaptive_vq_apply(state, points, training=True)
        return out.new_state, out.vq_loss

    for epoch in range(200):
        state, loss = step(state)
        if (epoch + 1) % 50 == 0:
            state = adaptive_prune_and_merge(
                state, min_usage_threshold=0.01,
                merge_distance_threshold=0.8)
    # 5 gaussian clusters -> a handful of active codes survive
    n = active_codes_count(state)
    assert 3 <= n <= 12
    assert np.isfinite(float(loss))
    assert is_stable(state, 1) or n <= 12
