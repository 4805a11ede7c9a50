"""Demo tests: 2-D direct VQ-EMA clustering and balanced VQ with dead-code
revival (mirror of the reference's standalone demo scripts)."""
import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.vq_2d_clustering import (
    generate_2d_clusters, train_direct_vq, visualize)
from examples.vq_balanced_2d import train_balanced
from vqvae_speech_tpu.models.vq_balanced import (
    balanced_vq_init, balanced_vq_apply)


def test_direct_vq_clusters_2d_points(tmp_path):
    data, labels = generate_2d_clusters(n_points=300, n_clusters=5, noise=0.2)
    state, assignments, history = train_direct_vq(
        data, n_epochs=60, num_embeddings=8)
    assert assignments.shape == (300,)
    # loss decreased
    assert history[-1]["loss"] < history[0]["loss"]
    # clustering quality: points in the same gt cluster mostly share a code
    from sklearn.metrics import adjusted_rand_score

    ari = adjusted_rand_score(labels, assignments)
    assert ari > 0.5
    out = visualize(data, labels, state, assignments, history,
                    str(tmp_path / "demo.png"))
    assert os.path.isfile(out)


def test_balanced_vq_improves_coverage():
    data, labels = generate_2d_clusters(n_points=800, n_clusters=20,
                                        noise=0.2)
    state, assignments, history = train_balanced(data, n_codes=20,
                                                 n_epochs=120)
    # balanced training should use most of the codebook
    assert history[-1]["perplexity"] > 10.0
    usage = np.asarray(state["usage_count"])
    assert np.count_nonzero(usage > 0) >= 18


def test_balanced_vq_revival_replaces_dead_codes():
    key = jax.random.PRNGKey(0)
    state = balanced_vq_init(key, 8, 2)
    # put one code far away so it is never selected
    cb = np.asarray(state["codebook"]).copy()
    cb[0] = [100.0, 100.0]
    state["codebook"] = jax.numpy.asarray(cb)
    rng = np.random.default_rng(0)
    points = jax.numpy.asarray(rng.standard_normal((500, 2)).astype(np.float32))
    for i in range(30):
        out = balanced_vq_apply(state, points, training=True,
                                revival_key=jax.random.PRNGKey(i + 1))
        state = out.new_state
    # the far-away code must have been revived near the data
    cb = np.asarray(state["codebook"])
    assert np.linalg.norm(cb[0]) < 50.0


def test_encode_wav_utility(tmp_path, capsys):
    """examples/encode_wav.py end to end on a trained mini experiment."""
    from tests.test_eval import _full_setup
    from examples.encode_wav import main as encode_main
    from vqvae_speech_tpu.data.vctk import VCTK

    root, exps, store_root = _full_setup(tmp_path)
    vctk = VCTK(root, shuffle_seed=0)
    out_path = os.path.join(root, "codes.npy")
    rc = encode_main([
        "--wav", vctk.audios[0],
        "--experiments_path", os.path.join(root, "experiments"),
        "--experiment_name", "ev",
        "--normalizer_path", os.path.join(root, "stats.pickle"),
        "--out", out_path,
    ])
    assert rc == 0
    codes = np.load(out_path)
    assert codes.shape == (24,)
    assert codes.min() >= 0


def test_repulsion_vq_separates_codes():
    """old/vqvae_2d_direct_fixed.py variant: the repulsive force keeps codes
    from collapsing onto each other while still clustering the data."""
    from examples.vq_2d_repulsion import train_repulsion_vq
    from vqvae_speech_tpu.models.vq_repulsion import codebook_repulsion
    import jax.numpy as jnp

    data, labels = generate_2d_clusters(n_points=300, n_clusters=5, noise=0.2)
    state, assignments, history, _ = train_repulsion_vq(
        data, n_epochs=60, num_embeddings=8)
    from sklearn.metrics import adjusted_rand_score

    assert adjusted_rand_score(labels, assignments) > 0.5
    # pairwise code distances respect the repulsion: no two codes collapsed
    cb = np.asarray(state["codebook"])
    d = np.linalg.norm(cb[:, None] - cb[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.05

    # unit behavior: two coincident codes get pushed apart, distant pair not
    cb2 = jnp.asarray([[0.0, 0.0], [0.1, 0.0], [10.0, 10.0]])
    moved = np.asarray(codebook_repulsion(cb2, strength=0.1, min_distance=2.0))
    assert np.linalg.norm(moved[0] - moved[1]) > 0.1
    np.testing.assert_allclose(moved[2], [10.0, 10.0], atol=1e-6)


def test_improved_vq_resets_dead_codes():
    """old/vqvae_2d_improved.py variant: dead codes are re-seeded from input
    rows and the usage EMA restarts at 0.1."""
    from vqvae_speech_tpu.models.vq_repulsion import reset_dead_codes
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    K, D = 6, 2
    cb = jnp.asarray(rng.standard_normal((K, D)).astype(np.float32))
    usage = jnp.asarray([0.5, 0.001, 0.3, 0.0, 0.2, 0.4])
    flat = jnp.asarray(rng.standard_normal((50, D)).astype(np.float32))
    r = reset_dead_codes(jax.random.PRNGKey(1), cb, cb,
                         jnp.ones((K,)) * 5.0, usage, flat, threshold=0.01)
    assert int(r.num_reset) == 2
    flat_np = np.asarray(flat)
    for k in (1, 3):  # dead codes now equal some input row
        assert any(np.allclose(np.asarray(r.codebook[k]), row)
                   for row in flat_np)
        assert float(r.usage[k]) == 0.1
        assert float(r.cluster_size[k]) == 1.0
    for k in (0, 2, 4, 5):  # live codes untouched
        np.testing.assert_array_equal(np.asarray(r.codebook[k]),
                                      np.asarray(cb[k]))
    # the two dead codes get DISTINCT rows
    assert not np.allclose(np.asarray(r.codebook[1]), np.asarray(r.codebook[3]))


def test_improved_vq_end_to_end(tmp_path):
    from examples.vq_2d_repulsion import train_repulsion_vq

    data, labels = generate_2d_clusters(n_points=300, n_clusters=5, noise=0.2)
    state, assignments, history, resets = train_repulsion_vq(
        data, n_epochs=90, num_embeddings=8, improved=True)
    from sklearn.metrics import adjusted_rand_score

    assert adjusted_rand_score(labels, assignments) > 0.5
    assert history[-1]["loss"] < history[0]["loss"] * 5  # no blow-up
