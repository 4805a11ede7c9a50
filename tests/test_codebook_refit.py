"""Eval-side codebook refit (X extension — see eval/codebook_refit.py)."""
import numpy as np

from vqvae_speech_tpu.eval.codebook_refit import kmeans_refit


def test_refit_recovers_separated_clusters():
    rng = np.random.default_rng(0)
    true_centers = rng.standard_normal((6, 8)) * 10.0
    X = np.concatenate([c + 0.1 * rng.standard_normal((50, 8))
                        for c in true_centers])
    # start from a poor codebook: tiny uniform rows (the reference's
    # gradient-VQ init scale), far from the data
    init = rng.uniform(-1 / 6, 1 / 6, (6, 8))
    cents, assign = kmeans_refit(init, X, iters=100)
    # every true cluster maps to exactly one code, all codes live
    assert len(set(assign.tolist())) == 6
    for j in range(6):
        block = assign[j * 50:(j + 1) * 50]
        assert len(set(block.tolist())) == 1
    # centers land on the true ones (order-free)
    d = ((cents[:, None] - true_centers[None]) ** 2).sum(-1)
    assert float(d.min(axis=1).max()) < 0.1


def test_refit_handles_dead_codes():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((40, 4))
    init = np.concatenate([X[:3], 1e6 * np.ones((2, 4))])  # 2 dead rows
    cents, assign = kmeans_refit(init, X, iters=100)
    assert len(set(assign.tolist())) == 5     # dead codes re-seeded
    assert np.isfinite(cents).all()


def test_refit_preserves_dtype_and_shapes():
    rng = np.random.default_rng(2)
    cb = rng.standard_normal((8, 16)).astype(np.float32)
    X = rng.standard_normal((100, 16)).astype(np.float32)
    cents, assign = kmeans_refit(cb, X)
    assert cents.shape == cb.shape and cents.dtype == np.float32
    assert assign.shape == (100,)


def test_sqdist_matches_bruteforce():
    """The expanded-norm distance form (||x||^2 - 2xc + ||c||^2 — used so
    real-VCTK-scale latent clouds never materialize an (M, K, D) float64
    broadcast) must agree with the direct form to fp roundoff and never
    go negative."""
    from vqvae_speech_tpu.eval.codebook_refit import _sqdist

    rng = np.random.default_rng(3)
    X = rng.standard_normal((200, 64)) * 5.0
    C = rng.standard_normal((44, 64)) * 5.0
    want = ((X[:, None] - C[None]) ** 2).sum(-1)
    got = _sqdist(X, C)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-8)
    assert (got >= 0).all()
    # near-duplicate points: cancellation must clamp at 0, not go negative
    Xd = np.repeat(C[:5], 3, axis=0) + 1e-9
    assert (_sqdist(Xd, C) >= 0).all()


def test_lloyd_kmeans_matches_original_inline_semantics():
    """lloyd_kmeans is the shared implementation behind the analysis
    scripts' previously-inlined k-means (random data-point init, empty
    clusters keep their center, allclose stop): same assignments as a
    direct transcription of that inline loop on the same seed."""
    from vqvae_speech_tpu.eval.codebook_refit import lloyd_kmeans

    rng = np.random.default_rng(4)
    F = np.concatenate([rng.standard_normal((60, 8)) + 6 * j
                        for j in range(3)]).astype(np.float64)

    def inline_kmeans(F, k, seed, iters=50):
        r = np.random.default_rng(seed)
        cents = F[r.choice(len(F), k, replace=False)]
        for _ in range(iters):
            d = ((F[:, None] - cents[None]) ** 2).sum(-1)
            a = np.argmin(d, 1)
            new = np.stack([F[a == j].mean(0) if (a == j).any() else cents[j]
                            for j in range(k)])
            if np.allclose(new, cents):
                break
            cents = new
        return a

    got = lloyd_kmeans(F, 3, seed=7)
    want = inline_kmeans(F, 3, seed=7)
    assert (got == want).all()
    # and it actually separates the three blobs
    assert len(set(got.tolist())) == 3


def test_kmeanspp_init_survives_collapsed_cloud():
    """Fewer distinct points than K (the encoder-collapse regime this tool
    studies) must not crash the kmeans++ leg with an all-zero probability
    vector; the refit still returns a full solution."""
    rng = np.random.default_rng(5)
    X = np.repeat(rng.standard_normal((2, 16)), 40, axis=0)  # 2 distinct
    cb = rng.standard_normal((6, 16))
    cents, assign = kmeans_refit(cb, X)
    assert cents.shape == (6, 16)
    assert assign.shape == (80,)
    assert np.isfinite(cents).all()
