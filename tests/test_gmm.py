"""Tests of the JAX EM Gaussian mixture against sklearn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _blobs(rng, n_per=300):
    means = np.array([[0.0, 0.0], [4.0, 4.0], [-4.0, 5.0]])
    covs = [np.array([[0.3, 0.1], [0.1, 0.2]]),
            np.array([[0.5, -0.2], [-0.2, 0.4]]),
            np.diag([0.2, 0.6])]
    X = np.concatenate([rng.multivariate_normal(m, c, n_per)
                        for m, c in zip(means, covs)])
    y = np.repeat(np.arange(3), n_per)
    return X.astype(np.float32), y


def _label_agreement(a, b, k):
    """Best-permutation agreement between two labelings."""
    from itertools import permutations
    best = 0.0
    for perm in permutations(range(k)):
        mapped = np.asarray(perm)[a]
        best = max(best, float(np.mean(mapped == b)))
    return best


def test_gmm_separates_blobs(rng):
    from basicrta_tpu.postprocess.gmm import gmm_fit_predict
    X, y = _blobs(rng)
    labels, params = gmm_fit_predict(jax.random.key(0), jnp.asarray(X),
                                     jnp.asarray(X), n_components=3,
                                     n_init=8, max_iter=60)
    assert _label_agreement(np.asarray(labels), y, 3) > 0.98
    assert np.isfinite(float(params.lower_bound))


@pytest.mark.slow
def test_gmm_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.mixture")
    from basicrta_tpu.postprocess.gmm import gmm_fit_predict
    X, _ = _blobs(rng)
    ours, _ = gmm_fit_predict(jax.random.key(1), jnp.asarray(X),
                              jnp.asarray(X), n_components=3, n_init=8)
    sk = sklearn.GaussianMixture(n_components=3, n_init=8,
                                 random_state=0).fit_predict(X)
    assert _label_agreement(np.asarray(ours), sk, 3) > 0.98


def test_gmm_sample_weights(rng):
    """Zero-weight padding points must not affect the fit."""
    from basicrta_tpu.postprocess.gmm import gmm_fit_predict
    X, y = _blobs(rng)
    pad = rng.normal(50.0, 1.0, size=(100, 2)).astype(np.float32)
    Xp = np.concatenate([X, pad])
    w = np.concatenate([np.ones(len(X)), np.zeros(len(pad))]).astype(
        np.float32)
    labels, _ = gmm_fit_predict(jax.random.key(2), jnp.asarray(Xp),
                                jnp.asarray(X), n_components=3, n_init=8,
                                train_weights=jnp.asarray(w))
    assert _label_agreement(np.asarray(labels), y, 3) > 0.98


def test_kmeanspp_bitwise_matches_original_schedule(rng):
    """Round-5 schedule changes (incremental seeding min-distance, Lloyd
    while_loop freeze) must be BITWISE no-ops vs the original
    full-matrix seeding + fixed-length Lloyd formulation."""
    import jax
    import jax.numpy as jnp
    from basicrta_tpu.postprocess.gmm import _kmeanspp_init

    def original(key, X, sw, n_components, lloyd_iters=10):
        N = X.shape[0]
        k0, key = jax.random.split(key)
        first = jax.random.choice(k0, N, p=sw / jnp.sum(sw))
        centers0 = jnp.tile(X[first], (n_components, 1))

        def seed_step(carry, key_c):
            centers, c_idx = carry
            d2 = jnp.min(
                jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2,
                        axis=-1)
                + jnp.where(jnp.arange(n_components)[None, :] < c_idx,
                            0.0, jnp.inf), axis=1)
            p = sw * d2
            p = jnp.where(jnp.isfinite(p), p, 0.0)
            nxt = jax.random.choice(key_c, N,
                                    p=p / jnp.maximum(jnp.sum(p), 1e-30))
            centers = centers.at[c_idx].set(X[nxt])
            return (centers, c_idx + 1), None

        keys = jax.random.split(key, n_components - 1)
        (centers, _), _ = jax.lax.scan(seed_step, (centers0, 1), keys)

        def lloyd(centers, _):
            d2 = jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2,
                         axis=-1)
            assign = jnp.argmin(d2, axis=1)
            onehot = jax.nn.one_hot(assign, n_components, dtype=X.dtype)
            onehot = onehot * sw[:, None]
            Nk = jnp.maximum(jnp.sum(onehot, axis=0), 1e-12)
            new = (onehot.T @ X) / Nk[:, None]
            new = jnp.where(jnp.sum(onehot, axis=0)[:, None] > 0, new,
                            centers)
            return new, None

        centers, _ = jax.lax.scan(lloyd, centers, None,
                                  length=lloyd_iters)
        return centers

    X, _ = _blobs(rng)
    X = jnp.asarray(X)
    sw = jnp.ones(X.shape[0], X.dtype)
    for seed in (0, 3, 11):
        a = np.asarray(_kmeanspp_init(jax.random.key(seed), X, sw, 4))
        b = np.asarray(original(jax.random.key(seed), X, sw, 4))
        np.testing.assert_array_equal(a, b)
