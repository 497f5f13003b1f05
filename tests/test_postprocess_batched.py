"""Direct coverage of the bucketed cross-residue post-processing
(``postprocess.batched``), the device replacement for the reference's
pooled per-residue ``reprocess`` (reference cluster.py:54-76).

Uses hand-built posterior chains with two well-separated surviving
components so the expected clustering is unambiguous: lmode detection,
GMM labeling, tiered vote accumulation, and rate-sorted relabeling must
all agree with the single-residue ``process_samples`` path (statistically;
the two paths use independent PRNG streams).
"""

import numpy as np
import pytest

from basicrta_tpu.config import GibbsConfig
from basicrta_tpu.postprocess.batched import process_residues_batched
from basicrta_tpu.postprocess.clustering import process_samples

# truth: fast component (rate 5.0, weight 0.7), slow (rate 0.05, weight 0.3)
_W_TRUE = (0.7, 0.3)
_R_TRUE = (5.0, 0.05)
_CFG = GibbsConfig(ncomp=8, niter=6000, g=100, burnin=1000, gmm_n_init=16)


def _fake_chain(rng, S, K):
    """(S, K) thinned weight/rate samples: two surviving components around
    the truth, the rest dead (weight far below any wcutoff)."""
    W = rng.uniform(1e-7, 1e-6, (S, K))
    R = rng.uniform(0.5, 2.0, (S, K))
    W[:, 0] = _W_TRUE[0] * np.exp(rng.normal(0.0, 0.05, S))
    W[:, 1] = _W_TRUE[1] * np.exp(rng.normal(0.0, 0.05, S))
    R[:, 0] = _R_TRUE[0] * np.exp(rng.normal(0.0, 0.05, S))
    R[:, 1] = _R_TRUE[1] * np.exp(rng.normal(0.0, 0.05, S))
    return W, R


def _fake_residue(rng, n_events, S=60, K=8):
    W, R = _fake_chain(rng, S, K)
    raw = np.where(rng.random(n_events) < _W_TRUE[0],
                   rng.exponential(1.0 / _R_TRUE[0], n_events),
                   rng.exponential(1.0 / _R_TRUE[1], n_events))
    ts = 0.1
    disc = np.maximum(np.round(raw / ts), 1.0) * ts
    values, counts = np.unique(disc, return_counts=True)
    return (W[None], R[None], values.astype(np.float64),
            counts.astype(np.float64))


@pytest.fixture(scope="module")
def batch_results():
    rng = np.random.default_rng(42)
    # sizes spread across pad-ladder buckets (incl. one crossing 128 floor)
    items = {f"R{i}": _fake_residue(rng, n)
             for i, n in enumerate([800, 1500, 3000, 5200, 9000])}
    return items, process_residues_batched(items, _CFG)


def test_lmode_and_shapes(batch_results):
    items, results = batch_results
    assert set(results) == set(items)
    for name, res in results.items():
        assert res.lmode == 2, name
        V = len(items[name][2])
        assert res.pindicator_values.shape == (V, 2)


def test_pindicator_rows_stochastic(batch_results):
    _, results = batch_results
    for res in results.values():
        np.testing.assert_allclose(res.pindicator_values.sum(axis=1), 1.0,
                                   atol=1e-5)


def test_membership_tracks_timescale(batch_results):
    """After rate sorting, cluster 0 is the fast process: short residence
    values must belong to it, long values to the slow cluster 1."""
    items, results = batch_results
    for name, res in results.items():
        values = items[name][2]
        pind = res.pindicator_values
        short = values < 0.3        # ~1.5/rate_fast
        long = values > 20.0        # ~1/rate_slow
        assert short.any() and long.any(), name
        assert pind[short, 0].mean() > 0.8, name
        assert pind[long, 1].mean() > 0.8, name


@pytest.mark.slow
def test_agrees_with_single_residue_path(batch_results):
    """The batched path must match ``process_samples`` per residue:
    identical lmode and labels, vote probabilities within Monte-Carlo
    tolerance (independent PRNG streams)."""
    import jax

    items, results = batch_results
    name = "R1"
    mcw, mcr, values, counts = items[name]
    single = process_samples(jax.random.key(3), mcw[0], mcr[0], values,
                             counts, _CFG)
    batched = results[name]
    assert single.lmode == batched.lmode
    np.testing.assert_array_equal(single.labels, batched.labels)
    np.testing.assert_allclose(single.pindicator_values,
                               batched.pindicator_values, atol=0.1)


@pytest.mark.slow
def test_sharded_matches_unsharded(batch_results):
    """Lane-sharding the bucket programs over the 8-device mesh is a pure
    partition (per-residue keys, shared tier maxima unchanged by the
    replicated pad lanes): results must match the unsharded run."""
    from basicrta_tpu.parallel.mesh import lane_sharding, make_mesh

    items, results = batch_results
    sh = lane_sharding(make_mesh(n_lanes=8))
    sharded = process_residues_batched(items, _CFG, sharding=sh)
    for name, res in results.items():
        assert sharded[name].lmode == res.lmode
        np.testing.assert_array_equal(sharded[name].labels, res.labels)
        np.testing.assert_allclose(sharded[name].pindicator_values,
                                   res.pindicator_values, atol=1e-5)


@pytest.mark.slow
def test_pooled_chain_selection():
    """chain='pooled' concatenates post-burn-in samples of every chain
    behind one burn-in prefix (cf. Gibbs.process_gibbs)."""
    rng = np.random.default_rng(7)
    mcw, mcr, values, counts = _fake_residue(rng, 2000)
    mcw2 = np.concatenate([mcw, mcw], axis=0)  # two identical chains
    mcr2 = np.concatenate([mcr, mcr], axis=0)
    out = process_residues_batched(
        {"X": (mcw2, mcr2, values, counts)}, _CFG, chain="pooled")
    res = out["X"]
    assert res.lmode == 2
    S = mcw.shape[1]
    b = _CFG.burnin_samples
    # pooled: burn-in prefix + 2x post-burn-in samples survive filtering
    assert len(res.data) == 2 * 2 * (S - b)


@pytest.mark.slow
def test_votes_chunking_bitwise_matches_sequential():
    """The round-5 chunked vote scan (CH samples batched per step, adds
    kept in sample order) must reproduce the sequential per-sample scan
    BITWISE — same per-sample keys, same accumulation order."""
    import jax
    import jax.numpy as jnp
    from basicrta_tpu.postprocess.batched import _votes_bucket_core
    from basicrta_tpu.sampler.kernels import _tiered_multinomial

    rng = np.random.default_rng(5)
    B, S, K, V, L = 2, 30, 5, 64, 3     # S=30 -> CH=15 path
    W = rng.dirichlet(np.ones(K), (B, S)).astype(np.float32)
    R = rng.gamma(2.0, 1.0, (B, S, K)).astype(np.float32)
    values = np.sort(rng.uniform(0.1, 50, (B, V))).astype(np.float32)
    counts = rng.integers(0, 30, (B, V)).astype(np.float32)
    labels = rng.integers(0, L, (B, S, K)).astype(np.int32)
    keys = jnp.stack([jax.random.key(7 + i) for i in range(B)])
    tiers = (16, 32)
    got = np.asarray(_votes_bucket_core(
        keys, jnp.asarray(W), jnp.asarray(R), jnp.asarray(values),
        jnp.asarray(counts), jnp.asarray(labels), L, tiers))

    # sequential reference: the original CH=1 scan, written as a loop
    for b in range(B):
        votes = np.zeros((V, L), np.float32)
        sub = jax.random.split(keys[b], S)
        for s in range(S):
            logz = (np.log(W[b, s])[None, :] + np.log(R[b, s])[None, :]
                    - values[b][:, None] * R[b, s][None, :])
            z = jax.nn.softmax(jnp.asarray(logz), axis=-1)
            m = np.asarray(_tiered_multinomial(
                sub[s], jnp.asarray(counts[b]), z, tiers))
            onehot = np.eye(L, dtype=np.float32)[labels[b, s]]
            votes = votes + m @ onehot
        np.testing.assert_array_equal(got[b], votes)
