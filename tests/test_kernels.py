"""Tests of the jitted Gibbs-sweep kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basicrta_tpu.config import GibbsConfig
from basicrta_tpu.sampler.kernels import (
    init_mixture_params, multinomial_counts, dense_sweep, collapsed_sweep,
    run_chain, run_chains, dedup_times, sample_indicator_counts)


def test_init_mixture_params():
    st = init_mixture_params(15)
    assert st.weights.shape == (15,) and st.rates.shape == (15,)
    assert jnp.sum(st.weights) == pytest.approx(1.0, rel=1e-6)
    # rates descend over decades (reference gibbs.py:186-188)
    assert np.all(np.diff(np.asarray(st.rates)) < 0)
    assert st.rates[0] == pytest.approx(5.0)  # 0.5 * 10^1


def test_multinomial_counts_exact():
    key = jax.random.key(0)
    n = jnp.array([100, 0, 7, 100000], dtype=jnp.int32)
    p = jnp.array([[0.5, 0.3, 0.2],
                   [0.1, 0.1, 0.8],
                   [1.0, 0.0, 0.0],
                   [0.25, 0.25, 0.5]], dtype=jnp.float32)
    m = np.asarray(multinomial_counts(key, n, p))
    assert m.shape == (4, 3)
    assert np.allclose(m.sum(axis=1), np.asarray(n))  # exact totals
    assert np.all(m >= 0)
    assert np.allclose(m[1], 0)            # zero trials -> zero counts
    assert m[2, 0] == 7                    # degenerate p -> all in comp 0
    # large-n row matches expectation within 5 sigma
    exp = 100000 * np.asarray(p[3])
    sd = np.sqrt(exp * (1 - np.asarray(p[3])))
    assert np.all(np.abs(m[3] - exp) < 5 * sd)


def test_multinomial_counts_distribution():
    """Empirical mean/cov of repeated draws matches the multinomial law."""
    K = 4
    p = np.array([0.4, 0.3, 0.2, 0.1], dtype=np.float32)
    n = 50
    reps = 4000
    keys = jax.random.split(jax.random.key(1), reps)
    draw = jax.vmap(lambda k: multinomial_counts(
        k, jnp.full((1,), n, jnp.int32), jnp.asarray(p)[None, :])[0])
    m = np.asarray(draw(keys))                       # (reps, K)
    mean = m.mean(axis=0)
    assert np.allclose(mean, n * p, atol=4 * np.sqrt(n * p * (1 - p) / reps))
    var = m.var(axis=0)
    assert np.allclose(var, n * p * (1 - p), rtol=0.15)


@pytest.mark.parametrize("mode", ["dense", "collapsed"])
@pytest.mark.slow
def test_single_sweep_shapes(mode, synthetic_times):
    x, _, _ = synthetic_times
    cfg = GibbsConfig(ncomp=5, niter=10, g=1)
    st = init_mixture_params(cfg.ncomp)
    key = jax.random.key(0)
    if mode == "dense":
        new, _ = dense_sweep(key, st, jnp.asarray(x, jnp.float32), None, cfg)
    else:
        v, c = dedup_times(x)
        new, _ = collapsed_sweep(key, st, jnp.asarray(v, jnp.float32),
                                 jnp.asarray(c, jnp.float32), cfg)
    assert new.weights.shape == (5,)
    assert jnp.sum(new.weights) == pytest.approx(1.0, rel=1e-5)
    assert np.all(np.asarray(new.rates) > 0)


@pytest.mark.slow
def test_dense_collapsed_agree(synthetic_times):
    """The collapsed chain is the dense chain in law: posterior moments of
    the dominant components must agree across formulations."""
    x, w_true, r_true = synthetic_times
    cfg = GibbsConfig(ncomp=5, niter=2000, g=10, burnin=500)
    v, c = dedup_times(x)
    key = jax.random.key(42)
    Wc, Rc = run_chain(key, jnp.asarray(v, jnp.float32),
                       jnp.asarray(c, jnp.float32), cfg, "collapsed")
    Wd, Rd = run_chain(key, jnp.asarray(x, jnp.float32), None, cfg, "dense")
    b = cfg.burnin_samples

    def top_component_stats(W, R):
        W, R = np.asarray(W[b:]), np.asarray(R[b:])
        i = W.mean(axis=0).argmax()
        return W.mean(axis=0)[i], R[:, i].mean()

    wc, rc = top_component_stats(Wc, Rc)
    wd, rd = top_component_stats(Wd, Rd)
    assert wc == pytest.approx(wd, rel=0.05)
    assert rc == pytest.approx(rd, rel=0.05)
    # and both recover the dominant true component
    assert wc == pytest.approx(w_true[0], rel=0.05)
    assert rc == pytest.approx(r_true[0], rel=0.10)


@pytest.mark.slow
def test_run_chains_vmap(synthetic_times):
    x, _, _ = synthetic_times
    cfg = GibbsConfig(ncomp=4, niter=300, g=10, burnin=100)
    v, c = dedup_times(x)
    W, R = run_chains(jax.random.key(0), jnp.asarray(v, jnp.float32),
                      jnp.asarray(c, jnp.float32), cfg, "collapsed",
                      n_chains=3)
    assert W.shape == (3, cfg.n_samples, 4)
    # chains are independent draws, not copies
    assert not np.allclose(np.asarray(W[0]), np.asarray(W[1]))


@pytest.mark.slow
def test_collapsed_padding_invariance(synthetic_times):
    """Zero-count padding rows contribute nothing to one sweep.

    (Multi-sweep trajectories are chaotic — a one-ulp reduction-order change
    decorrelates chains — so invariance is asserted at the sufficient-
    statistic level where it is exact up to float summation tolerance.)
    """
    x, _, _ = synthetic_times
    cfg = GibbsConfig(ncomp=4, niter=10, g=1)
    v, c = dedup_times(x)
    key = jax.random.key(5)
    st = init_mixture_params(cfg.ncomp)
    s1, m1 = collapsed_sweep(key, st, jnp.asarray(v, jnp.float32),
                             jnp.asarray(c, jnp.float32), cfg,
                             return_counts=True)
    vp = jnp.concatenate([jnp.asarray(v, jnp.float32),
                          jnp.ones(17, jnp.float32)])
    cp = jnp.concatenate([jnp.asarray(c, jnp.float32),
                          jnp.zeros(17, jnp.float32)])
    s2, m2 = collapsed_sweep(key, st, vp, cp, cfg, return_counts=True)
    assert np.allclose(np.asarray(m2[-17:]), 0)  # pads draw nothing
    assert np.allclose(np.asarray(m1), np.asarray(m2[:-17]))
    assert np.allclose(np.asarray(s1.weights), np.asarray(s2.weights),
                       rtol=1e-4)
    assert np.allclose(np.asarray(s1.rates), np.asarray(s2.rates), rtol=1e-4)


@pytest.mark.slow
def test_sample_indicator_counts(synthetic_times):
    x, _, _ = synthetic_times
    cfg = GibbsConfig(ncomp=4, niter=100, g=10)
    v, c = dedup_times(x)
    W, R = run_chain(jax.random.key(0), jnp.asarray(v, jnp.float32),
                     jnp.asarray(c, jnp.float32), cfg, "collapsed")
    m = sample_indicator_counts(jax.random.key(1), W, R,
                                jnp.asarray(v, jnp.float32),
                                jnp.asarray(c, jnp.float32), cfg)
    m = np.asarray(m)
    assert m.shape == (cfg.n_samples, len(v), cfg.ncomp)
    assert np.allclose(m.sum(axis=-1), np.asarray(c)[None, :])
    # Rao-Blackwellized variant returns expectations, same totals
    mr = np.asarray(sample_indicator_counts(
        jax.random.key(1), W, R, jnp.asarray(v, jnp.float32),
        jnp.asarray(c, jnp.float32), cfg, rao=True))
    assert np.allclose(mr.sum(axis=-1), np.asarray(c)[None, :], rtol=1e-4)
