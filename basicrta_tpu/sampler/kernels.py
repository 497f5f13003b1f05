r"""Jitted Gibbs-sweep kernels for the exponential mixture model.

Model (reference gibbs.py:91-219): residence times ``x_i`` are drawn from a
K-component exponential mixture with weights ``w`` and rates ``r``;
conjugate priors are Dirichlet(alpha) on ``w`` and Gamma(a, b) on each rate.
One Gibbs sweep:

1. responsibilities ``z_ik \propto w_k r_k exp(-r_k x_i)``
   (reference gibbs.py:196-197),
2. component indicators ``s_i ~ Categorical(z_i)`` — the reference draws
   these with an N x K multinomial + argmax (gibbs.py:200); on TPU we use
   Gumbel-max via ``jax.random.categorical`` on the logits, which is the
   same distribution without materializing the sample tensor,
3. sufficient statistics ``N_k = #\{s_i = k\}`` and ``T_k = sum x_i [s_i=k]``
   (gibbs.py:203-207) — computed here as a one-hot matmul so the reduction
   rides the MXU,
4. conjugate draws ``w ~ Dirichlet(alpha + N)`` and
   ``r_k ~ Gamma(a + N_k, rate = b + T_k)`` (gibbs.py:210-211).

Two exact formulations are provided:

- **dense**: one categorical per event (N draws / sweep). Matches the
  reference literally.
- **collapsed**: residence times are integer multiples of the trajectory
  interval, so a residue's N events collapse to V << N unique values with
  multiplicities c_v. Given (w, r), events with equal value have identical
  responsibility rows, so the per-component counts of each value are
  ``m_v ~ Multinomial(c_v, z_v)`` and (N, T) = (sum_v m_v, sum_v v m_v).
  The induced chain over (w, r) is *identical in law* to the dense chain —
  this is deduplication of exchangeable draws, not an approximation — at
  ~N/V times less work per sweep (~21x on the bundled W313 dataset).

All kernels are pure functions of an explicit PRNG key, jit/vmap/shard_map
friendly, f32 on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from basicrta_tpu.config import GibbsConfig


class MixtureState(NamedTuple):
    """Carry of the Gibbs chain."""
    weights: jax.Array  # (K,) f32
    rates: jax.Array    # (K,) f32


def init_mixture_params(ncomp: int, dtype=jnp.float32) -> MixtureState:
    """Deterministic log-spaced initialization.

    Rates span 0.5 * 10^[1 .. -(K-2)] (descending) and weights are a
    normalized geometric ladder 9 * 10^-(1..K) (reference gibbs.py:186-188),
    which seeds one component per decade of timescale.
    """
    inrates = 0.5 * 10.0 ** np.arange(-ncomp + 2, 2, dtype=np.float64)
    tmpw = 9.0 * 10.0 ** (-np.arange(1, ncomp + 1, dtype=np.float64))
    weights = tmpw / tmpw.sum()
    rates = inrates[::-1]
    return MixtureState(jnp.asarray(weights, dtype), jnp.asarray(rates, dtype))


def dedup_times(times: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Collapse residence times to (unique values, multiplicities)."""
    values, counts = np.unique(np.asarray(times, dtype=np.float64),
                               return_counts=True)
    return values, counts


def _log_responsibilities(state: MixtureState, values: jax.Array) -> jax.Array:
    """Unnormalized log responsibilities, shape (V, K)."""
    logw = jnp.log(state.weights)
    logr = jnp.log(state.rates)
    return logw[None, :] + logr[None, :] - values[:, None] * state.rates[None, :]


def _conjugate_update(key: jax.Array, Ns: jax.Array, Ts: jax.Array,
                      alpha: float, a: float, b: float) -> MixtureState:
    """Dirichlet/Gamma conjugate posterior draws (reference gibbs.py:210-211)."""
    kw, kr = jax.random.split(key)
    weights = jax.random.dirichlet(kw, alpha + Ns)
    rates = jax.random.gamma(kr, a + Ns) / (b + Ts)
    return MixtureState(weights, rates)


def multinomial_counts(key: jax.Array, n: jax.Array, probs: jax.Array,
                       float_dtype=jnp.float32) -> jax.Array:
    """Exact batched multinomial sampling via a binomial chain.

    For each row v: ``m_v ~ Multinomial(n_v, probs_v)``. Decomposed into K-1
    sequential conditional binomials
    ``m_k ~ Binomial(n - sum_{j<k} m_j, p_k / suffix_k)`` with the last
    component absorbing the remainder — exact, and vectorized over V on the
    VPU.

    Args:
        key: PRNG key.
        n: (V,) trial counts (int32 or float).
        probs: (V, K) row-stochastic probabilities.
    Returns:
        (V, K) float counts (integer-valued).
    """
    K = probs.shape[-1]
    # suffix_k = sum_{j >= k} p_j, computed without reversal gymnastics
    suffix = jnp.cumsum(probs[..., ::-1], axis=-1)[..., ::-1]
    n = n.astype(float_dtype)

    def step(rem, xs):
        pk, sk, key_k = xs
        pcond = jnp.clip(pk / jnp.maximum(sk, jnp.finfo(float_dtype).tiny),
                         0.0, 1.0)
        draw = jax.random.binomial(key_k, rem, pcond, dtype=float_dtype)
        draw = jnp.minimum(draw, rem)
        return rem - draw, draw

    keys = jax.random.split(key, K - 1)
    rem, head = jax.lax.scan(
        step, n,
        (jnp.moveaxis(probs, -1, 0)[:-1], jnp.moveaxis(suffix, -1, 0)[:-1],
         keys))
    # head: (K-1, V); remainder goes to the last component.
    return jnp.concatenate(
        [jnp.moveaxis(head, 0, -1), rem[..., None]], axis=-1)


def dense_sweep(key: jax.Array, state: MixtureState, times: jax.Array,
                mask: Optional[jax.Array], cfg: GibbsConfig,
                return_indicator: bool = False):
    """One Gibbs sweep over raw per-event times, shape (N,).

    ``mask`` (optional, (N,) 0/1) excludes padded events from the sufficient
    statistics so residues of different sizes can share a padded batch shape.
    """
    kcat, kconj = jax.random.split(key)
    logz = _log_responsibilities(state, times)                    # (N, K)
    s = jax.random.categorical(kcat, logz, axis=-1)               # (N,)
    onehot = jax.nn.one_hot(s, cfg.ncomp, dtype=times.dtype)      # (N, K)
    if mask is not None:
        onehot = onehot * mask[:, None]
    Ns = jnp.sum(onehot, axis=0)
    Ts = times @ onehot                                           # MXU matmul
    new_state = _conjugate_update(kconj, Ns, Ts, cfg.alpha_eff,
                                  cfg.gamma_shape, cfg.gamma_rate)
    if return_indicator:
        return new_state, s.astype(jnp.uint8)
    return new_state, None


def collapsed_sweep(key: jax.Array, state: MixtureState, values: jax.Array,
                    counts: jax.Array, cfg: GibbsConfig,
                    return_counts: bool = False):
    """One Gibbs sweep over deduplicated (value, multiplicity) pairs.

    Padded rows are expressed as ``counts == 0`` and contribute nothing.
    """
    kmult, kconj = jax.random.split(key)
    logz = _log_responsibilities(state, values)                   # (V, K)
    probs = jax.nn.softmax(logz, axis=-1)
    m = multinomial_counts(kmult, counts, probs)                  # (V, K)
    Ns = jnp.sum(m, axis=0)
    Ts = values @ m                                               # (K,)
    new_state = _conjugate_update(kconj, Ns, Ts, cfg.alpha_eff,
                                  cfg.gamma_shape, cfg.gamma_rate)
    if return_counts:
        return new_state, m
    return new_state, None


def _thinned_scan(sweep_fn, key: jax.Array, state: MixtureState,
                  cfg: GibbsConfig):
    """Run ``niter`` sweeps, emitting the state every ``g`` sweeps.

    The reference saves the state after sweeps g, 2g, ..., niter
    (gibbs.py:214-217); we structure this as an outer ``lax.scan`` of length
    niter//g over an inner scan of g sweeps, so XLA compiles a single
    two-level loop and the thinned output tensor is written in place.
    """
    n_blocks = cfg.niter // cfg.g

    def block(state, block_key):
        sweep_keys = jax.random.split(block_key, cfg.g)
        state, _ = jax.lax.scan(
            lambda st, k: (sweep_fn(k, st)[0], None), state, sweep_keys)
        return state, (state.weights, state.rates)

    block_keys = jax.random.split(key, n_blocks)
    _, (W, R) = jax.lax.scan(block, state, block_keys)
    return W, R  # each (n_samples, K)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mode"))
def run_chain(key: jax.Array, times_or_values: jax.Array,
              counts_or_mask: Optional[jax.Array], cfg: GibbsConfig,
              mode: str = "collapsed"):
    """Run one full Gibbs chain; returns thinned (weights, rates) samples.

    Args:
        key: PRNG key for the chain.
        times_or_values: (N,) raw times for ``mode='dense'`` or (V,) unique
            values for ``mode='collapsed'``.
        counts_or_mask: (V,) multiplicities for collapsed mode (0 marks
            padding); optional (N,) 0/1 mask for dense mode.
        cfg: sampler configuration (static).
        mode: 'collapsed' or 'dense' (static).

    Returns:
        (mcweights, mcrates): each (niter//g, ncomp) f32.
    """
    state = init_mixture_params(cfg.ncomp, times_or_values.dtype)
    if mode == "collapsed":
        sweep = lambda k, st: collapsed_sweep(k, st, times_or_values,
                                              counts_or_mask, cfg)
    elif mode == "dense":
        sweep = lambda k, st: dense_sweep(k, st, times_or_values,
                                          counts_or_mask, cfg)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return _thinned_scan(sweep, key, state, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "mode", "n_chains"))
def run_chains(key: jax.Array, times_or_values: jax.Array,
               counts_or_mask: Optional[jax.Array], cfg: GibbsConfig,
               mode: str = "collapsed", n_chains: int = 1):
    """vmap ``run_chain`` over independent chains (capability upgrade over
    the reference's single chain per residue, enabling convergence
    diagnostics; SURVEY.md section 2 'chain parallelism')."""
    keys = jax.random.split(key, n_chains)
    return jax.vmap(
        lambda k: run_chain(k, times_or_values, counts_or_mask, cfg, mode)
    )(keys)


@functools.partial(jax.jit, static_argnames=("cfg", "rao"))
def sample_indicator_counts(key: jax.Array, mcweights: jax.Array,
                            mcrates: jax.Array, values: jax.Array,
                            counts: jax.Array, cfg: GibbsConfig,
                            rao: bool = False):
    """Per-value component-assignment counts for each saved posterior sample.

    The reference stores the indicator drawn during sampling (gibbs.py:217)
    and, when missing, resamples it from the saved (weights, rates)
    (gibbs.py:321-334, ``_sample_indicator``) — establishing that fresh
    conditional draws are an accepted substitute. We adopt that as the
    primary design: the sampler stores only (weights, rates), and indicator
    statistics are (re)generated here, vectorized over saves.

    Args:
        mcweights, mcrates: (S, K) thinned samples.
        values: (V,) unique residence-time values.
        counts: (V,) multiplicities.
        rao: if True, return expected counts ``c_v * z_vk`` (Rao-
            Blackwellized, deterministic) instead of sampled counts.

    Returns:
        (S, V, K) float counts.
    """
    def per_save(k, w, r):
        logz = (jnp.log(w)[None, :] + jnp.log(r)[None, :]
                - values[:, None] * r[None, :])
        probs = jax.nn.softmax(logz, axis=-1)
        if rao:
            return counts[:, None] * probs
        return multinomial_counts(k, counts, probs)

    S = mcweights.shape[0]
    keys = jax.random.split(key, S)
    return jax.lax.map(lambda args: per_save(*args),
                       (keys, mcweights, mcrates))
