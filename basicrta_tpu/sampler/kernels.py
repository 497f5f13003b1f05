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
from basicrta_tpu.ops import random as btrandom


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
                      alpha: float, a: float, b: float,
                      unroll: bool = False) -> MixtureState:
    """Dirichlet/Gamma conjugate posterior draws (reference gibbs.py:210-211).

    Uses the branch-free fixed-unroll samplers (ops.random) — the stock
    while_loop-based jax.random rejection samplers cost ~40-100 us of
    control-flow latency per call on TPU, which would dominate the sweep.
    """
    kw, kr = jax.random.split(key)
    weights = btrandom.dirichlet(kw, alpha + Ns, unroll=unroll)
    rates = btrandom.gamma(kr, a + Ns, unroll=unroll) / (b + Ts)
    return MixtureState(weights, rates)


def multinomial_counts(key: jax.Array, n: jax.Array, probs: jax.Array,
                       float_dtype=jnp.float32) -> jax.Array:
    """Exact batched multinomial sampling (branch-free binomial chain).

    For each row v: ``m_v ~ Multinomial(n_v, probs_v)``; see
    ops.random.multinomial.
    """
    return btrandom.multinomial(key, n, probs, float_dtype)


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


# Multiplicity bound of the middle tier: values with counts <= this use the
# complete small-table inversion sampler instead of the general one.
# 16 measured best on v5e (745k vs 742k agg sweeps/s at 8): widening the
# middle tier shrinks the expensive inversion+BTRS head tier by a whole
# 128-lane row on W313-profile data while the 17-step fixed inversion
# stays pure straight-line vector code.
SMALL_NMAX = 16


def _tiered_multinomial(key: jax.Array, counts: jax.Array, probs: jax.Array,
                        tiers: Optional[Tuple[int, int]],
                        unroll: bool = False) -> jax.Array:
    """Multinomial counts over the value axis, exploiting the multiplicity
    skew of residence-time data.

    With ``tiers = (head_end, single_start)`` and value columns sorted by
    multiplicity descending, three exact samplers split the work:

    - columns [0, head_end): unbounded counts -> inversion + BTRS chain,
    - columns [head_end, single_start): counts <= SMALL_NMAX -> complete
      small-table inversion chain (no rejection rounds),
    - columns [single_start, V): counts in {0, 1} -> one categorical draw.

    On the bundled W313 dataset 58% of unique values occur once and 87% at
    most 8 times, so the expensive sampler touches ~13% of columns.
    """
    if tiers is None:
        return btrandom.multinomial(key, counts, probs, unroll=unroll)
    head_end, single_start = tiers
    V = counts.shape[-1]
    k1, k2, k3 = jax.random.split(key, 3)
    parts = []
    if head_end > 0:
        parts.append(btrandom.multinomial(
            k1, counts[..., :head_end], probs[..., :head_end, :],
            unroll=unroll))
    if single_start > head_end:
        parts.append(btrandom.multinomial_small(
            k2, counts[..., head_end:single_start],
            probs[..., head_end:single_start, :], SMALL_NMAX,
            unroll=unroll))
    if V > single_start:
        parts.append(btrandom.multinomial_single(
            k3, counts[..., single_start:], probs[..., single_start:, :]))
    return jnp.concatenate(parts, axis=-2)


def collapsed_sweep(key: jax.Array, state: MixtureState, values: jax.Array,
                    counts: jax.Array, cfg: GibbsConfig,
                    return_counts: bool = False,
                    tiers: Optional[Tuple[int, int]] = None,
                    unroll: bool = False):
    """One Gibbs sweep over deduplicated (value, multiplicity) pairs.

    Padded rows are expressed as ``counts == 0`` and contribute nothing.
    ``tiers`` (static) enables the multiplicity-tiered sampler; it requires
    value columns sorted by multiplicity descending (see
    :func:`_tiered_multinomial`).
    """
    kmult, kconj = jax.random.split(key)
    logz = _log_responsibilities(state, values)                   # (V, K)
    probs = jax.nn.softmax(logz, axis=-1)
    m = _tiered_multinomial(kmult, counts, probs, tiers, unroll)  # (V, K)
    Ns = jnp.sum(m, axis=0)
    Ts = values @ m                                               # (K,)
    new_state = _conjugate_update(kconj, Ns, Ts, cfg.alpha_eff,
                                  cfg.gamma_shape, cfg.gamma_rate, unroll)
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


def compute_tiers(counts: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Sort value columns by multiplicity descending and return the static
    tier boundaries for :func:`_tiered_multinomial`.

    Works on (V,) or (B, V) count arrays; for batched input the boundaries
    are maxima over lanes, which keeps every lane's columns inside the
    correct tier.

    Returns:
        (order, (head_end, single_start)): ``order`` sorts the value axis.
    """
    counts = np.asarray(counts)
    order = np.argsort(-counts, axis=-1, kind="stable")
    sorted_counts = np.take_along_axis(counts, order, axis=-1)
    flat = sorted_counts.reshape(-1, sorted_counts.shape[-1])
    head_end = int(np.max(np.count_nonzero(flat > SMALL_NMAX, axis=-1)))
    single_start = int(np.max(np.count_nonzero(flat > 1, axis=-1)))
    single_start = max(single_start, head_end)
    return order, (head_end, single_start)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mode", "tiers"))
def run_chain(key: jax.Array, times_or_values: jax.Array,
              counts_or_mask: Optional[jax.Array], cfg: GibbsConfig,
              mode: str = "collapsed",
              tiers: Optional[Tuple[int, int]] = None):
    """Run one full Gibbs chain; returns thinned (weights, rates) samples.

    Args:
        key: PRNG key for the chain.
        times_or_values: (N,) raw times for ``mode='dense'`` or (V,) unique
            values for ``mode='collapsed'``.
        counts_or_mask: (V,) multiplicities for collapsed mode (0 marks
            padding); optional (N,) 0/1 mask for dense mode.
        cfg: sampler configuration (static).
        mode: 'collapsed' or 'dense' (static).
        tiers: static multiplicity-tier boundaries (see
            :func:`compute_tiers`); requires count-descending value order.

    Returns:
        (mcweights, mcrates): each (niter//g, ncomp) f32.
    """
    state = init_mixture_params(cfg.ncomp, times_or_values.dtype)
    if mode == "collapsed":
        sweep = lambda k, st: collapsed_sweep(k, st, times_or_values,
                                              counts_or_mask, cfg,
                                              tiers=tiers, unroll=True)
    elif mode == "dense":
        sweep = lambda k, st: dense_sweep(k, st, times_or_values,
                                          counts_or_mask, cfg)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return _thinned_scan(sweep, key, state, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "mode", "n_chains",
                                             "tiers"))
def run_chains(key: jax.Array, times_or_values: jax.Array,
               counts_or_mask: Optional[jax.Array], cfg: GibbsConfig,
               mode: str = "collapsed", n_chains: int = 1,
               tiers: Optional[Tuple[int, int]] = None):
    """vmap ``run_chain`` over independent chains (capability upgrade over
    the reference's single chain per residue, enabling convergence
    diagnostics; SURVEY.md section 2 'chain parallelism')."""
    keys = jax.random.split(key, n_chains)
    return jax.vmap(
        lambda k: run_chain(k, times_or_values, counts_or_mask, cfg, mode,
                            tiers)
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
