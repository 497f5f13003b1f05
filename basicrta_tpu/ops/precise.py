"""Precise f32 transcendentals for precision-AMPLIFIED sampler sites.

TPU transcendental lowerings approximate: Mosaic's native log/exp carry
~7e-5 relative error and XLA:TPU's are similar in kind — harmless for
probabilities, catastrophic wherever the result is amplified by a large
count. The canonical failure is the binomial PMF anchor
``pmf0 = exp(n log q)``: the n-fold amplification scales the whole CDF,
measured on a v5e as chi2 p ~ 0 for Binomial(16, 0.35) draws (the top
0.1% of uniforms walked off the inversion table) and a z = +23 mean bias
for Binomial(5000, 0.47) via the lgamma terms of the BTRS accept test
(VALIDATION.md "Device PRNG"). CPU backends use libm and were always
clean, which is why CPU-only CI never saw it.

These implementations use only bit manipulation + polynomials (~2 ulp,
validated against f64 in tests/test_pallas.py) and work identically
under XLA and inside Pallas kernels. Non-f32 dtypes fall through to the
native ops (f64 backends are libm-accurate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["log_f32", "exp_f32", "gammaln_f32", "pow_smallint",
           "stirling_tail"]


def _log_f32_impl(x):
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & jnp.int32(0x007FFFFF)) | jnp.int32(0x3F800000),
        jnp.float32)                               # mantissa in [1, 2)
    big = m > 1.4142135
    m = jnp.where(big, m * 0.5, m)                 # -> [sqrt2/2, sqrt2)
    e = e + big.astype(jnp.int32)
    s = (m - 1.0) / (m + 1.0)                      # |s| <= 0.1716
    s2 = s * s
    p = 2.0 * s * (1.0 + s2 * (1.0 / 3.0 + s2 * (
        1.0 / 5.0 + s2 * (1.0 / 7.0 + s2 / 9.0))))
    return p + e.astype(jnp.float32) * 0.6931471805599453


_LN2_HI = 0.693359375          # ln2 split: hi exact in f32, lo the rest
_LN2_LO = -2.12194440e-4


def _exp_f32_impl(x):
    x = jnp.clip(x, -87.0, 88.0)
    kf = jnp.round(x * 1.4426950408889634)
    r = (x - kf * _LN2_HI) - kf * _LN2_LO          # |r| <= ln2/2
    p = 1.0 + r * (1.0 + r * (0.5 + r * (
        1.0 / 6.0 + r * (1.0 / 24.0 + r * (
            1.0 / 120.0 + r * (1.0 / 720.0 + r / 5040.0))))))
    scale = jax.lax.bitcast_convert_type(
        (kf.astype(jnp.int32) + 127) << 23, jnp.float32)
    return p * scale


def log_f32(x):
    """log(x) to ~2 ulp for f32 (exponent extraction + atanh series);
    native log for other dtypes."""
    x = jnp.asarray(x)
    if x.dtype != jnp.float32:
        return jnp.log(x)
    return _log_f32_impl(x)


def exp_f32(x):
    """exp(x) to ~2 ulp for f32 (2^k scaling + degree-7 polynomial);
    native exp for other dtypes. Underflows to 0 below exp(-87)."""
    x = jnp.asarray(x)
    if x.dtype != jnp.float32:
        return jnp.exp(x)
    return _exp_f32_impl(x)


def gammaln_f32(x):
    """log-Gamma via Stirling with a 6-term shift for small arguments:
    lgamma(x) = lgamma(x+6) - log(x (x+1) ... (x+5)) for x < 6.

    Only the (x - 0.5) log x term is precision-AMPLIFIED (its log error is
    scaled by x, which reaches the binomial count n in the BTRS accept
    test — the measured z = +23 bias), so only it pays for the polynomial
    log. The small-argument shift correction log(prod) is bounded
    (prod < 11!/5! so |log| < 12.7): the native op's ~7e-5 relative error
    is < 1e-3 absolute there, far below anything the accept test can
    express statistically, and the native transcendental unit is ~5x
    cheaper than the polynomial — this is the hot per-round path of BTRS
    (2 gammalns x ~6 rounds per head-tier element per component step)."""
    x = jnp.asarray(x)
    if x.dtype != jnp.float32:
        from jax.scipy.special import gammaln
        return gammaln(x)
    small = x < 6.0
    xb = jnp.where(small, x, 1.0)   # benign operand on the large branch
    prod = (xb * (xb + 1.0) * (xb + 2.0) * (xb + 3.0) * (xb + 4.0)
            * (xb + 5.0))
    xs = jnp.where(small, x + 6.0, x)
    inv = 1.0 / xs
    inv2 = inv * inv
    series = inv * (1.0 / 12.0 - inv2 * (1.0 / 360.0 - inv2 / 1260.0))
    lg = ((xs - 0.5) * _log_f32_impl(xs) - xs + 0.9189385332046727
          + series)
    return lg - jnp.where(small, jnp.log(prod), 0.0)


# Stirling-tail exact values for integer x = 0..9; the 3-term asymptotic
# series takes over at x >= 9.5 (error < 5e-11 there, shrinking as x^-7)
_ST_TABLE = (0.08106146679532726, 0.04134069595540929, 0.02767792568499834,
             0.02079067210376509, 0.01664469118982119, 0.01387612882307075,
             0.01189670994589177, 0.01041126526197209, 0.00925546218271273,
             0.00833056343336287)


def stirling_tail(x):
    """t(x) = lgamma(x+1) - [(x+0.5) ln(x+1) - (x+1) + 0.5 ln(2 pi)]:
    the Stirling correction, pure rational arithmetic — no transcendentals
    (Hormann 1993's f_c). Exact table for x < 10, asymptotic series beyond.

    Regrouping a binomial log-PMF ratio around this tail (the BTRD accept
    test) leaves only logs of near-unity ratios, whose n-amplified terms
    carry small ABSOLUTE error — the precision-safe AND cheap form of the
    BTRS acceptance comparison (see sampler/pallas_sweep._binom_btrs)."""
    w = x + 1.0
    inv = 1.0 / w
    inv2 = inv * inv
    s = inv * (1.0 / 12.0 - inv2 * (1.0 / 360.0 - inv2 / 1260.0))
    for i in range(9, -1, -1):
        s = jnp.where(x < i + 0.5, _ST_TABLE[i], s)
    return s


def pow_smallint(q, n, bits: int):
    """q**n for integer-valued n < 2**bits by binary exponentiation —
    exact to ~``bits`` ulp, no transcendentals."""
    result = jnp.ones_like(q)
    base = q
    e = n
    for _ in range(bits):
        half = jnp.floor(e * 0.5)
        odd = e - 2.0 * half
        result = result * jnp.where(odd > 0.5, base, 1.0)
        base = base * base
        e = half
    return result
