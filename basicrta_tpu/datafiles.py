"""Example datasets for documentation and quick starts.

The reference ships a real 446,605-event residence-time dataset as
``basicrta.tests.datafiles.times`` (reference tests/datafiles.py:20-29) and
uses it in the Gibbs docstring example. This framework generates an
equivalent synthetic dataset on demand (same scale, W313-posterior-like
mixture, same timestep discretization) so examples run without shipping
binary fixtures.
"""

from __future__ import annotations

import numpy as np

from basicrta_tpu.ops.surv import discretize_times, simulate_hyperexp

# W313-posterior-like mixture (fit to the bundled reference dataset)
_WEIGHTS = np.array([0.87, 0.09, 0.03, 0.009, 0.001])
_RATES = np.array([4.7, 1.3, 0.33, 0.06, 0.009])


def synthetic_times(n: int = 446_605, ts: float = 0.1,
                    seed: int = 0) -> np.ndarray:
    """Synthetic residence times matching the bundled W313 dataset's scale
    and computational shape (n events, timestep grid, multiplicity skew)."""
    rng = np.random.default_rng(seed)
    return discretize_times(simulate_hyperexp(n, _WEIGHTS, _RATES, rng), ts)


def real_times_path():
    """Path to the reference's bundled 446,605-event W313 dataset when one
    is available on this machine, else None.

    Checked in order: the BASICRTA_TIMES_NPY environment variable, an
    installed ``basicrta`` package's test data, and a reference checkout
    mounted at /root/reference. Validation against the real dataset runs
    automatically when any of these resolves (tests/test_equivalence.py).
    """
    import os
    cands = [os.environ.get("BASICRTA_TIMES_NPY")]
    try:
        import basicrta.tests.datafiles as _rd
        cands.append(getattr(_rd, "times", None))
    except ImportError:
        pass
    cands.append("/root/reference/basicrta/tests/data/times.npy")
    for c in cands:
        if c and isinstance(c, str) and os.path.exists(c):
            return c
    return None


def load_times(prefer_real: bool = True, n: int = 446_605,
               seed: int = 0) -> np.ndarray:
    """The W313-scale example dataset: the real bundled file when present
    (and ``prefer_real``), else the synthetic equivalent."""
    if prefer_real:
        path = real_times_path()
        if path is not None:
            return np.load(path)
    return synthetic_times(n, seed=seed)


#: module-level example dataset, analogous to
#: ``basicrta.tests.datafiles.times`` (computed lazily on first attribute
#: access to keep import cheap)
def __getattr__(name):
    if name == "times":
        return synthetic_times(50_000)
    raise AttributeError(name)
