"""RNG determinism + uniformity (reference test strategy: SURVEY.md §4 —
determinism hooks; chi-square tests the reference lacks but are cheap here)."""

import numpy as np
import jax.numpy as jnp
from scipy import stats

from hiprt_pt_tpu.core import rng


def test_determinism():
    s1 = rng.seed(jnp.arange(100), 3, 42)
    s2 = rng.seed(jnp.arange(100), 3, 42)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    _, f1 = rng.next_float(s1)
    _, f2 = rng.next_float(s2)
    assert np.array_equal(np.asarray(f1), np.asarray(f2))


def test_seed_decorrelation():
    s1 = rng.seed(jnp.arange(1000), 0, 42)
    s2 = rng.seed(jnp.arange(1000), 1, 42)
    _, f1 = rng.next_float(s1)
    _, f2 = rng.next_float(s2)
    corr = np.corrcoef(np.asarray(f1), np.asarray(f2))[0, 1]
    assert abs(corr) < 0.1


def test_uniformity_chi_square():
    s = rng.seed(jnp.arange(50000), 0, 7)
    _, f = rng.next_float(s)
    f = np.asarray(f)
    assert f.min() >= 0.0 and f.max() < 1.0
    hist, _ = np.histogram(f, bins=50, range=(0, 1))
    chi2 = ((hist - 1000.0) ** 2 / 1000.0).sum()
    # dof=49; p>0.001 bound
    assert chi2 < stats.chi2.ppf(0.999, 49)


def test_stream_uniformity():
    """Sequential draws from one state are uniform too."""
    s = rng.seed(jnp.arange(1000), 0, 13)
    draws = []
    for _ in range(50):
        s, f = rng.next_float(s)
        draws.append(np.asarray(f))
    f = np.concatenate(draws)
    hist, _ = np.histogram(f, bins=20, range=(0, 1))
    expected = f.size / 20
    chi2 = ((hist - expected) ** 2 / expected).sum()
    assert chi2 < stats.chi2.ppf(0.999, 19)
