"""Masked statistics vs numpy/scipy on compacted arrays."""

import jax.numpy as jnp
import numpy as np
from scipy import stats as sstats

from simpleicp_tpu.ops.stats import (
    masked_mad,
    masked_mean,
    masked_median,
    masked_std,
    pct_change,
)


def _case(rng, n=257):
    x = rng.normal(size=n) * 3 + 1
    mask = rng.random(n) < 0.7
    if not mask.any():
        mask[0] = True
    return jnp.asarray(x), jnp.asarray(mask), x[mask]


def test_masked_mean_std_median(rng):
    for _ in range(10):
        x, m, dense = _case(rng)
        np.testing.assert_allclose(masked_mean(x, m), dense.mean(), rtol=1e-12)
        np.testing.assert_allclose(masked_std(x, m), dense.std(), rtol=1e-12)
        np.testing.assert_allclose(
            masked_std(x, m, ddof=1), dense.std(ddof=1), rtol=1e-12
        )
        np.testing.assert_allclose(masked_median(x, m), np.median(dense), rtol=1e-12)


def test_masked_median_even_and_odd_counts():
    x = jnp.asarray([5.0, 1.0, 9.0, 3.0])
    m = jnp.asarray([True, True, True, True])
    assert float(masked_median(x, m)) == 4.0  # numpy: mean of two middles
    m = jnp.asarray([True, True, True, False])
    assert float(masked_median(x, m)) == 5.0


def test_masked_mad_matches_scipy(rng):
    for scale in (1.0, 1.4826):
        x, m, dense = _case(rng)
        expected = sstats.median_abs_deviation(dense, scale=1.0) * scale
        np.testing.assert_allclose(masked_mad(x, m, scale=scale), expected, rtol=1e-12)


def test_pct_change_guards():
    assert float(pct_change(jnp.float64(0.0), jnp.float64(0.0))) == 0.0
    assert np.isinf(float(pct_change(jnp.float64(1.0), jnp.float64(0.0))))
    np.testing.assert_allclose(
        float(pct_change(jnp.float64(1.02), jnp.float64(1.0))), 2.0, rtol=1e-9
    )
