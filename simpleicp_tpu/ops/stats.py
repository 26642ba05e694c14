"""Masked robust statistics.

The reference compacts arrays after outlier rejection (dynamic shapes); the
TPU build instead keeps fixed-size arrays with boolean validity masks so that
the whole ICP loop stays statically shaped inside one `lax.while_loop`
(SURVEY.md §7). These helpers therefore reproduce numpy's semantics *under a
mask*: invalid lanes are ignored exactly, including numpy's
average-of-two-middles median for even counts
(np.median in /root/reference/python/simpleicp/corrpts.py:185).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sum(mask)
    s = jnp.sum(jnp.where(mask, x, 0.0))
    return s / jnp.maximum(n, 1)


def masked_std(x: jnp.ndarray, mask: jnp.ndarray, ddof: int = 0) -> jnp.ndarray:
    """Masked standard deviation.

    ddof=0 (population) matches numpy's default used by the reference Python
    for convergence checks and logging
    (/root/reference/python/simpleicp/simpleicp.py:369-373); the native
    reference implementations use ddof=1 (SURVEY.md Q8).
    """
    n = jnp.sum(mask)
    mu = masked_mean(x, mask)
    var = jnp.sum(jnp.where(mask, (x - mu) ** 2, 0.0)) / jnp.maximum(n - ddof, 1)
    return jnp.sqrt(var)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Exact masked median with numpy semantics (mean of the two middle
    elements for even counts). Implemented as sort-with-+inf-padding plus a
    dynamic gather — O(n log n) on-device, no host trip."""
    n = jnp.sum(mask)
    sorted_x = jnp.sort(jnp.where(mask, x, jnp.inf))
    n_safe = jnp.maximum(n, 1)
    lo = sorted_x[jnp.maximum((n_safe - 1) // 2, 0)]
    hi = sorted_x[n_safe // 2]
    return 0.5 * (lo + hi)


def masked_mad(x: jnp.ndarray, mask: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Median absolute deviation about the masked median, times `scale`.

    scale=1.4826 gives the Gaussian-consistent robust sigma used by the
    C++/Rust/Julia/MATLAB reference family; scale=1.0 reproduces the
    reference Python's raw MAD (SURVEY.md Q1).
    """
    med = masked_median(x, mask)
    return scale * masked_median(jnp.abs(x - med), mask)


def pct_change(new: jnp.ndarray, old: jnp.ndarray) -> jnp.ndarray:
    """|new - old| / |old| in percent, with the reference's old==0 guard
    (/root/reference/python/simpleicp/simpleicp.py:363-366): 0 if both zero,
    +inf if only old is zero."""
    both_zero = (old == 0) & (new == 0)
    old_zero = (old == 0) & (new != 0)
    safe_old = jnp.where(old == 0, 1.0, old)
    change = jnp.abs((new - old) / safe_old * 100.0)
    return jnp.where(both_zero, 0.0, jnp.where(old_zero, jnp.inf, change))
