"""Top-k selection and merge.

Replaces the reference's k-slot max-replace loop + selection sort
(src/sqlite-vector.c:2022-2069) with `lax.top_k` on negated distances.

Tie behavior: the reference keeps the *first-scanned* row among equal
distances (strict `<` replacement). `lax.top_k` prefers lower indices on
equal values, so as long as candidates are ordered by original row index the
behavior matches. Across chunk merges the running candidates are kept ahead
of newer chunks, preserving the scan-order preference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_ascending(
    distances: jnp.ndarray, k: int, ids: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (values, indices) of the k smallest distances, ascending.

    distances: [..., N]; ids (optional): [N] row ids to gather instead of
    positional indices. k must be static. If k > N the result is padded with
    +inf / id -1 (callers trim, mirroring src/sqlite-vector.c:1816-1817).
    """
    n = distances.shape[-1]
    kk = min(k, n)
    neg_vals, idx = jax.lax.top_k(-distances, kk)
    vals = -neg_vals
    if ids is not None:
        out_ids = ids[idx]
    else:
        out_ids = idx
    if kk < k:
        pad = [(0, 0)] * (vals.ndim - 1) + [(0, k - kk)]
        vals = jnp.pad(vals, pad, constant_values=jnp.inf)
        out_ids = jnp.pad(out_ids, pad, constant_values=-1)
    return vals, out_ids


def merge_topk(
    vals_a: jnp.ndarray,
    ids_a: jnp.ndarray,
    vals_b: jnp.ndarray,
    ids_b: jnp.ndarray,
    k: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two candidate sets [..., ka] and [..., kb] into the k best.

    `a` is the running (earlier-scanned) set and wins ties.
    """
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    neg_vals, idx = jax.lax.top_k(-vals, min(k, vals.shape[-1]))
    return -neg_vals, jnp.take_along_axis(ids, idx, axis=-1)
