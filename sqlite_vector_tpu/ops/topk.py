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


# Block width for the hierarchical selection (the VPU lane count).
_HIER_BLOCK = 128
# Below this size a direct lax.top_k is cheaper than the two-level pass.
_HIER_MIN_N = 16384


def _hierarchical_smallest_k(dist: jnp.ndarray, kk: int):
    """Exact two-level top-k for large N.

    `lax.top_k` sorts the full reduction axis — measured at ~2/3 of total
    scan time on TPU for N=1M. This reduces the sort domain 128x:

      1. block minima over [B, G, 128]  (one memory-bound VPU pass)
      2. top-kk GROUPS by minimum       (top_k over G = N/128)
      3. exact top-kk over the kk*128 candidate elements

    Exactness: if element v in group g is among the true kk smallest but g is
    not among the kk smallest-minimum groups, then kk groups each contain an
    element < min(g) <= v — i.e. kk elements smaller than v, contradiction.
    Group indices are re-sorted ascending before the gather so candidates
    stay in global row order and ties keep resolving to the earliest row
    (the reference's strict `<` replacement, src/sqlite-vector.c:2102-2106).
    """
    b, n = dist.shape
    g = -(-n // _HIER_BLOCK)
    npad = g * _HIER_BLOCK
    if npad != n:
        dist = jnp.pad(dist, ((0, 0), (0, npad - n)), constant_values=jnp.inf)
    blocks = dist.reshape(b, g, _HIER_BLOCK)
    mins = jnp.min(blocks, axis=-1)  # [B, G]
    kg = min(kk, g)
    _, gidx = jax.lax.top_k(-mins, kg)  # [B, kg]
    gidx = jnp.sort(gidx, axis=-1)  # ascending row order for tie parity
    cand = jnp.take_along_axis(blocks, gidx[:, :, None], axis=1)  # [B,kg,128]
    cand = cand.reshape(b, kg * _HIER_BLOCK)
    neg_vals, cpos = jax.lax.top_k(-cand, kk)
    pos = (
        jnp.take_along_axis(gidx, cpos // _HIER_BLOCK, axis=-1) * _HIER_BLOCK
        + cpos % _HIER_BLOCK
    )
    return -neg_vals, pos


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
    if (
        distances.ndim == 2
        and n >= _HIER_MIN_N
        and kk * _HIER_BLOCK * 4 <= n
    ):
        vals, idx = _hierarchical_smallest_k(distances, kk)
    else:
        neg_vals, idx = jax.lax.top_k(-distances, kk)
        vals = -neg_vals
    if ids is not None:
        # hierarchical positions can land in the +inf pad region (>= n) when
        # fewer than k rows are selectable; those slots must be -1 per the
        # contract, not a clamp-gathered real id
        out_ids = jnp.where(
            (idx >= 0) & (idx < n), ids[jnp.clip(idx, 0, n - 1)], -1
        )
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
