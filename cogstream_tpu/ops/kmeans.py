"""On-device temporal-semantic k-means.

TPU-native rebuild of ``kmeans_with_time_min_max``
(`/root/reference/model/kmeans_with_time.py:4-137`). Semantics kept:

* kmeans++ initialization on *feature* distance only;
* per-frame min-max normalization of the feature-distance and
  time-distance rows, combined as ``sqrt(nf^2 + alpha * nt^2)``;
* empty clusters reseeded from a random frame;
* fixed iteration cap.

Design deltas (SURVEY.md §7 delta 4): the reference normalizes row by
row in a Python loop on CPU — here the whole [T, K] distance matrix is
normalized in one vectorized pass inside a ``lax.fori_loop``, so the op
jits and fuses into the surrounding compression graph. The iteration
count is static (always ``max_iters``): on TPU, 30 tiny matmuls cost
microseconds, and a data-dependent early exit would force a
``while_loop`` that blocks fusion.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    centers: jax.Array        # [K, F] float32 cluster centroids (features)
    center_times: jax.Array   # [K] float32 centroid timestamps
    assignments: jax.Array    # [T] int32 cluster id per frame


def _pairwise_l2(x: jax.Array, c: jax.Array) -> jax.Array:
    """Euclidean distance matrix [T, K] via the expanded-square identity
    (one MXU matmul instead of a [T, K, F] broadcast)."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)          # [T, 1]
    c2 = jnp.sum(c * c, axis=1, keepdims=True).T        # [1, K]
    xc = x @ c.T                                        # [T, K] — MXU
    return jnp.sqrt(jnp.maximum(x2 + c2 - 2.0 * xc, 0.0))


def _row_minmax(d: jax.Array) -> jax.Array:
    """Per-row min-max normalization; all-equal rows normalize to 0."""
    lo = jnp.min(d, axis=1, keepdims=True)
    hi = jnp.max(d, axis=1, keepdims=True)
    rng = hi - lo
    return jnp.where(rng > 0, (d - lo) / jnp.where(rng > 0, rng, 1.0), 0.0)


def _combined_distance(x, t, centers, center_times, alpha):
    df = _row_minmax(_pairwise_l2(x, centers))
    dt = _row_minmax(jnp.abs(t[:, None] - center_times[None, :]))
    return jnp.sqrt(df * df + alpha * (dt * dt))


def _kmeanspp_init(key, x, num_clusters):
    """kmeans++ seeding on feature distance (ref :44-62)."""
    T = x.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, T)
    centers0 = jnp.zeros((num_clusters, x.shape[1]), x.dtype).at[0].set(x[first])
    idx0 = jnp.zeros((num_clusters,), jnp.int32).at[0].set(first.astype(jnp.int32))

    def body(i, carry):
        centers, idxs, key = carry
        d = _pairwise_l2(x, centers)                       # [T, K]
        # distances to not-yet-chosen slots must not count
        col_valid = (jnp.arange(num_clusters) < i)[None, :]
        d = jnp.where(col_valid, d, jnp.inf)
        nearest = jnp.min(d, axis=1)                       # [T]
        probs = nearest * nearest
        total = jnp.sum(probs)
        kc, ku, key = jax.random.split(key, 3)
        sampled = jax.random.categorical(kc, jnp.log(probs + 1e-30))
        uniform = jax.random.randint(ku, (), 0, T)
        nxt = jnp.where(total > 0, sampled, uniform).astype(jnp.int32)
        return centers.at[i].set(x[nxt]), idxs.at[i].set(nxt), key

    centers, idxs, _ = jax.lax.fori_loop(
        1, num_clusters, body, (centers0, idx0, key))
    return centers, idxs


@functools.partial(jax.jit,
                   static_argnames=("num_clusters", "alpha", "max_iters"))
def kmeans_with_time(
    features: jax.Array,     # [T, F] (or [T, P, D], flattened internally)
    timestamps: jax.Array,   # [T]
    num_clusters: int,       # static
    key: jax.Array,
    alpha: float = 2.0,
    max_iters: int = 30,
) -> KMeansResult:
    if features.ndim == 3:
        features = features.reshape(features.shape[0], -1)
    x = features.astype(jnp.float32)
    t = timestamps.astype(jnp.float32)
    T = x.shape[0]
    if T <= num_clusters:
        raise ValueError(
            f"kmeans needs T > num_clusters (got T={T}, K={num_clusters}); "
            "callers skip clustering in that regime (ref :30-32)")

    init_key, loop_key = jax.random.split(key)
    centers, idxs = _kmeanspp_init(init_key, x, num_clusters)
    center_times = t[idxs]

    def body(i, carry):
        centers, center_times, key = carry
        d = _combined_distance(x, t, centers, center_times, alpha)
        assign = jnp.argmin(d, axis=1)                     # [T]
        onehot = jax.nn.one_hot(assign, num_clusters, dtype=jnp.float32)
        counts = jnp.sum(onehot, axis=0)                   # [K]
        sums = onehot.T @ x                                # [K, F] — MXU
        tsums = onehot.T @ t[:, None]                      # [K, 1]
        kr, key = jax.random.split(key)
        rand_rows = jax.random.randint(kr, (num_clusters,), 0, T)
        nonempty = counts > 0
        safe = jnp.maximum(counts, 1.0)
        new_centers = jnp.where(nonempty[:, None], sums / safe[:, None],
                                x[rand_rows])
        new_times = jnp.where(nonempty, tsums[:, 0] / safe, t[rand_rows])
        return new_centers, new_times, key

    centers, center_times, _ = jax.lax.fori_loop(
        0, max_iters, body, (centers, center_times, loop_key))
    assignments = jnp.argmin(
        _combined_distance(x, t, centers, center_times, alpha), axis=1
    ).astype(jnp.int32)
    return KMeansResult(centers, center_times, assignments)


@functools.partial(jax.jit, static_argnames=("k",))
def select_event_keyframes(
    features: jax.Array,      # [T, F] (or [T, P, D])
    centers: jax.Array,       # [K, F]
    assignments: jax.Array,   # [T]
    k: int = 2,
):
    """Per cluster, the k member frames nearest the centroid.

    Rebuild of ``select_additional_frames``
    (cogreasoner_chat.py:50-64) as one vectorized top-k: non-members get
    +inf distance, clusters with fewer than k members yield invalid
    slots (mask False) instead of variable-length lists.

    Returns (indices [K, k] int32, valid [K, k] bool).
    """
    if features.ndim == 3:
        features = features.reshape(features.shape[0], -1)
    x = features.astype(jnp.float32)
    d = _pairwise_l2(x, centers)                           # [T, K]
    K = centers.shape[0]
    member = jax.nn.one_hot(assignments, K, dtype=jnp.bool_)  # [T, K]
    d = jnp.where(member, d, jnp.inf).T                    # [K, T]
    neg_top, idx = jax.lax.top_k(-d, k)                    # [K, k]
    valid = jnp.isfinite(-neg_top)
    return idx.astype(jnp.int32), valid
