"""Temporal-semantic k-means op tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogstream_tpu.ops.kmeans import (
    KMeansResult,
    kmeans_with_time,
    select_event_keyframes,
)


def _blobs(rng, centers, per, dim, spread=0.05):
    xs, ts = [], []
    for i, c in enumerate(centers):
        xs.append(c + spread * rng.standard_normal((per, dim)))
        ts.append(np.full(per, float(i * 10)) + rng.uniform(0, 1, per))
    return np.concatenate(xs).astype(np.float32), np.concatenate(ts).astype(np.float32)


def test_shapes_and_determinism():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((40, 8)).astype(np.float32)
    t = np.arange(40, dtype=np.float32)
    key = jax.random.PRNGKey(0)
    r1 = kmeans_with_time(jnp.asarray(x), jnp.asarray(t), 4, key)
    r2 = kmeans_with_time(jnp.asarray(x), jnp.asarray(t), 4, key)
    assert r1.centers.shape == (4, 8)
    assert r1.center_times.shape == (4,)
    assert r1.assignments.shape == (40,)
    np.testing.assert_array_equal(np.asarray(r1.assignments),
                                  np.asarray(r2.assignments))
    assert set(np.asarray(r1.assignments)) <= set(range(4))


def test_separated_blobs_recovered():
    rng = np.random.default_rng(1)
    centers = [np.zeros(16), 10 * np.ones(16), -10 * np.ones(16)]
    x, t = _blobs(rng, centers, per=10, dim=16)
    res = kmeans_with_time(jnp.asarray(x), jnp.asarray(t), 3,
                           jax.random.PRNGKey(3))
    a = np.asarray(res.assignments)
    # each blob must map to exactly one cluster
    for i in range(3):
        assert len(set(a[i * 10:(i + 1) * 10])) == 1
    assert len({a[0], a[10], a[20]}) == 3


def test_time_weight_splits_identical_features():
    # identical features, two well-separated time groups: with alpha>0
    # the time term must drive the split
    x = np.ones((20, 4), np.float32)
    t = np.concatenate([np.zeros(10), np.full(10, 100.0)]).astype(np.float32)
    res = kmeans_with_time(jnp.asarray(x), jnp.asarray(t), 2,
                           jax.random.PRNGKey(0), alpha=2.0)
    a = np.asarray(res.assignments)
    assert len(set(a[:10])) == 1 and len(set(a[10:])) == 1
    assert a[0] != a[10]


def test_accepts_3d_features():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((30, 5, 4)).astype(np.float32)
    t = np.arange(30, dtype=np.float32)
    res = kmeans_with_time(jnp.asarray(x), jnp.asarray(t), 3,
                           jax.random.PRNGKey(1))
    assert res.centers.shape == (3, 20)


def test_requires_more_frames_than_clusters():
    with pytest.raises(ValueError):
        kmeans_with_time(jnp.ones((3, 4)), jnp.arange(3.0), 5,
                         jax.random.PRNGKey(0))


def test_select_event_keyframes_matches_bruteforce():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((25, 6)).astype(np.float32)
    t = np.arange(25, dtype=np.float32)
    res = kmeans_with_time(jnp.asarray(x), jnp.asarray(t), 4,
                           jax.random.PRNGKey(7))
    idx, valid = select_event_keyframes(jnp.asarray(x), res.centers,
                                        res.assignments, k=2)
    idx, valid = np.asarray(idx), np.asarray(valid)
    a = np.asarray(res.assignments)
    c = np.asarray(res.centers)
    for ki in range(4):
        members = np.nonzero(a == ki)[0]
        got = sorted(idx[ki][valid[ki]].tolist())
        if len(members) <= 2:
            assert got == sorted(members.tolist())
        else:
            d = np.linalg.norm(x[members] - c[ki], axis=1)
            expect = sorted(members[np.argsort(d)[:2]].tolist())
            assert got == expect


def test_jit_compatible():
    x = jnp.asarray(np.random.default_rng(4).standard_normal((32, 8)),
                    dtype=jnp.float32)
    t = jnp.arange(32, dtype=jnp.float32)

    @jax.jit
    def run(x, t, key):
        return kmeans_with_time(x, t, 4, key)

    res = run(x, t, jax.random.PRNGKey(0))
    assert isinstance(res, KMeansResult)
    assert res.assignments.shape == (32,)
