"""Embedder layer tests (sqlite_vector_tpu.models)."""

import numpy as np

from sqlite_vector_tpu.models import DIM, HashEmbedder, RandomProjectionEmbedder


def test_hash_embedder_deterministic_and_normalized():
    e = HashEmbedder()
    a = e.encode(["the quick brown fox", "espresso machines"])
    b = e.encode(["the quick brown fox", "espresso machines"])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, DIM) and a.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)
    # lexical similarity: shared n-grams score closer than disjoint text
    sim_near = a[0] @ e.encode(["the quick brown foxes"])[0]
    sim_far = a[0] @ a[1]
    assert sim_near > sim_far


def test_bow_embedder():
    e = RandomProjectionEmbedder()
    v = e.encode(["alpha beta", "beta alpha", "gamma delta"])
    np.testing.assert_allclose(v[0], v[1], atol=1e-6)  # order-invariant
    assert abs(float(v[0] @ v[2])) < 0.5
