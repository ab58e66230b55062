"""ShardedRows lazy view unit tests (hostarray.py)."""

import numpy as np
import pytest

from sqlite_vector_tpu.hostarray import ShardedRows


@pytest.fixture
def parts(rng):
    return [
        rng.standard_normal((n, 6)).astype(np.float32) for n in (5, 1, 8, 3)
    ]


def test_basic_shape_and_slices(parts, rng):
    ref = np.concatenate(parts)
    v = ShardedRows(parts)
    assert v.shape == ref.shape and v.dtype == ref.dtype and len(v) == 17
    # within-shard, shard-crossing, full, empty, clamped, negative int
    for sl in [slice(0, 3), slice(4, 7), slice(0, 17), slice(9, 9),
               slice(12, 99), slice(None)]:
        np.testing.assert_array_equal(v[sl], ref[sl])
    np.testing.assert_array_equal(v[6], ref[6])
    np.testing.assert_array_equal(v[-1], ref[-1])
    with pytest.raises(IndexError):
        v[::2]


def test_fancy_indexing(parts):
    ref = np.concatenate(parts)
    v = ShardedRows(parts)
    idx = np.array([16, 0, 5, 5, 13, 6])
    np.testing.assert_array_equal(v[idx], ref[idx])
    with pytest.raises(IndexError):
        v[np.zeros((2, 2), int)]


def test_view_and_iter_tiles(parts):
    ref = np.concatenate(parts)
    v = ShardedRows(parts)
    u = v.view(np.uint32)
    np.testing.assert_array_equal(u[3:12], ref.view(np.uint32)[3:12])
    got = [t for _, t in v.iter_tiles(4)]
    np.testing.assert_array_equal(np.concatenate(got), ref)
    starts = [s for s, _ in v.iter_tiles(4)]
    assert starts == [0, 4, 8, 12, 16]


def test_mismatched_shards_rejected(parts):
    with pytest.raises(ValueError):
        ShardedRows([])
    with pytest.raises(ValueError):
        ShardedRows([parts[0], parts[1][:, :3]])
    with pytest.raises(ValueError):
        ShardedRows([parts[0], parts[1].astype(np.float64)])


def test_numpy_idioms_rejected(parts):
    """Unsupported numpy idioms must raise, not silently return wrong data:
    bool masks would gather rows 1/0, tuple keys would gather two rows,
    float indices would truncate."""
    v = ShardedRows(parts)
    with pytest.raises(IndexError):
        v[np.zeros(len(v), bool)]
    with pytest.raises(IndexError):
        v[1, 2]
    with pytest.raises(IndexError):
        v[np.array([1.7])]


def test_single_shard_slice_is_copy(parts):
    """The class contract says slices are materialized copies — including
    slices that lie within ONE shard (previously returned an aliasing
    view of the backing array/mmap)."""
    v = ShardedRows(parts)
    got = v[1:3]  # inside shard 0 (5 rows)
    before = got.copy()
    got += 99.0
    np.testing.assert_array_equal(v[1:3], before)
