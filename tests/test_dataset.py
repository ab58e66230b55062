"""Dataset / VectorStore end-to-end behavior."""

import os

import numpy as np
import pytest

from sqlite_vector_tpu import Dataset, VectorStore
from sqlite_vector_tpu.errors import VectorCodecError, VectorConfigError, VectorStateError
from sqlite_vector_tpu.types import DistanceMetric, VectorOptions, VectorType


def _mk(rng, n=100, d=16, metric=DistanceMetric.L2, vtype=VectorType.F32):
    ds = Dataset("docs", VectorOptions(dimension=d, distance=metric, type=vtype))
    data = rng.standard_normal((n, d)).astype(np.float32)
    ids = ds.add(data)
    return ds, data, ids


def test_add_assigns_sequential_ids(rng):
    ds, _, ids = _mk(rng, n=10)
    np.testing.assert_array_equal(ids, np.arange(1, 11))
    assert len(ds) == 10


def test_add_custom_ids(rng):
    ds = Dataset("t", VectorOptions(dimension=4))
    ids = ds.add(rng.standard_normal((3, 4)).astype(np.float32), ids=[100, 200, 42])
    np.testing.assert_array_equal(ids, [100, 200, 42])
    # next auto id continues after the max
    nxt = ds.add(rng.standard_normal((1, 4)).astype(np.float32))
    assert nxt[0] == 201


def test_search_returns_true_ids(rng):
    ds, data, ids = _mk(rng, n=50)
    q = data[7]
    got_ids, dists = ds.search(q, 1)
    assert got_ids[0] == ids[7]
    assert dists[0] == 0.0  # nearly-zero snap


def test_search_single_query_trims(rng):
    ds, data, _ = _mk(rng, n=5)
    ids, dists = ds.search(data[0], 10)
    assert ids.shape == (5,)
    assert np.all(np.isfinite(dists))


def test_search_batched(rng):
    ds, data, _ = _mk(rng, n=200)
    ids, dists = ds.search(data[:8], 5)
    assert ids.shape == (8, 5) and dists.shape == (8, 5)
    assert np.all(ids[np.arange(8), 0] == ds.ids[:8])


def test_search_k_zero(rng):
    ds, data, _ = _mk(rng)
    ids, dists = ds.search(data[0], 0)
    assert ids.shape == (0,)


def test_search_json_query(rng):
    ds = Dataset("t", VectorOptions(dimension=3))
    ds.add(np.float32([[1, 2, 3], [4, 5, 6]]))
    ids, dists = ds.search("[1, 2, 3]", 1)
    assert ids[0] == 1 and dists[0] == 0.0


def test_search_blob_query(rng):
    ds = Dataset("t", VectorOptions(dimension=3))
    ds.add(np.float32([[1, 2, 3], [4, 5, 6]]))
    ids, _ = ds.search(np.float32([4, 5, 6]).tobytes(), 1)
    assert ids[0] == 2


def test_search_wrong_dimension(rng):
    ds, _, _ = _mk(rng, d=16)
    with pytest.raises(VectorCodecError, match="expected 16"):
        ds.search(np.zeros(8, np.float32), 3)


def test_add_json_and_blob_rows():
    ds = Dataset("t", VectorOptions(dimension=2))
    ds.add(["[1, 2]", np.float32([3, 4]).tobytes()])
    assert len(ds) == 2
    ids, d = ds.search("[3,4]", 1)
    assert ids[0] == 2


def test_distances_stream(rng):
    ds, data, _ = _mk(rng, n=30)
    d = ds.distances(data[0])
    assert d.shape == (30,)
    assert d[0] == 0.0


def test_empty_dataset_search():
    ds = Dataset("t", VectorOptions(dimension=4))
    ids, dists = ds.search(np.zeros(4, np.float32), 5)
    assert ids.shape == (0,)


def test_dimension_required():
    with pytest.raises(VectorConfigError, match="dimension"):
        Dataset("t", VectorOptions())


def test_save_load_roundtrip(rng, tmp_path):
    ds, data, ids = _mk(rng, n=37, metric=DistanceMetric.COSINE)
    ds.quantize()
    ds.save(str(tmp_path / "ds"))
    back = Dataset.load(str(tmp_path / "ds"))
    assert len(back) == 37
    assert back.metric is DistanceMetric.COSINE
    assert back.quant_params == ds.quant_params
    q = data[5]
    np.testing.assert_array_equal(
        back.search(q, 5)[0], ds.search(q, 5)[0]
    )
    np.testing.assert_array_equal(
        back.search(q, 5, exact=False)[0], ds.search(q, 5, exact=False)[0]
    )


def test_resave_onto_own_directory_mmap_sources(rng, tmp_path):
    """save() onto the directory a dataset was loaded FROM must not corrupt
    files it is still reading through a memmap. load(storage='host') keeps
    qcodes.npy mmap'd (and mmap=True keeps the vector shards mmap'd); a
    plain np.save truncates the destination before reading the source —
    the second save/load cycle served garbage codes where every row tied
    at one distance (fuzz seed 642). The atomic temp+replace save keeps
    the old inode alive for the mapping."""
    import sqlite_vector_tpu as svt

    d = str(tmp_path / "self")
    data = (rng.standard_normal((40, 12)) * 2).astype(np.float32)
    ds = Dataset(
        "s", VectorOptions(dimension=12, type=VectorType.BF16),
        storage="host",
    )
    ids = ds.add(data)
    ds.quantize()
    ds.remove([int(ids[3])])
    ds.quantize()
    want_exact = ds.search(data[5], 4)[0].tolist()
    want_quant = ds.search(data[5], 4, exact=False)[0].tolist()
    for _ in range(3):  # cycle 2 is the one that read its own dying mmap
        ds.save(d)
        ds = Dataset.load(d, storage="host")
        assert ds.search(data[5], 4)[0].tolist() == want_exact
        assert ds.search(data[5], 4, exact=False)[0].tolist() == want_quant

    # mmap=True variant: the vector shards themselves are the mmap source
    d2 = str(tmp_path / "self2")
    ds2 = svt.Dataset.from_arrays(
        "s2", data, options="dimension=12,type=FLOAT32,distance=L2"
    )
    ds2.save(d2, shard_rows=16)
    for _ in range(3):
        ds2 = Dataset.load(d2, storage="host", mmap=True)
        np.testing.assert_array_equal(np.asarray(ds2._host_vectors), data)
        assert int(ds2.search(data[5], 1)[0][0]) == 6
        ds2.save(d2, shard_rows=16)  # writes FROM the mmap of these shards


def test_save_resume_provenance(rng, tmp_path):
    """save(resume=True) skips shards only with PROVEN provenance: the
    directory's interrupted-save marker or completed manifest must carry
    this dataset's current data token. A same-count update() between saves
    regenerates the token, so resume falls back to a full rewrite instead
    of keeping stale shard bytes (the counts-only heuristic it replaces
    shared the checkpointed-quantize failure shape of fuzz seed 2202)."""
    import os

    import sqlite_vector_tpu.dataset as dsmod

    data = rng.standard_normal((64, 8)).astype(np.float32)
    ds = Dataset("r", VectorOptions(dimension=8, type=VectorType.F32))
    ds.add(data)
    d = str(tmp_path / "r")
    real = dsmod._atomic_npy_save

    # (a) crash mid-save, retry with resume=True: completed shards skip.
    # Write order: ids.npy first, then 4 shards of 16 rows — die on shard 3
    calls = {"n": 0}

    def dying(path, arr):
        calls["n"] += 1
        if calls["n"] >= 4:  # ids + 2 shards land, the 3rd dies
            raise OSError("simulated disk failure")
        real(path, arr)

    monkeypatch_ctx = pytest.MonkeyPatch()
    try:
        monkeypatch_ctx.setattr(dsmod, "_atomic_npy_save", dying)
        with pytest.raises(OSError, match="simulated"):
            ds.save(d, shard_rows=16)
        written = {"n": 0}

        def counting(path, arr):
            written["n"] += 1
            real(path, arr)

        monkeypatch_ctx.setattr(dsmod, "_atomic_npy_save", counting)
        ds.save(d, shard_rows=16, resume=True)
        # ids rewritten + only the 2 missing shards (2 skipped with proof)
        assert written["n"] == 3
    finally:
        monkeypatch_ctx.undo()
    back = Dataset.load(d)
    np.testing.assert_array_equal(
        np.asarray(back._host_vectors)[: len(data)], data
    )
    assert not os.path.exists(os.path.join(d, "save_in_progress.json"))

    # (b) a same-count update between saves MUST rewrite its shard even
    # under resume=True (every shard still holds its old row count)
    new_row = (data[0] * 7 + 1).astype(np.float32)
    ds.update(ds.ids[0], new_row)
    ds.save(d, shard_rows=16, resume=True)
    back = Dataset.load(d)
    np.testing.assert_array_equal(
        np.asarray(back._host_vectors)[0], new_row
    )

    # (c) an idempotent re-save of UNCHANGED rows skips every shard (the
    # completed manifest proves the content)
    skipped = {"n": 0}

    def counting2(path, arr):
        skipped["n"] += 1
        real(path, arr)

    monkeypatch_ctx2 = pytest.MonkeyPatch()
    try:
        monkeypatch_ctx2.setattr(dsmod, "_atomic_npy_save", counting2)
        ds.save(d, shard_rows=16, resume=True)
        assert skipped["n"] == 1  # only ids.npy rewrites
    finally:
        monkeypatch_ctx2.undo()

    # (d) crash during a REWRITE over a prior completed save of same-count
    # different content: the retry's marker proves only the shards the
    # crashed attempt actually completed — pre-existing same-count files
    # from the old generation MUST rewrite, not skip (the marker records
    # the attempt's content, never the stale files' provenance)
    data2 = (data * 3 + 2).astype(np.float32)  # same count, new bytes
    for rid, row in zip(list(ds.ids), data2):
        ds.update(rid, row)
    calls2 = {"n": 0}

    def dying2(path, arr):
        calls2["n"] += 1
        if calls2["n"] >= 3:  # ids + shard 0 land, shard 1 dies
            raise OSError("simulated disk failure")
        real(path, arr)

    monkeypatch_ctx3 = pytest.MonkeyPatch()
    try:
        monkeypatch_ctx3.setattr(dsmod, "_atomic_npy_save", dying2)
        with pytest.raises(OSError, match="simulated"):
            ds.save(d, shard_rows=16)
        # (also ADVICE low: a crashed rewrite over a completed save leaves
        # mixed-generation shards — load() must refuse, not stitch them)
        with pytest.raises(ValueError, match="interrupted save"):
            Dataset.load(d)
        monkeypatch_ctx3.setattr(dsmod, "_atomic_npy_save", counting2)
        before = skipped["n"]
        ds.save(d, shard_rows=16, resume=True)
        # ids + shards 1..3 rewrite; only crash-proven shard 0 skips
        assert skipped["n"] - before == 4
    finally:
        monkeypatch_ctx3.undo()
    back = Dataset.load(d)
    np.testing.assert_array_equal(
        np.asarray(back._host_vectors)[: len(data2)], data2
    )

    # (e) a foreign interrupted save (mismatched marker token) is disproof:
    # resume must NOT fall through to the still-matching old manifest
    import json

    with open(os.path.join(d, "save_in_progress.json"), "w") as f:
        json.dump({"data_token": "foreign", "done_shards": {}}, f)
    rewrote = {"n": 0}

    def counting3(path, arr):
        rewrote["n"] += 1
        real(path, arr)

    monkeypatch_ctx4 = pytest.MonkeyPatch()
    try:
        monkeypatch_ctx4.setattr(dsmod, "_atomic_npy_save", counting3)
        ds.save(d, shard_rows=16, resume=True)
        assert rewrote["n"] == 5  # ids + all 4 shards: full rewrite
    finally:
        monkeypatch_ctx4.undo()


def test_save_load_bf16(rng, tmp_path):
    ds = Dataset("t", VectorOptions(dimension=8, type=VectorType.BF16))
    ds.add(rng.standard_normal((10, 8)).astype(np.float32))
    ds.save(str(tmp_path / "b"))
    back = Dataset.load(str(tmp_path / "b"))
    assert back.dtype is VectorType.BF16
    assert len(back) == 10


def test_save_stream_out_of_core(rng, tmp_path):
    # save_stream writes the save() directory layout from a chunk iterator
    # (no full matrix in RAM); load(mmap) + search matches an in-RAM build
    d = str(tmp_path / "oc")
    data = rng.standard_normal((1000, 24)).astype(np.float32)
    n = Dataset.save_stream(
        d,
        (data[s : s + 300] for s in range(0, 1000, 300)),
        options="dimension=24,type=FLOAT32,distance=L2",
    )
    assert n == 1000
    ds = Dataset.load(d, storage="host", mmap=True)
    assert len(ds) == 1000 and ds.ids[0] == 1 and ds.ids[-1] == 1000
    ref = Dataset.from_arrays(
        "ref", data, options="dimension=24,type=FLOAT32,distance=L2"
    )
    q = data[123]
    np.testing.assert_array_equal(ds.search(q, 5)[0], ref.search(q, 5)[0])
    # quantize(checkpoint=) over the mmap view resumes instantly when done
    qdir = str(tmp_path / "q")
    assert ds.quantize(checkpoint=qdir) == 1000
    p1 = ds.quant_params
    ds2 = Dataset.load(d, storage="host", mmap=True)
    assert ds2.quantize(checkpoint=qdir) == 1000  # all chunks done: no work
    assert ds2.quant_params == p1


def test_save_stream_crash_leaves_disproof(rng, tmp_path):
    """A save_stream that dies mid-stream OVER A COMPLETED DIRECTORY must
    not leave a loadable mixed-generation state (old manifest + some new
    shards): the in-progress marker is disproof and load() refuses.
    A successful re-stream clears the marker and loads fine (r4; the
    10M bench regeneration hit exactly this crash shape)."""
    d = str(tmp_path / "cs")
    data = rng.standard_normal((600, 16)).astype(np.float32)
    Dataset.save_stream(
        d,
        (data[s : s + 200] for s in range(0, 600, 200)),
        options="dimension=16,type=FLOAT32",
    )
    assert Dataset.load(d, storage="host").search(data[5], 1)[1][0] == 0.0

    newer = data + 1.0

    def dying_chunks():
        yield newer[:200]  # overwrites shard 0 with generation-2 bytes
        raise RuntimeError("simulated crash mid-stream")

    with pytest.raises(RuntimeError):
        Dataset.save_stream(d, dying_chunks(), options="dimension=16,type=FLOAT32")
    # marker present + token != manifest's -> refuse, never stitch
    with pytest.raises(ValueError, match="interrupted save"):
        Dataset.load(d, storage="host")
    # a completed re-stream recovers the directory
    n = Dataset.save_stream(
        d,
        (newer[s : s + 200] for s in range(0, 600, 200)),
        options="dimension=16,type=FLOAT32",
    )
    assert n == 600
    ds = Dataset.load(d, storage="host")
    assert ds.search(newer[7], 1)[1][0] == 0.0


def test_save_stream_shard_writes_are_atomic(rng, tmp_path, monkeypatch):
    """Shard files never appear truncated under their final name: the
    np.save goes to a temp file first (a crash inside np.save leaves only
    *.npy.tmp* debris, no final-name shard)."""
    import sqlite_vector_tpu.dataset as dsm

    d = str(tmp_path / "at")
    data = rng.standard_normal((100, 8)).astype(np.float32)
    real_replace = os.replace
    calls = []

    def spy_replace(src, dst):
        calls.append((os.path.basename(src), os.path.basename(dst)))
        return real_replace(src, dst)

    monkeypatch.setattr(dsm.os, "replace", spy_replace)
    Dataset.save_stream(d, [data], options="dimension=8,type=FLOAT32")
    renamed_to = {dst for _, dst in calls}
    assert "vectors-00000.npy" in renamed_to
    assert "ids.npy" in renamed_to
    assert "manifest.json" in renamed_to


def test_save_stream_bf16_and_dim_infer(rng, tmp_path):
    d = str(tmp_path / "ocb")
    data = rng.standard_normal((64, 8)).astype(np.float32)
    n = Dataset.save_stream(d, [data], options="type=FLOATB16")
    assert n == 64
    ds = Dataset.load(d)
    assert ds.dtype is VectorType.BF16 and ds.dimension == 8 and len(ds) == 64
    # dimension mismatch across chunks is rejected
    with pytest.raises(VectorConfigError, match="dimension"):
        Dataset.save_stream(
            str(tmp_path / "bad"),
            [data, data[:, :4]],
            options="type=FLOAT32",
        )


def test_store_create_and_reinit(rng):
    store = VectorStore()
    ds = store.create("Docs.Embedding", "dimension=8,type=FLOAT32")
    assert store.get("docs.embedding") is ds  # case-insensitive (:1051)
    again = store.create("DOCS.EMBEDDING", "dimension=8,type=FLOAT32")
    assert again is ds
    with pytest.raises(VectorConfigError, match="dimension mismatch"):
        store.create("docs.embedding", "dimension=16")
    with pytest.raises(VectorConfigError, match="type mismatch"):
        store.create("docs.embedding", "dimension=8,type=INT8")


def test_store_missing_dataset():
    store = VectorStore()
    with pytest.raises(VectorStateError, match="not found"):
        store.get("nope")


def test_store_kwargs_api():
    store = VectorStore()
    ds = store.create("t", dimension=4, type="FLOAT16", distance="cosine")
    assert ds.dtype is VectorType.F16
    assert ds.metric is DistanceMetric.COSINE


def test_memory_bytes(rng):
    ds, _, _ = _mk(rng, n=100, d=16)
    assert ds.memory_bytes() >= 100 * 16 * 4


def test_remove_rows(rng):
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("rm", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((50, 8)).astype("float32")
    ids = ds.add(base)
    assert ds.remove(ids[10:20]) == 10
    assert len(ds) == 40
    got, dist = ds.search(base[15], 1)
    assert dist[0] > 0.0  # row 15's exact vector is gone
    got, dist = ds.search(base[5], 1)
    assert got[0] == ids[5] and dist[0] == 0.0
    assert ds.remove([99999]) == 0


def test_remove_is_lazy_no_device_reupload(rng):
    """remove() below the compaction threshold tombstones in place: the
    device matrix object is UNCHANGED (no O(N) re-upload — the zero-cost
    update contract, reference README.md:117) and scans mask the dead rows."""
    import numpy as np
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.errors import VectorStateError

    ds = svt.Dataset("lazy", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((200, 8)).astype("float32")
    ids = ds.add(base)
    dev_before = ds._vectors
    assert ds.remove(ids[50:60]) == 10
    assert ds._vectors is dev_before  # tombstoned, not re-uploaded
    assert len(ds) == 190
    assert 190 == len(ds.ids) == len(np.unique(ds.ids))
    # removed rows never surface in searches
    got, dist = ds.search(base[55], 1)
    assert got[0] != ids[55]
    # removed rows are gone from streams and get(); live rows unaffected
    d = ds.distances(base[0])
    assert d.shape == (190,)
    import pytest

    with pytest.raises(VectorStateError, match="unknown row id"):
        ds.get([ids[55]])
    np.testing.assert_allclose(ds.get([ids[61]])[0], base[61])
    # filtered search composes with tombstones
    got, _ = ds.search(base[70], 5, ids_filter=ids[50:80])
    assert ids[55] not in got and got[0] == ids[70]
    # k > live rows: trimmed, never returns a tombstoned id
    sub = svt.Dataset("tiny", svt.parse_options("dimension=8,type=FLOAT32"))
    sids = sub.add(base[:5])
    sub.remove(sids[:3])
    got, dist = sub.search(base[0], 5)
    assert len(got) == 2 and set(got) == set(sids[3:])


def test_explicit_compact(rng, tmp_path):
    import pytest
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.errors import VectorStateError

    ds = svt.Dataset("ec", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((50, 8)).astype("float32")
    ids = ds.add(base)
    assert ds.compact() == 0  # no-op
    ds.remove(ids[:10])
    assert ds.tombstones == 10
    dev_before = ds._vectors
    assert ds.compact() == 10
    assert ds.tombstones == 0 and len(ds) == 40
    assert ds._vectors is not dev_before
    got, dist = ds.search(base[20], 1)
    assert got[0] == ids[20] and dist[0] == 0.0
    # read-only mmap view: compact() refuses (save() filters instead)
    ds.save(str(tmp_path / "m"), shard_rows=16)
    mm = svt.Dataset.load(str(tmp_path / "m"), storage="host", mmap=True)
    mm.remove(ids[20:25])
    with pytest.raises(VectorStateError, match="read-only"):
        mm.compact()


def test_remove_compacts_at_threshold(rng):
    """Removing every row (or past the capacity threshold) triggers physical
    compaction: a fresh device matrix and zero tombstones."""
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("cmp", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((40, 8)).astype("float32")
    ids = ds.add(base)
    dev_before = ds._vectors
    ds.remove(ids)  # all dead -> compacts immediately
    assert ds._n_dead == 0 and len(ds) == 0
    assert ds._vectors is not dev_before


def test_quantize_and_save_compact_tombstones(rng, tmp_path):
    """quantize() and save() never cover tombstoned rows."""
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("qc", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((60, 8)).astype("float32")
    ids = ds.add(base)
    ds.remove(ids[:15])
    n = ds.quantize()
    assert n == 45 and ds._n_dead == 0  # compacted before building codes
    got, _ = ds.search(base[20], 3, mode="quantized")
    assert got[0] == ids[20]
    ds.remove(ids[20:25])
    ds.save(str(tmp_path / "d"))
    back = svt.Dataset.load(str(tmp_path / "d"))
    assert len(back) == 40
    assert not np.isin(ids[20:25], back.ids).any()


def test_add_rejects_duplicate_ids(rng):
    import pytest
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.errors import VectorConfigError

    ds = svt.Dataset("dup", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((5, 8)).astype("float32")
    ds.add(base, ids=[10, 11, 12, 13, 14])
    with pytest.raises(VectorConfigError, match="already exist"):
        ds.add(base[:1], ids=[12])
    with pytest.raises(VectorConfigError, match="duplicate ids"):
        ds.add(base[:2], ids=[20, 20])
    # a removed (tombstoned) id is re-usable — the row is gone
    ds.remove([12])
    ds.add(base[:1], ids=[12])
    got, dist = ds.search(base[0], 1)
    assert dist[0] == 0.0


def test_create_does_not_mutate_caller_options_or_reset_metric(rng):
    """Reference parity: re-init keeps the existing context untouched
    (src/sqlite-vector.c:2539-2541); and create() never aliases the
    caller's VectorOptions object."""
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.types import DistanceMetric, VectorOptions

    store = svt.VectorStore()
    opts = VectorOptions(dimension=8, distance=DistanceMetric.COSINE)
    a = store.create("a", opts)
    b = store.create("b", opts, dimension=16)
    assert opts.dimension == 8  # caller's object untouched
    assert a.dimension == 8 and b.dimension == 16
    # idempotent re-open WITHOUT distance: metric must stay cosine
    again = store.create("a", "dimension=8,type=FLOAT32")
    assert again is a and a.metric is DistanceMetric.COSINE


def test_approx_mode_with_mask(rng):
    """approx mode keeps its hardware-selection fast path under tombstones
    and ids_filter (masked rows excluded, never returned)."""
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("ax", svt.parse_options("dimension=16,type=FLOAT32"))
    base = rng.standard_normal((4000, 16)).astype("float32")
    ids = ds.add(base)
    ds.remove(ids[100:200])
    got, dist = ds.search(base[150], 5, mode="approx")
    assert ids[150] not in got
    got, dist = ds.search(base[50], 5, mode="approx", ids_filter=ids[:60])
    assert got[0] == ids[50] and dist[0] == 0.0
    assert np.isin(got, ids[:60]).all()


def test_mmap_host_dataset_remove_quantize_save(tmp_path, rng):
    """>RAM-style datasets (read-only mmap shard views) never compact:
    tombstones are durable, scans mask them, and quantize/save filter
    chunk-/shard-wise without materializing the matrix."""
    import numpy as np
    import sqlite_vector_tpu as svt

    base = rng.standard_normal((300, 16)).astype("float32")
    src = svt.Dataset("src", svt.parse_options("dimension=16,type=FLOAT32"))
    ids = src.add(base)
    src.save(str(tmp_path / "d"), shard_rows=64)  # 5 shards

    ds = svt.Dataset.load(str(tmp_path / "d"), storage="host", mmap=True)
    assert not ds._host_writable()  # the view is read-only
    assert ds.remove(ids[100:200]) == 100
    assert ds._n_dead == 100 and len(ds) == 200  # durable tombstones
    got, dist = ds.search(base[150], 1)
    assert got[0] != ids[150]
    got, dist = ds.search(base[50], 1)
    assert got[0] == ids[50] and dist[0] == 0.0

    # chunked host quantize filters the dead rows; codes cover live only
    n = ds.quantize()
    assert n == 200 and ds._quant.count == 200
    assert not np.isin(ids[100:200], ds._quant.ids).any()
    got, _ = ds.search(base[20], 3, mode="quantized")
    assert got[0] == ids[20]

    # shard-wise filtered save -> clean reload without the dead rows
    ds.save(str(tmp_path / "d2"), shard_rows=64)
    back = svt.Dataset.load(str(tmp_path / "d2"))
    assert len(back) == 200
    assert not np.isin(ids[100:200], back.ids).any()
    g2, d2 = back.search(base[50], 1)
    assert g2[0] == ids[50] and d2[0] == 0.0


def test_rerank_after_remove_drops_dead_candidates(rng):
    """Rerank on a stale snapshot: stage-1 candidates that were removed
    after quantize() are dropped by the live-id remap (never returned)."""
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("rr", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((100, 8)).astype("float32")
    ids = ds.add(base)
    ds.quantize()
    ds.remove([ids[7]])
    got, dist = ds.search(base[7], 3, mode="rerank")
    assert ids[7] not in got and len(got) == 3


def test_remove_on_mesh_dataset(rng):
    """Tombstone masks shard over the mesh rows axis like filter masks."""
    import jax
    import sqlite_vector_tpu as svt

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs multiple devices")
    mesh = svt.make_mesh()
    ds = svt.Dataset(
        "mrm", svt.parse_options("dimension=8,type=FLOAT32"), mesh=mesh
    )
    base = rng.standard_normal((64, 8)).astype("float32")
    ids = ds.add(base)
    dev_before = ds._vectors
    assert ds.remove(ids[:8]) == 8
    assert ds._vectors is dev_before and len(ds) == 56
    got, dist = ds.search(base[3], 1)
    assert got[0] != ids[3] and dist[0] > 0
    got, dist = ds.search(base[9], 1)
    assert got[0] == ids[9] and dist[0] == 0.0


def test_update_rows(rng):
    import numpy as np
    import pytest
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.errors import VectorStateError

    ds = svt.Dataset("up", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((20, 8)).astype("float32")
    ids = ds.add(base)
    new_vec = rng.standard_normal((1, 8)).astype("float32")
    assert ds.update([ids[3]], new_vec) == 1
    got, dist = ds.search(new_vec[0], 1)
    assert got[0] == ids[3] and dist[0] == 0.0
    with pytest.raises(VectorStateError, match="unknown row id"):
        ds.update([123456], new_vec)


def test_update_scatter_batches(rng):
    """update() scatters changed rows on device (pow2-padded batches);
    results stay exact across batch sizes and alongside tombstones."""
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("us", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((50, 8)).astype("float32")
    ids = ds.add(base)
    ds.remove(ids[40:45])  # tombstones present during the scatter
    for nb in (1, 3, 7):  # non-pow2 batches exercise the idempotent padding
        sel = ids[:nb]
        fresh = rng.standard_normal((nb, 8)).astype("float32")
        assert ds.update(sel, fresh) == nb
        for j in range(nb):
            got, dist = ds.search(fresh[j], 1)
            assert got[0] == sel[j] and dist[0] == 0.0
    # untouched rows unchanged; dead rows still dead
    got, dist = ds.search(base[20], 1)
    assert got[0] == ids[20] and dist[0] == 0.0
    got, _ = ds.search(base[42], 1)
    assert got[0] != ids[42]


def test_quant_stale_after_remove(rng):
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("st", svt.parse_options("dimension=8,type=FLOAT32"))
    ids = ds.add(rng.standard_normal((30, 8)).astype("float32"))
    ds.quantize()
    assert not ds.quant_stale
    ds.remove(ids[:5])
    assert ds.quant_stale


def test_sharded_save_and_mmap_load(tmp_path, rng):
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("sh", svt.parse_options("dimension=12,type=FLOAT32"))
    base = rng.standard_normal((2500, 12)).astype("float32")
    ids = ds.add(base)
    ds.quantize()
    d = str(tmp_path / "sharded")
    ds.save(d, shard_rows=1000)
    import os

    assert sorted(f for f in os.listdir(d) if f.startswith("vectors-")) == [
        "vectors-00000.npy",
        "vectors-00001.npy",
        "vectors-00002.npy",
    ]
    # plain load (hbm)
    ds2 = svt.Dataset.load(d)
    got, dist = ds2.search(base[77], 3)
    assert got[0] == ids[77] and dist[0] == 0.0
    # host + mmap load: no RAM copy of the matrix
    ds3 = svt.Dataset.load(d, storage="host", mmap=True)
    got, dist = ds3.search(base[77], 3)
    assert got[0] == ids[77] and dist[0] == 0.0
    # append after mmap load materializes a writable copy
    new_ids = ds3.add(base[:2])
    assert len(ds3) == 2502 and new_ids[0] == ids[-1] + 1


def test_mmap_load_single_file(tmp_path, rng):
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("mm", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((100, 8)).astype("float32")
    ids = ds.add(base)
    d = str(tmp_path / "plain")
    ds.save(d)
    ds2 = svt.Dataset.load(d, storage="host", mmap=True)
    assert not ds2._host_vectors.flags.writeable  #true memory map
    got, dist = ds2.search(base[5], 1)
    assert got[0] == ids[5] and dist[0] == 0.0


def test_ids_filter_search(rng):
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("fil", svt.parse_options("dimension=16,type=FLOAT32"))
    base = rng.standard_normal((200, 16)).astype("float32")
    ids = ds.add(base)
    q = base[10]
    # unfiltered: row 10 wins
    got, dist = ds.search(q, 3)
    assert got[0] == ids[10]
    # filter row 10 out: it must not appear
    allowed = ids[(ids != ids[10])]
    got, dist = ds.search(q, 3, ids_filter=allowed)
    assert ids[10] not in got and dist[0] > 0
    # tiny allowlist: results restricted exactly
    got, dist = ds.search(q, 10, ids_filter=ids[:4])
    assert set(got.tolist()) <= set(ids[:4].tolist())
    # quantized path honors the filter too
    ds.quantize()
    got, _ = ds.search(q, 3, exact=False, ids_filter=allowed)
    assert ids[10] not in got


def test_get_vectors_by_id(rng):
    import numpy as np
    import pytest
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.errors import VectorStateError

    ds = svt.Dataset("g", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((20, 8)).astype("float32")
    ids = ds.add(base)
    np.testing.assert_array_equal(ds.get(ids[5]), base[5:6])
    np.testing.assert_array_equal(ds.get(ids[[3, 7]]), base[[3, 7]])
    with pytest.raises(VectorStateError, match="unknown row id"):
        ds.get([424242])


def test_sqlite_roundtrip_export_import(tmp_path, rng):
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("x", svt.parse_options("dimension=12,type=FLOAT32"))
    base = rng.standard_normal((80, 12)).astype("float32")
    ids = ds.add(base)
    ds.quantize()
    path = str(tmp_path / "export.db")
    ds.to_sqlite(path, "vectors")

    # the exported file is directly scannable through the compat layer
    import sqlite_vector_tpu.sqlite as svs

    conn = svs.connect(path)
    conn.vector_init("vectors", "vector", "type=FLOAT32,dimension=12")
    rows = conn.vector_full_scan("vectors", "vector", base[3].tobytes(), 3)
    assert rows[0][0] == int(ids[3]) and rows[0][1] == 0.0
    # quantization was exported too: scan without re-quantizing
    qrows = conn.vector_quantize_scan("vectors", "vector", base[3].tobytes(), 3)
    assert qrows[0][0] == int(ids[3])
    conn.close()

    # and re-importable as a native Dataset
    ds2 = svt.Dataset.from_sqlite(
        path, "vectors", "vector", "type=FLOAT32,dimension=12"
    )
    assert len(ds2) == 80
    got, dist = ds2.search(base[3], 1)
    assert got[0] == int(ids[3]) and dist[0] == 0.0


def test_rerank_mode_exact_distances(rng):
    import numpy as np
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu import oracle
    from sqlite_vector_tpu.types import DistanceMetric, VectorType

    ds = svt.Dataset("rr", svt.parse_options("dimension=24,type=FLOAT32"))
    base = rng.standard_normal((2000, 24)).astype("float32")
    ids = ds.add(base)
    ds.quantize()
    q = rng.standard_normal((3, 24)).astype("float32")

    got_ids, got_vals = ds.search(q, 10, mode="rerank", expand=4)
    # distances are TRUE float L2 values (not quantized-domain integers)
    ref = oracle.distance(q, base, DistanceMetric.L2, VectorType.F32)
    for bi in range(3):
        oidx = np.argsort(ref[bi], kind="stable")[:10]
        # near-perfect agreement with the exact scan at expand=4
        overlap = len(set(got_ids[bi].tolist()) & set(ids[oidx].tolist()))
        assert overlap >= 9
        np.testing.assert_allclose(
            got_vals[bi],
            np.sort(
                oracle.snap_zero(
                    ref[bi][np.searchsorted(ids, got_ids[bi])]
                )
            ),
            rtol=1e-4, atol=1e-4,
        )
    # rerank respects ids_filter
    got_ids, _ = ds.search(q[0], 5, mode="rerank", ids_filter=ids[:50])
    assert set(got_ids.tolist()) <= set(ids[:50].tolist())
    # requires quantization
    ds.drop_quantization()
    import pytest
    from sqlite_vector_tpu.errors import VectorStateError

    with pytest.raises(VectorStateError):
        ds.search(q[0], 5, mode="rerank")


def test_quantized_search_after_remove(rng):
    """Stale codes keep serving with THEIR OWN ids after rows are removed
    (the reference's shadow table keeps its rowids the same way)."""
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("qr", svt.parse_options("dimension=16,type=FLOAT32"))
    base = rng.standard_normal((50, 16)).astype("float32")
    ids = ds.add(base)
    ds.quantize()
    ds.remove(ids[:20])
    # quantized scan serves the OLD codes and must return the OLD ids
    got, dist = ds.search(base[30], 3, exact=False)
    assert got[0] == ids[30]
    got5, _ = ds.search(base[5], 1, exact=False)  # removed row, old codes
    assert got5[0] == ids[5]  # quantized snapshot still contains it
    # exact scan reflects the live table
    egot, edist = ds.search(base[5], 1)
    assert egot[0] != ids[5] or edist[0] > 0
    # rerank maps candidates to live rows (removed rows drop out)
    rgot, rdist = ds.search(base[30], 3, mode="rerank")
    assert rgot[0] == ids[30] and rdist[0] == 0.0
    assert ids[5] not in rgot
    # quantized filter applies in snapshot space
    fgot, _ = ds.search(base[30], 3, exact=False, ids_filter=ids[25:])
    assert set(fgot.tolist()) <= set(ids[25:].tolist())


def test_resave_after_update_not_stale(tmp_path, rng):
    """save() must rewrite shards by default after rows change."""
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("rs", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((10, 8)).astype("float32")
    ids = ds.add(base)
    d = str(tmp_path / "ck")
    ds.save(d, shard_rows=4)
    new_vec = rng.standard_normal((1, 8)).astype("float32")
    ds.update([ids[0]], new_vec)
    ds.save(d, shard_rows=4)
    ds2 = svt.Dataset.load(d)
    np.testing.assert_array_equal(ds2.get(ids[0]), new_vec)


def test_bf16_sharded_mmap_load(tmp_path, rng):
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("bfm", svt.parse_options("dimension=8,type=FLOATB16"))
    base = rng.standard_normal((9, 8)).astype(svt.VectorType.BF16.np_dtype)
    ids = ds.add(base)
    d = str(tmp_path / "bf")
    ds.save(d, shard_rows=4)
    ds2 = svt.Dataset.load(d, storage="host", mmap=True)
    assert ds2._host_vectors.dtype == svt.VectorType.BF16.np_dtype
    got, dist = ds2.search(base[2], 1)
    assert got[0] == ids[2] and dist[0] == 0.0


def test_update_after_mmap_load(tmp_path, rng):
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("um", svt.parse_options("dimension=8,type=FLOAT32"))
    base = rng.standard_normal((20, 8)).astype("float32")
    ids = ds.add(base)
    d = str(tmp_path / "um")
    ds.save(d)
    ds2 = svt.Dataset.load(d, storage="host", mmap=True)
    new_vec = rng.standard_normal((1, 8)).astype("float32")
    assert ds2.update([ids[4]], new_vec) == 1  # must materialize, not crash
    got, dist = ds2.search(new_vec[0], 1)
    assert got[0] == ids[4] and dist[0] == 0.0


def test_approx_mode(rng):
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("ax", svt.parse_options("dimension=32,type=FLOAT32"))
    base = rng.standard_normal((5000, 32)).astype("float32")
    ids = ds.add(base)
    q = base[123]
    got, dist = ds.search(q, 10, mode="approx", recall_target=0.95)
    assert got[0] == ids[123] and dist[0] == 0.0
    exact, _ = ds.search(q, 10)
    overlap = len(set(got.tolist()) & set(exact.tolist()))
    assert overlap >= 9  # CPU backend computes approx_min_k exactly anyway


def test_approx_ids_filter(rng):
    """approx + ids_filter builds the mask in LIVE-row space (falls back to
    the exact scan), both before and after quantization/mutation."""
    import numpy as np
    import sqlite_vector_tpu as svt

    ds = svt.Dataset("af", svt.parse_options("dimension=16,type=FLOAT32"))
    base = rng.standard_normal((200, 16)).astype("float32")
    ids = ds.add(base)
    q = base[10]
    # unquantized dataset: must not raise and must honor the filter
    allowed = ids[50:100]
    got, dist = ds.search(q, 5, mode="approx", ids_filter=allowed)
    assert set(got.tolist()) <= set(allowed.tolist())
    # quantize then mutate: live-row mask must track the LIVE rows
    ds.quantize()
    ds.remove(ids[:10])
    got, dist = ds.search(base[60], 5, mode="approx", ids_filter=allowed)
    assert set(got.tolist()) <= set(allowed.tolist())
    assert got[0] == ids[60] and dist[0] == 0.0


def test_sharded_mmap_load_is_lazy(tmp_path, rng):
    """Sharded host+mmap load must NOT materialize the matrix in RAM
    (ShardedRows lazy view); search/quantize/save still work through it."""
    import numpy as np
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.hostarray import ShardedRows

    ds = svt.Dataset("lz", svt.parse_options("dimension=12,type=FLOAT32"))
    base = rng.standard_normal((2500, 12)).astype("float32")
    ids = ds.add(base)
    d = str(tmp_path / "lazy")
    ds.save(d, shard_rows=1000)

    ds2 = svt.Dataset.load(d, storage="host", mmap=True)
    hv = ds2._host_vectors
    assert isinstance(hv, ShardedRows)  # the lazy view, not a concatenation
    # shard-crossing slice matches the source
    np.testing.assert_array_equal(hv[995:1005], base[995:1005])
    got, dist = ds2.search(base[1500], 3)
    assert got[0] == ids[1500] and dist[0] == 0.0
    # chunked host quantize works over the view, codes match the hbm build
    ds2.quantize()
    ds.quantize()
    np.testing.assert_array_equal(
        np.asarray(ds2._quant.codes),
        np.asarray(ds._quant.codes)[:2500],
    )
    assert ds2.quant_params == ds.quant_params
    # re-save through the lazy view (shard-by-shard)
    d2 = str(tmp_path / "lazy2")
    ds2.save(d2, shard_rows=700)
    ds3 = svt.Dataset.load(d2)
    got, dist = ds3.search(base[42], 1)
    assert got[0] == ids[42] and dist[0] == 0.0


def test_from_arrays_zero_copy_adoption(rng):
    """Dataset.from_arrays adopts the caller's array without copying
    (the bulk constructor for >HBM host-resident datasets)."""
    import numpy as np
    import pytest
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.errors import VectorConfigError

    base = rng.standard_normal((500, 16)).astype(np.float32)
    ds = svt.Dataset.from_arrays("za", base, storage="host")
    assert ds._host_vectors is base  # adopted, not copied
    assert len(ds) == 500 and ds.dimension == 16
    got, dist = ds.search(base[77], 3)
    assert got[0] == 78 and dist[0] == 0.0  # default ids are 1-based

    # explicit ids + hbm storage + options string
    ids = np.arange(1000, 1500, dtype=np.int64)
    ds2 = svt.Dataset.from_arrays(
        "zb", base, ids, options="dimension=16,type=FLOAT32,distance=COSINE"
    )
    got, _ = ds2.search(base[5], 1)
    assert got[0] == 1005

    # dtype mismatch rejected (no silent copy-cast)
    with pytest.raises(VectorConfigError, match="dtype"):
        svt.Dataset.from_arrays("zc", base.astype(np.float64))
    # dimension mismatch rejected
    with pytest.raises(VectorConfigError, match="dimension"):
        svt.Dataset.from_arrays("zd", base, options="dimension=32")
    # non-finite scan happens unless the caller vouches
    bad = base.copy()
    bad[3, 3] = np.nan
    assert svt.Dataset.from_arrays("ze", bad)._has_nonfinite
    assert not svt.Dataset.from_arrays("zf", bad, has_nonfinite=False)._has_nonfinite


def test_from_arrays_does_not_mutate_caller_options(rng):
    """from_arrays must copy a caller-supplied VectorOptions (it resolves
    dimension=0 in place otherwise, breaking reuse across datasets)."""
    from sqlite_vector_tpu import parse_options

    opts = parse_options("type=FLOAT32")
    assert opts.dimension <= 0
    a16 = rng.standard_normal((10, 16)).astype(np.float32)
    a32 = rng.standard_normal((10, 32)).astype(np.float32)
    d1 = Dataset.from_arrays("m16", a16, options=opts)
    assert opts.dimension <= 0  # caller object untouched
    d2 = Dataset.from_arrays("m32", a32, options=opts)
    assert d1.dimension == 16 and d2.dimension == 32
    # and the adopted options are private: external mutation is inert
    opts.dimension = 999
    assert d1.dimension == 16


def test_upload_padded_preserves_explicit_sharding(rng):
    """Round-3 review finding: a Dataset built with the sharding= parameter
    (no mesh) must keep its NamedSharding through the chunked upload path."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sqlite_vector_tpu.parallel import make_mesh

    mesh = make_mesh(4)
    sh = NamedSharding(mesh, P("rows"))
    ds = Dataset(
        "sh", VectorOptions(dimension=16, type=VectorType.F32), sharding=sh
    )
    data = rng.standard_normal((2000, 16)).astype(np.float32)
    ids = ds.add(data)
    assert ds._vectors.sharding == sh  # not silently single-device
    got, dist = ds.search(data[5], 3)
    assert got[0] == ids[5] and dist[0] == 0.0


def test_save_stream_empty_roundtrip(tmp_path):
    d = str(tmp_path / "empty")
    n = Dataset.save_stream(d, [], options="dimension=8,type=FLOAT32")
    assert n == 0
    ds = Dataset.load(d)
    assert len(ds) == 0
    ds2 = Dataset.load(d, storage="host", mmap=True)
    assert len(ds2) == 0


def test_upload_padded_pow2_count_chunks(rng, tmp_path):
    """count == capacity (power of two) must still stream chunks (a >RAM
    memmap would otherwise be materialized whole in host RAM)."""
    from sqlite_vector_tpu import dataset as dsmod

    old = dsmod._UPLOAD_CHUNK_BYTES
    dsmod._UPLOAD_CHUNK_BYTES = 4096  # force many chunks
    try:
        n, dim = 2048, 8  # n == _next_capacity(n)
        data = rng.standard_normal((n, dim)).astype(np.float32)
        ds = Dataset("p2", VectorOptions(dimension=dim, type=VectorType.F32))
        out = ds._upload_rows_padded(data, n, n)
        assert out.shape == (n, dim)
        np.testing.assert_array_equal(np.asarray(out), data)
    finally:
        dsmod._UPLOAD_CHUNK_BYTES = old


def test_exact_sq_norms_int_dtype_is_int32(rng):
    """Integer-stored datasets cache int32 norms (the exact-integer
    contract; a float cache was discarded and recomputed every scan)."""
    import jax.numpy as jnp

    codes = rng.integers(-128, 128, (500, 32)).astype(np.int8)
    ds = Dataset.from_arrays(
        "i8", codes, options="dimension=32,type=INT8,distance=L2"
    )
    norms = ds._exact_sq_norms(ds._vectors)
    assert norms.dtype == jnp.int32
    want = np.sum(codes.astype(np.int32) ** 2, axis=-1)
    np.testing.assert_array_equal(np.asarray(norms)[:500], want)
    q = codes[3]
    ids, dist = ds.search(q, 5)
    assert ids[0] == ds.ids[3] and dist[0] == 0.0


def test_rerank_near_zero_tie_parity():
    """rerank_topk must snap near-zero distances BEFORE its top-k and rank
    ties in ascending row order, matching scan_topk (reference strict-<
    slot replacement: earliest row wins equal distances)."""
    import numpy as np
    from sqlite_vector_tpu.ops.rerank import rerank_topk
    from sqlite_vector_tpu.ops.scan import scan_topk
    from sqlite_vector_tpu.types import DistanceMetric, QuantType
    from sqlite_vector_tpu import oracle

    q = np.float32([[1.0, 0.0]])
    base = np.float32([[-4e-7, 0.0], [-2e-7, 0.0]])
    want_d, want_i = scan_topk(q, base, DistanceMetric.DOT, 2)
    qt, scale, offset = oracle.compute_quant_params(base, QuantType.I8)
    codes = oracle.quantize(base, scale, offset, qt)
    qq = oracle.quantize(q, scale, offset, qt)
    got_d, got_i = rerank_topk(q, base, qq, codes, DistanceMetric.DOT, 2)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))


def test_rerank_host_rescore_excludes_nonfinite(rng):
    """The host-fallback rerank rescore (mask/host/mesh/stale routes) must
    not admit Inf/NaN exact distances as real neighbors — parity with the
    fused device path, which reports such slots as +inf/-1."""
    import numpy as np
    import sqlite_vector_tpu as svt

    base = rng.standard_normal((30, 8)).astype(np.float32)
    base[4, 2] = np.inf
    base[9, 5] = np.nan
    ds = svt.Dataset("rrnf", svt.parse_options("dimension=8,type=FLOAT32"))
    ids = ds.add(base)
    ds.quantize()
    # ids_filter forces the host rescore path (mask is not None)
    got_ids, got_vals = ds.search(
        base[0], 30, mode="rerank", expand=4, ids_filter=ids
    )
    assert int(ids[4]) not in got_ids.tolist()
    assert int(ids[9]) not in got_ids.tolist()
    assert np.isfinite(got_vals).all()
    assert len(got_ids) == 28


def test_from_arrays_rejects_duplicate_ids(rng):
    vecs = rng.standard_normal((3, 8)).astype(np.float32)
    with pytest.raises(VectorConfigError, match="duplicate ids"):
        Dataset.from_arrays(
            "dup", vecs, ids=[1, 1, 2],
            options=VectorOptions(dimension=8),
        )


def test_require_quant_none_snapshot_raises(rng):
    """A search that snapshotted quant=None (before quantize() ran) must
    error, not adopt a quant that landed concurrently — its filter masks
    were built against the None generation (empty results otherwise)."""
    ds = Dataset("rqn", VectorOptions(dimension=8))
    ds.add(rng.standard_normal((10, 8)).astype(np.float32))
    snapshot = ds._quant  # None: not quantized yet
    ds.quantize()  # the concurrent quantize landing after the snapshot
    with pytest.raises(VectorStateError, match="quantization not found"):
        ds._require_quant("vector_quantize_scan", snapshot)
    # without a snapshot argument the live state is (correctly) used
    assert ds._require_quant("vector_quantize_scan") is ds._quant


def test_host_storage_load_keeps_codes_host_resident(tmp_path, rng):
    """save/load round trip with storage='host': quantized codes stay a
    host array (memmap) streamed per query — load() must not pin them in
    HBM (a >HBM dataset's codes may not fit before an explicit preload)."""
    import jax.numpy as jnp

    base = rng.standard_normal((300, 16)).astype(np.float32)
    ds = Dataset("hl", VectorOptions(dimension=16))
    ds.add(base)
    ds.quantize()
    d = str(tmp_path / "ds")
    ds.save(d)

    back = Dataset.load(d, storage="host", mmap=True)
    assert back._quant is not None
    assert not isinstance(back._quant.codes, jnp.ndarray)
    # codes are host bytes, so they are NOT HBM bytes
    assert back.memory_bytes() == 0
    got, dist = back.search(base[7], 3, exact=False)
    want, _ = ds.search(base[7], 3, exact=False)
    assert got.tolist() == want.tolist()
    # preload() pins them on device, exactly as before
    back.preload()
    assert isinstance(back._quant.codes, jnp.ndarray)
    assert back.memory_bytes() > 0
    got2, _ = back.search(base[7], 3, exact=False)
    assert got2.tolist() == want.tolist()


def test_upload_capacity_bounds_padding():
    """Quantized-code uploads pad to min(pow2 capacity, 64k quantum): the
    pow-2 capacity at 10M rows padded the upload 68% — with the refine
    sidecar resident too that measured an HBM OOM (r5 full bench). Small
    counts keep the pow-2 behavior exactly."""
    from sqlite_vector_tpu.dataset import (
        _UPLOAD_CAP_QUANTUM,
        _next_capacity,
        _upload_capacity,
    )

    # small counts: identical to the growth capacity
    for n in (1, 300, 1024, 70_000):
        assert _upload_capacity(n) == _next_capacity(n)
    # large counts: bounded at one 64k quantum of padding
    cap = _upload_capacity(10_000_000)
    assert cap == 153 * _UPLOAD_CAP_QUANTUM  # 10,027,008
    assert cap - 10_000_000 < _UPLOAD_CAP_QUANTUM
    assert cap < _next_capacity(10_000_000)  # 16.78M
    # mesh multiple still honored
    assert _upload_capacity(10_000_000, 8) % 8 == 0


def test_loaded_hbm_codes_match_matrix_capacity(tmp_path, rng):
    """Regression (r5 review): load() with resident vectors must upload the
    codes at the MATRIX's row capacity, not the padding-bounded upload
    capacity — the fused rerank kernel is gated on capacity equality
    (vecs.shape[0] == codes.shape[0]), and at counts where the 64k quantum
    undercuts the pow-2 capacity (e.g. 140k: 196,608 vs 262,144) a
    save/load round trip silently demoted every rerank to the host-gather
    path. Codes are <= a quarter of the matrix bytes, so matching its
    padding adds no OOM risk (the bounded capacity still serves host
    storage, where no matrix is resident)."""
    import jax.numpy as jnp

    n, dim = 140_000, 8
    base = rng.standard_normal((n, dim)).astype(np.float32)
    # make the probe row an outlier: 140k gaussians in 8-D are dense
    # enough that the int8 prefilter legitimately misses an interior
    # point's exact NN at expand=4 — that recall property is not what
    # this test pins
    base[7] += 8.0
    ds = Dataset("capmatch", VectorOptions(dimension=dim))
    ids = ds.add(base)
    ds.quantize()
    d = str(tmp_path / "ds")
    ds.save(d)

    back = Dataset.load(d)
    assert isinstance(back._quant.codes, jnp.ndarray)
    assert back._vectors.shape[0] == back._quant.codes.shape[0]
    got, dist = back.search(base[7], 3, mode="rerank")
    assert got[0] == ids[7] and dist[0] == 0.0
    # the fused kernel ran: no host-gather decomposition was recorded
    dec = getattr(back, "last_rerank_decomposition", None)
    assert not (dec and dec.get("gathered_rows", 0) > 0)


def test_load_stale_quant_larger_than_live_matrix(tmp_path, rng):
    """Regression (r5 review): a STALE quantization can carry more rows
    than the compacted vector matrix (quantize, remove most rows, save —
    the reference's staleness contract keeps the quantize-time snapshot).
    load() must NOT clamp the code upload to the smaller matrix capacity:
    that truncated/misplaced code rows (ValueError on mesh loads, silent
    corruption single-device). The stale codes route to the id-remapping
    paths anyway, so capacity equality with the matrix buys nothing."""
    import jax.numpy as jnp

    n, dim = 3000, 8
    base = rng.standard_normal((n, dim)).astype(np.float32)
    base[7] += 8.0  # keep the probe row an unambiguous outlier
    ds = Dataset("staleq", VectorOptions(dimension=dim))
    ids = ds.add(base)
    ds.quantize()
    assert ds.remove(ids[500:]) == 2500  # live 500 < MIN_CAPACITY < 3000
    d = str(tmp_path / "ds")
    ds.save(d)

    back = Dataset.load(d)
    assert back._quant.stale and back._quant.count == n
    assert len(back) == 500
    # every quantize-time code row survived the round trip
    assert isinstance(back._quant.codes, jnp.ndarray)
    assert back._quant.codes.shape[0] >= n
    np.testing.assert_array_equal(
        np.asarray(back._quant.codes)[:n, :dim],
        np.asarray(ds._quant.codes)[:n, :dim],
    )
    # and the stale-remap search paths serve the live rows correctly
    got, dist = back.search(base[7], 3, mode="rerank")
    assert got[0] == ids[7] and dist[0] == 0.0
    got, _ = back.search(base[700], 3, mode="rerank")
    assert ids[700] not in got  # removed rows never resurface
