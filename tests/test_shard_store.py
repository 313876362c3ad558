"""Shard store + native streaming reader + streamed distributed build."""

import numpy as np
import pytest

from matternet_rs_tpu import native
from matternet_rs_tpu.graph import GraphParams
from matternet_rs_tpu.parallel.mesh import make_mesh
from matternet_rs_tpu.storage import shards as ss


def _py_reader(paths, block_rows, f, start_row=0, dtype=np.float32):
    """A ShardReader forced onto the Python memmap fallback WITHOUT first
    spawning (and then leaking) the native read-ahead thread."""
    r = native.ShardReader.__new__(native.ShardReader)
    r.paths = [str(p) for p in paths]
    r.block_rows = int(block_rows)
    r.f = int(f)
    r.dtype = np.dtype(dtype)
    r.row_bytes = r.f * r.dtype.itemsize
    r.start_row = int(start_row)
    r._lib = None
    r._handle = None
    r._py_iter = r._python_blocks()
    return r


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(5, 24)) * 4.0
    X = (centers[rng.integers(0, 5, 5000)] + rng.normal(size=(5000, 24))).astype(
        np.float32
    )
    d = tmp_path_factory.mktemp("shards")
    manifest = ss.write_shards(X, d, rows_per_shard=1337)  # uneven shards
    return X, d, manifest


def test_write_shards_manifest(store):
    X, d, m = store
    assert m["n_rows"] == 5000 and m["n_features"] == 24
    assert [s["rows"] for s in m["shards"]] == [1337, 1337, 1337, 989]
    assert ss.read_manifest(d) == m


@pytest.mark.parametrize("block_rows", [500, 1337, 4096])
def test_stream_blocks_roundtrip(store, block_rows):
    X, d, _ = store
    got = np.concatenate(list(ss.stream_blocks(d, block_rows)))
    np.testing.assert_array_equal(got, X)


def test_native_reader_available_and_matches_python(store):
    X, d, m = store
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    paths = [d / s["file"] for s in m["shards"]]
    nat = native.ShardReader(paths, 768, 24)
    assert nat._handle is not None, "native reader did not engage"
    nat_blocks = list(nat)
    py_blocks = list(_py_reader(paths, 768, 24))
    assert len(nat_blocks) == len(py_blocks)
    for a, b in zip(nat_blocks, py_blocks):
        np.testing.assert_array_equal(a, b)


def test_native_reader_int8_dtype_matches_python(tmp_path):
    """The int8 sketch reload streams through the SAME reader with
    dtype=np.int8 (VERDICT r3 #7): native and Python paths must agree
    byte-for-byte, including the ragged last block."""
    rng = np.random.default_rng(9)
    q8 = rng.integers(-127, 128, (3001, 24), dtype=np.int8)
    p = tmp_path / "sketch.bin"
    p.write_bytes(q8.tobytes())
    py_blocks = list(_py_reader([p], 700, 24, dtype=np.int8))
    assert sum(len(b) for b in py_blocks) == 3001
    np.testing.assert_array_equal(np.concatenate(py_blocks), q8)
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    nat = native.ShardReader([p], 700, 24, dtype=np.int8)
    assert nat._handle is not None, "native reader did not engage"
    nat_blocks = list(nat)
    assert len(nat_blocks) == len(py_blocks)
    for a, b in zip(nat_blocks, py_blocks):
        assert a.dtype == np.int8
        np.testing.assert_array_equal(a, b)


def test_write_shards_streaming_producer(tmp_path):
    rng = np.random.default_rng(1)
    blocks = [rng.normal(size=(700, 8)).astype(np.float32) for _ in range(4)]
    m = ss.write_shards(iter(blocks), tmp_path, rows_per_shard=1000)
    assert m["n_rows"] == 2800
    got = np.concatenate(list(ss.stream_blocks(tmp_path, 512)))
    np.testing.assert_array_equal(got, np.concatenate(blocks))


def test_shard_items_from_store_matches_memory(store):
    X, d, _ = store
    mesh = make_mesh(8)
    Xs, n = ss.shard_items_from_store(mesh, d)
    assert n == 5000
    got = np.asarray(Xs)
    np.testing.assert_array_equal(got[:n], X)
    assert np.all(got[n:] == 0.0)


def test_distributed_build_from_store_end_to_end(store):
    X, d, _ = store
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    sa = ss.distributed_build_from_store(d, params, k_clusters=10, n_devices=8)
    assert sa.n_items == 5000
    res = sa.search(X[42], k=5)
    assert res[0][0] == 42
    lam = np.asarray(sa.lambdas)[:5000]
    assert lam.min() >= 0.0 and lam.max() <= 1.0

    # Equals the in-memory distributed build on the same data.
    from matternet_rs_tpu.parallel.index import ShardedArrowSpace

    sa_mem = ShardedArrowSpace.distributed_build(
        [X], params, k_clusters=10, n_devices=8
    )
    np.testing.assert_allclose(
        lam, np.asarray(sa_mem.lambdas)[:5000], atol=1e-6
    )


def test_distributed_build_from_store_modes(store):
    """The store build mirrors distributed_build's stage-1 modes: 'serial'
    (default, exact parity — asserted end-to-end above) streams a host
    sample with an optional bound; 'lloyd' stays the nothing-N-sized scale
    escape; small sample blocks hit the multi-block concat path."""
    X, d, _ = store
    params = GraphParams(eps=1.0, k=6, topk=6, sparsity_check=False)
    sa_l = ss.distributed_build_from_store(
        d, params, k_clusters=10, n_devices=8, centroids="lloyd"
    )
    assert sa_l.n_items == 5000
    assert sa_l.search(X[7], k=3)[0][0] == 7
    # Bounded sample + tiny stream blocks (forces concat + early close).
    sa_b = ss.distributed_build_from_store(
        d, params, k_clusters=10, n_devices=8,
        centroid_sample=1500, sample_block_rows=512,
    )
    assert sa_b.search(X[3], k=3)[0][0] == 3
    with pytest.raises(ValueError, match="at least one sample row"):
        ss.distributed_build_from_store(
            d, params, k_clusters=10, n_devices=8, centroid_sample=0
        )
    with pytest.raises(ValueError, match="centroids must be"):
        ss.distributed_build_from_store(
            d, params, k_clusters=10, n_devices=8, centroids="nope"
        )


def test_reader_exhaustion_keeps_raising_stopiteration(store):
    """Padding-only devices probe past the end: every next() after
    exhaustion must raise StopIteration (native reader regression)."""
    X, d, m = store
    paths = [d / s["file"] for s in m["shards"]]
    r = native.ShardReader(paths, 4096, 24)
    list(r)                                # exhaust
    for _ in range(3):
        with pytest.raises(StopIteration):
            next(r)


def test_store_with_padding_only_devices(tmp_path):
    """N smaller than the mesh: several devices receive pure padding."""
    rng = np.random.default_rng(5)
    X = rng.normal(size=(10, 6)).astype(np.float32)
    ss.write_shards(X, tmp_path, rows_per_shard=4)
    mesh = make_mesh(8)
    Xs, n = ss.shard_items_from_store(mesh, tmp_path)
    assert n == 10
    got = np.asarray(Xs)
    np.testing.assert_array_equal(got[:10], X)
    assert np.all(got[10:] == 0.0)


@pytest.mark.parametrize("start_row", [0, 1, 767, 768, 769, 2000, 5000])
def test_stream_blocks_start_row_seeks(store, start_row):
    """start_row streams exactly the suffix, in both the native reader and
    the Python memmap fallback, across shard boundaries and unaligned
    offsets — crash-resume must seek, not re-read."""
    X, d, m = store
    n = len(X)
    if start_row >= n:
        pytest.skip("start beyond fixture")
    got = np.concatenate(list(ss.stream_blocks(d, 768, start_row=start_row)))
    np.testing.assert_array_equal(got, X[start_row:])
    paths = [d / s["file"] for s in m["shards"]]
    py = _py_reader(paths, 768, X.shape[1], start_row=start_row)
    np.testing.assert_array_equal(np.concatenate(list(py)), X[start_row:])


def test_stream_blocks_start_row_at_end_yields_nothing(store):
    X, d, _ = store
    assert list(ss.stream_blocks(d, 768, start_row=len(X))) == []


def test_stream_blocks_negative_start_row_raises(store):
    """start_row < 0 must fail fast on BOTH reader paths — the native
    skip guard would silently stream from row 0 (duplicate rows on a
    resumed lambda pass), the Python fallback would raise an opaque
    broadcast error (review finding)."""
    _, d, _ = store
    with pytest.raises(ValueError, match="start_row"):
        ss.stream_blocks(d, 768, start_row=-1)


def test_resume_skip_rejects_torn_shard(store, tmp_path):
    """A shard with a torn trailing partial row must FAIL a resumed
    stream whose seek skips over it, exactly like a fresh stream fails
    reading it — rounding the partial row away would silently shift
    every later row's global id (review finding)."""
    import shutil

    X, d, m = store
    if native.get_lib() is None or not getattr(
        native.get_lib(), "_has_shard_reader", False
    ):
        pytest.skip("native reader unavailable")
    d2 = tmp_path / "torn"
    shutil.copytree(d, d2)
    first = d2 / m["shards"][0]["file"]
    # tear the FIRST shard: 1337 rows -> 1336 rows + 7 stray bytes
    with open(first, "r+b") as fh:
        fh.truncate(1336 * X.shape[1] * 4 + 7)
    # resume past the torn shard: the skip path must report the tear
    r = ss.stream_blocks(d2, 512, start_row=2000)
    with pytest.raises(IOError):
        list(r)


def test_incremental_clustering_zero_max_clusters_raises():
    """max_clusters=0 previously drove the native scan into an
    out-of-bounds write on zero-size buffers (ASAN-confirmed SEGV);
    both paths now raise ValueError before any allocation."""
    X = np.random.default_rng(0).normal(size=(16, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="max_clusters"):
        native.incremental_cluster(X, 0, 1.0)
