"""Native mmap store tests (reference idiom: test_mmap_hashmap_util.py /
test_mmap_valstore_util.py — write/reload/lazy-load equality)."""

import numpy as np
import pytest

from pecos_tpu.utils.mmap_hashmap_util import MmapHashmap
from pecos_tpu.utils.mmap_valstore_util import BytesStore, Float32Store


def test_int2int_roundtrip(tmp_path):
    path = str(tmp_path / "i2i.map")
    m = MmapHashmap("int2int")
    m.open("w", path)
    for k in range(1000):
        m.map.insert(k * 7, k)
    assert m.map.size() == 1000
    assert m.map.get(21) == 3
    assert m.map.get(22, -5) == -5
    m.close()

    for mode in ("r", "r_lazy"):
        r = MmapHashmap("int2int")
        r.open(mode, path)
        assert r.map.size() == 1000
        keys = np.arange(0, 7000, 7, dtype=np.uint64)
        vals = r.map.batch_get(keys, default=-1, threads=2)
        np.testing.assert_array_equal(vals, np.arange(1000))
        missing = r.map.batch_get(np.array([1, 2, 3], np.uint64), default=-9)
        np.testing.assert_array_equal(missing, [-9, -9, -9])
        r.close()


def test_str2int_roundtrip(tmp_path):
    path = str(tmp_path / "s2i.map")
    m = MmapHashmap("str2int")
    m.open("w", path)
    words = [f"word_{i}" for i in range(500)]
    for i, w in enumerate(words):
        m.map.insert(w, i)
    assert m.map.size() == 500
    assert m.map.get("word_42") == 42
    assert m.map.get("nope", -1) == -1
    m.close()

    r = MmapHashmap("str2int")
    r.open("r", path)
    vals = r.map.batch_get(words + ["missing"], default=-1, threads=2)
    np.testing.assert_array_equal(vals[:-1], np.arange(500))
    assert vals[-1] == -1
    r.close()


def test_overwrite_and_collisions(tmp_path):
    m = MmapHashmap("int2int")
    m.open("w", str(tmp_path / "x.map"))
    m.map.insert(5, 1)
    m.map.insert(5, 2)
    assert m.map.get(5) == 2
    assert m.map.size() == 1
    m.close()


def test_float32_store(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((50, 8)).astype(np.float32)
    store = Float32Store.from_array(arr)
    assert store.shape == (50, 8)
    rows = np.array([3, 7, 3], np.uint64)
    cols = np.array([0, 5, 2], np.uint64)
    np.testing.assert_array_equal(store.batch_get(rows, cols), arr[[3, 7, 3], [0, 5, 2]])
    np.testing.assert_array_equal(store.get_rows(rows), arr[[3, 7, 3]])
    path = str(tmp_path / "f32.store")
    store.save(path)
    for lazy in (False, True):
        loaded = Float32Store.load(path, lazy=lazy)
        np.testing.assert_array_equal(loaded.get_rows(rows), arr[[3, 7, 3]])


def test_bytes_store(tmp_path):
    strs = ["hello", "a-much-longer-string-for-truncation", "", "xyz"]
    store = BytesStore.from_list(strs)
    assert store.nr_rows == 4
    got = store.batch_get(np.array([0, 1, 2, 3], np.uint64), trunc_len=10)
    assert got[0] == b"hello"
    assert got[1] == b"a-much-lon"  # truncated to 10
    assert got[2] == b""
    assert got[3] == b"xyz"
    path = str(tmp_path / "bytes.store")
    store.save(path)
    loaded = BytesStore.load(path)
    got2 = loaded.batch_get(np.array([1], np.uint64), trunc_len=100)
    assert got2[0] == strs[1].encode()


def test_fstr2int_roundtrip(tmp_path):
    """Fixed-length-key str2int: insert/get/batch/save/load (+lazy), and the
    key-length contract is enforced."""
    import pytest
    from pecos_tpu.utils.mmap_hashmap_util import MmapHashmap

    path = str(tmp_path / "fs2i.bin")
    m = MmapHashmap("fstr2int", key_len=10).open("w", path)
    keys = [f"item{i:06d}".encode() for i in range(1000)]
    for i, k in enumerate(keys):
        m.map.insert(k, i * 3)
    assert m.map.size() == 1000
    assert m.map.get(keys[7]) == 21
    assert m.map.get(b"missing-xx", default=-5) == -5
    with pytest.raises(ValueError):
        m.map.insert(b"short", 1)
    m.close()

    for mode in ("r", "r_lazy"):
        r = MmapHashmap("fstr2int").open(mode, path)
        assert r.key_len == 10
        assert r.map.size() == 1000
        got = r.map.batch_get(keys[:100] + [b"nothere123"], default=-1)
        assert list(got[:100]) == [i * 3 for i in range(100)]
        assert got[100] == -1
        # packed-buffer batch form
        got2 = r.map.batch_get(b"".join(keys[:5]))
        assert list(got2) == [0, 3, 6, 9, 12]
        with pytest.raises(RuntimeError):
            r.map.insert(keys[0], 1)
        r.close()
