"""Storage backend tests (emb_storage/ parity)."""

import numpy as np
import pytest

from evstore_tpu.cache.storage import (DummyStore, FileStore, MmapStore,
                                       SqliteStore, StorageManager,
                                       encode_rows, row_nbytes,
                                       write_ev_tables_binary)


@pytest.fixture
def tables(rng):
    return [rng.uniform(-0.9, 0.9, (n, 8)).astype(np.float32)
            for n in (50, 30, 20)]


def test_row_nbytes():
    assert row_nbytes(32, 36) == 144   # cache_manager.cpp:22-28 geometry
    assert row_nbytes(16, 36) == 72
    assert row_nbytes(8, 36) == 36
    assert row_nbytes(4, 36) == 18


def test_encode_decode_roundtrip_fp32(tables):
    from evstore_tpu.cache.storage import _decode_rows
    raw = encode_rows(tables[0], 32)
    back = _decode_rows(raw, 32, 8)
    np.testing.assert_array_equal(back, tables[0])


@pytest.mark.parametrize("precision", [16, 8, 4])
def test_encode_decode_quantized(tables, precision):
    from evstore_tpu.cache.storage import _decode_rows
    raw = encode_rows(tables[0], precision)
    assert raw.shape[1] == row_nbytes(precision, 8)
    back = _decode_rows(raw, precision, 8)
    assert back.shape == tables[0].shape
    err = np.abs(back - tables[0])
    if precision == 8:
        assert np.max(err) < 0.01
    elif precision == 16:
        # dense region resolution 1.3/65000; outliers (|x|>0.65) use 0.01
        # steps with parity-forced sign -> up to ~0.021 error (by design,
        # reduce_precision.py:26-67)
        dense = np.abs(tables[0]) <= 0.65
        assert np.max(err[dense]) < 2 * 1.3 / 65000
        assert np.max(err[~dense]) < 0.021


def test_dummy_store(tables):
    s = DummyStore().load_arrays(tables)
    np.testing.assert_array_equal(s.get(1, 7), tables[1][7])
    got = s.get_batch([(0, 5), (2, 19), (1, 0)])
    np.testing.assert_array_equal(got[1], tables[2][19])


@pytest.mark.parametrize("precision", [32, 8])
def test_file_and_mmap_stores(tables, tmp_path, precision):
    from evstore_tpu.cache.storage import _decode_rows
    write_ev_tables_binary(tables, str(tmp_path), precision)
    sizes = [t.shape[0] for t in tables]
    for cls in (FileStore, MmapStore):
        s = cls(str(tmp_path), sizes, 8, precision)
        got = s.get(1, 7)
        expect = _decode_rows(encode_rows(tables[1][7:8], precision),
                              precision, 8)[0]
        np.testing.assert_allclose(got, expect, rtol=1e-6)
        batch = s.get_batch([(0, 0), (2, 19)])
        assert batch.shape == (2, 8)
        s.close()


def test_sqlite_store(tables, tmp_path):
    write_ev_tables_binary(tables, str(tmp_path), 32)
    sizes = [t.shape[0] for t in tables]
    s = SqliteStore(str(tmp_path / "ev.db"), sizes, 8, 32)
    s.create_and_load(str(tmp_path), sizes)
    np.testing.assert_allclose(s.get(2, 19), tables[2][19], rtol=1e-6)
    got = s.get_batch([(0, 5), (1, 7), (2, 0)])
    np.testing.assert_allclose(got[1], tables[1][7], rtol=1e-6)
    s.close()


def test_storage_manager_facade(tables, tmp_path):
    m = StorageManager("dummy", dim=8).load(tables=tables)
    row = m.request_group([3, 4, 5])
    np.testing.assert_array_equal(row[0], tables[0][3])
    np.testing.assert_array_equal(row[2], tables[2][5])
    m.close()
    assert m.store is None
    with pytest.raises(ValueError):
        StorageManager("rocksdb")


def test_sqlite_per_table_layout(tables, tmp_path):
    """The 26-tabs layout variant (emb_storage/storage_sqlite_26_tabs.py)."""
    write_ev_tables_binary(tables, str(tmp_path), 32)
    sizes = [t.shape[0] for t in tables]
    s = SqliteStore(str(tmp_path / "ev26.db"), sizes, 8, 32,
                    layout="per_table")
    s.create_and_load(str(tmp_path), sizes)
    np.testing.assert_allclose(s.get(2, 19), tables[2][19], rtol=1e-6)
    got = s.get_batch([(0, 5), (1, 7)])
    np.testing.assert_allclose(got[1], tables[1][7], rtol=1e-6)
    s.close()


# ------------------------------------------------ log-structured KV backend

def _has_gpp():
    import shutil
    return shutil.which("g++") is not None


def test_logkv_roundtrip_and_reopen(tmp_path):
    """LogKVStore ≙ storage_rocksdb.py: bulk load, point/batch gets, WRITES
    (LSM append), index rebuild on reopen, compaction."""
    if not _has_gpp():
        import pytest as _p
        _p.skip("no g++")
    from evstore_tpu.cache.storage import LogKVStore, write_ev_tables_binary
    rng = np.random.default_rng(0)
    sizes = [40, 25]
    dim = 8
    tables = [np.asarray(rng.uniform(-1, 1, (s, dim)), np.float32)
              for s in sizes]
    write_ev_tables_binary(tables, str(tmp_path))
    db = str(tmp_path / "ev.log")
    kv = LogKVStore(db, sizes, dim).create_and_load(str(tmp_path), sizes)
    assert kv.count() == sum(sizes)
    np.testing.assert_allclose(kv.get(1, 7), tables[1][7], rtol=1e-6)
    got = kv.get_batch([(0, 3), (1, 24), (0, 39)])
    np.testing.assert_allclose(got[1], tables[1][24], rtol=1e-6)
    # update = append; read-your-writes
    newv = np.full((2, dim), 0.5, np.float32)
    kv.put_rows(0, np.asarray([3, 5]), newv)
    np.testing.assert_allclose(kv.get(0, 3), newv[0], rtol=1e-6)
    assert kv.count() == sum(sizes)   # updates don't grow the live count
    kv.close()
    # reopen: index rebuilt from the log, later records win
    kv2 = LogKVStore(db, sizes, dim)
    assert kv2.count() == sum(sizes)
    np.testing.assert_allclose(kv2.get(0, 5), newv[1], rtol=1e-6)
    np.testing.assert_allclose(kv2.get(1, 7), tables[1][7], rtol=1e-6)
    # compact reclaims the superseded records
    import os
    before = os.path.getsize(db)
    reclaimed = kv2.compact()
    assert reclaimed == 2 * (8 + dim * 4)
    assert os.path.getsize(db) == before - reclaimed
    np.testing.assert_allclose(kv2.get(0, 3), newv[0], rtol=1e-6)
    kv2.close()
    # ...and the compacted log still reopens correctly
    kv3 = LogKVStore(db, sizes, dim)
    assert kv3.count() == sum(sizes)
    np.testing.assert_allclose(kv3.get(0, 5), newv[1], rtol=1e-6)
    kv3.close()


def test_logkv_through_storage_manager(tmp_path):
    if not _has_gpp():
        import pytest as _p
        _p.skip("no g++")
    from evstore_tpu.cache.storage import StorageManager, write_ev_tables_binary
    rng = np.random.default_rng(1)
    sizes = [30, 20]
    tables = [np.asarray(rng.uniform(-1, 1, (s, 4)), np.float32)
              for s in sizes]
    write_ev_tables_binary(tables, str(tmp_path))
    sm = StorageManager("logkv", dim=4).load(bin_dir=str(tmp_path),
                                             table_sizes=sizes)
    np.testing.assert_allclose(sm.request_group([5, 19]),
                               np.stack([tables[0][5], tables[1][19]]),
                               rtol=1e-6)
    sm.close()
    # reopen path: count() > 0 skips the bulk load
    sm2 = StorageManager("logkv", dim=4).load(bin_dir=str(tmp_path),
                                              table_sizes=sizes)
    np.testing.assert_allclose(sm2.get(1, 3), tables[1][3], rtol=1e-6)
    sm2.close()


def test_logkv_quantized_rows(tmp_path):
    if not _has_gpp():
        import pytest as _p
        _p.skip("no g++")
    from evstore_tpu.cache.storage import LogKVStore, write_ev_tables_binary
    rng = np.random.default_rng(2)
    tables = [np.asarray(rng.uniform(-1, 1, (16, 4)), np.float32)]
    write_ev_tables_binary(tables, str(tmp_path), precision=8)
    kv = LogKVStore(str(tmp_path / "q.log"), [16], 4, precision=8
                    ).create_and_load(str(tmp_path), [16])
    got = kv.get(0, 9)
    np.testing.assert_allclose(got, tables[0][9], atol=0.01)
    kv.close()


def test_logkv_per_table_layout(tmp_path):
    """The 26-tabs layout variant (emb_storage/storage_rocksdb_26_tabs.py):
    one log file per EV table, row-only keys."""
    if not _has_gpp():
        import pytest as _p
        _p.skip("no g++")
    import os
    from evstore_tpu.cache.storage import LogKVStore, write_ev_tables_binary
    rng = np.random.default_rng(2)
    sizes = [40, 25, 10]
    dim = 8
    tables = [np.asarray(rng.uniform(-1, 1, (s, dim)), np.float32)
              for s in sizes]
    write_ev_tables_binary(tables, str(tmp_path))
    db = str(tmp_path / "ev26.log")
    kv = LogKVStore(db, sizes, dim, layout="per_table"
                    ).create_and_load(str(tmp_path), sizes)
    # one physical log per table
    assert all(os.path.exists(f"{db}.t{t}") for t in range(3))
    assert kv.count() == sum(sizes)
    np.testing.assert_allclose(kv.get(2, 7), tables[2][7], rtol=1e-6)
    got = kv.get_batch([(0, 3), (2, 9), (1, 24), (0, 39)])
    np.testing.assert_allclose(got[1], tables[2][9], rtol=1e-6)
    np.testing.assert_allclose(got[3], tables[0][39], rtol=1e-6)
    kv.put_rows(1, np.asarray([4]), np.full((1, dim), 0.25, np.float32))
    np.testing.assert_allclose(kv.get(1, 4), 0.25, rtol=1e-6)
    assert kv.compact() == 8 + dim * 4
    kv.close()
    kv2 = LogKVStore(db, sizes, dim, layout="per_table")
    np.testing.assert_allclose(kv2.get(1, 4), 0.25, rtol=1e-6)
    kv2.close()


def test_storage_manager_layout_passthrough(tmp_path):
    if not _has_gpp():
        import pytest as _p
        _p.skip("no g++")
    from evstore_tpu.cache.storage import StorageManager, write_ev_tables_binary
    import pytest
    with pytest.raises(ValueError):
        StorageManager("logkv", layout="bogus")
    rng = np.random.default_rng(3)
    sizes = [12, 8]
    tables = [np.asarray(rng.uniform(-1, 1, (s, 4)), np.float32)
              for s in sizes]
    write_ev_tables_binary(tables, str(tmp_path))
    for backend in ("sqlite", "logkv"):
        sm = StorageManager(backend, dim=4, layout="per_table").load(
            bin_dir=str(tmp_path), table_sizes=sizes)
        np.testing.assert_allclose(sm.get(1, 3), tables[1][3], rtol=1e-6)
        sm.close()
