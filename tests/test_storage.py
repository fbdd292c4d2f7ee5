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
