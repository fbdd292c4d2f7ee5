"""Embedding storage backends behind the cache tiers.

Reference: emb_storage/ — dummy in-RAM (storage_dummy.py), per-table binary
file seek+read (file_read.py), mmap (mmap_file_read.py), SQLite single-blob
table with global rowids (storage_sqlite.py), RocksDB (storage_rocksdb.py;
no rocksdb in this image — the sqlite/file backends cover the
beyond-DRAM capability), all behind a facade (storage_manager.py) with a
cache-bypass path and bulk load.

Binary EV-table format (script/convert_ev_to_binary.py): row-major raw
values, fp32 rows = dim*4 bytes (144 B at dim 36, storage_rocksdb.py:22);
quantized tables store 1 B (int8), 2 B (ushort16) or half a byte (int4,
two codes per byte) per value.

TPU-first addition: every backend supports *batched* gets
(`get_batch(keys) -> [K, D] fp32`) because the engine fetches per training
batch, not per request — the reference fetches per 26-key group
(storage_manager.py:96-123).
"""

from __future__ import annotations

import mmap as _mmap
import os
import sqlite3
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from evstore_tpu.ops import quant as qlib

Key = Tuple[int, int]


def _decode_rows(buf: np.ndarray, precision: int, dim: int) -> np.ndarray:
    """Decode raw stored rows [K, bytes/row] -> fp32 [K, dim] using the
    reference codecs (numpy twins in ops/quant.py — host hot path, no device
    round-trip)."""
    if precision == 32:
        return np.ascontiguousarray(buf).view(np.float32).reshape(-1, dim)
    if precision == 16:
        codes = np.ascontiguousarray(buf).view(np.uint16).reshape(-1, dim)
        return qlib.np_dequantize_ushort(codes)
    if precision == 8:
        return qlib.np_dequantize_int8(buf.reshape(-1, dim))
    if precision == 4:
        # two codes per byte: high nibble first
        packed = buf.reshape(-1, (dim + 1) // 2)
        codes = np.empty((packed.shape[0], 2 * packed.shape[1]), np.uint8)
        codes[:, 0::2] = (packed >> 4) & 0xF
        codes[:, 1::2] = packed & 0xF
        return qlib.np_dequantize_int4(codes[:, :dim])
    raise ValueError(f"unsupported precision {precision}")


def row_nbytes(precision: int, dim: int) -> int:
    if precision == 32:
        return dim * 4
    if precision == 16:
        return dim * 2
    if precision == 8:
        return dim
    if precision == 4:
        return (dim + 1) // 2
    raise ValueError(f"unsupported precision {precision}")


def encode_rows(rows: np.ndarray, precision: int) -> np.ndarray:
    """fp32 [K, dim] -> raw bytes [K, row_nbytes] (the offline
    reduce_precision + convert_ev_to_binary pipeline)."""
    rows = np.asarray(rows, np.float32)
    if precision == 32:
        return rows.view(np.uint8).reshape(rows.shape[0], -1)
    if precision == 16:
        codes = qlib.np_quantize_ushort(rows)
        return codes.view(np.uint8).reshape(rows.shape[0], -1)
    if precision == 8:
        return qlib.np_quantize_int8(rows)
    if precision == 4:
        codes = qlib.np_quantize_int4(rows)
        if codes.shape[1] % 2:
            codes = np.concatenate(
                [codes, np.zeros((codes.shape[0], 1), np.uint8)], axis=1)
        return ((codes[:, 0::2] << 4) | codes[:, 1::2]).astype(np.uint8)
    raise ValueError(f"unsupported precision {precision}")


def write_ev_tables_binary(tables: Sequence[np.ndarray], out_dir: str,
                           precision: int = 32) -> List[str]:
    """Write per-table .bin files (the offline pipeline's handoff format,
    script/convert_ev_to_binary.py:32-56; tables are 1-indexed on disk)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for t, tab in enumerate(tables):
        p = os.path.join(out_dir, f"ev-table-{t + 1}.bin")
        encode_rows(np.asarray(tab), precision).tofile(p)
        paths.append(p)
    return paths


class DummyStore:
    """All tables in RAM (emb_storage/storage_dummy.py)."""

    def __init__(self, precision: int = 32, dim: int = 36):
        self.precision = precision
        self.dim = dim
        self.tables: List[np.ndarray] = []

    def load_arrays(self, tables: Sequence[np.ndarray]):
        self.tables = [np.asarray(t, np.float32) for t in tables]
        self.dim = self.tables[0].shape[1]
        return self

    def load(self, bin_dir: str, table_sizes: Sequence[int], dim: int):
        self.dim = dim
        nb = row_nbytes(self.precision, dim)
        self.tables = []
        for t, n in enumerate(table_sizes):
            raw = np.fromfile(os.path.join(bin_dir, f"ev-table-{t + 1}.bin"),
                              dtype=np.uint8).reshape(n, nb)
            self.tables.append(_decode_rows(raw, self.precision, dim))
        return self

    def get(self, table: int, row: int) -> np.ndarray:
        return self.tables[table][row]

    def get_batch(self, keys: Sequence[Key]) -> np.ndarray:
        out = np.empty((len(keys), self.dim), np.float32)
        for i, (t, r) in enumerate(keys):
            out[i] = self.tables[t][r]
        return out

    def close(self):
        self.tables = []


class FileStore:
    """Per-table .bin seek+read (emb_storage/file_read.py:27-33)."""

    def __init__(self, bin_dir: str, table_sizes: Sequence[int], dim: int,
                 precision: int = 32):
        self.dim = dim
        self.precision = precision
        self.nb = row_nbytes(precision, dim)
        self.files = [open(os.path.join(bin_dir, f"ev-table-{t + 1}.bin"),
                           "rb") for t in range(len(table_sizes))]

    def get(self, table: int, row: int) -> np.ndarray:
        f = self.files[table]
        f.seek(row * self.nb)
        raw = np.frombuffer(f.read(self.nb), np.uint8)
        return _decode_rows(raw, self.precision, self.dim)[0]

    def get_batch(self, keys: Sequence[Key]) -> np.ndarray:
        raw = np.empty((len(keys), self.nb), np.uint8)
        for i, (t, r) in enumerate(keys):
            f = self.files[t]
            f.seek(r * self.nb)
            raw[i] = np.frombuffer(f.read(self.nb), np.uint8)
        return _decode_rows(raw, self.precision, self.dim)

    def close(self):
        for f in self.files:
            f.close()
        self.files = []


class MmapStore:
    """mmap'd per-table .bin (emb_storage/mmap_file_read.py:32-40)."""

    def __init__(self, bin_dir: str, table_sizes: Sequence[int], dim: int,
                 precision: int = 32):
        self.dim = dim
        self.precision = precision
        self.nb = row_nbytes(precision, dim)
        self.maps = []
        self._files = []
        for t in range(len(table_sizes)):
            f = open(os.path.join(bin_dir, f"ev-table-{t + 1}.bin"), "rb")
            self._files.append(f)
            self.maps.append(_mmap.mmap(f.fileno(), 0, prot=_mmap.PROT_READ))

    def get(self, table: int, row: int) -> np.ndarray:
        m = self.maps[table]
        raw = np.frombuffer(m[row * self.nb:(row + 1) * self.nb], np.uint8)
        return _decode_rows(raw, self.precision, self.dim)[0]

    def get_batch(self, keys: Sequence[Key]) -> np.ndarray:
        raw = np.empty((len(keys), self.nb), np.uint8)
        for i, (t, r) in enumerate(keys):
            m = self.maps[t]
            raw[i] = np.frombuffer(m[r * self.nb:(r + 1) * self.nb], np.uint8)
        return _decode_rows(raw, self.precision, self.dim)

    def close(self):
        for m in self.maps:
            m.close()
        for f in self._files:
            f.close()
        self.maps, self._files = [], []


class SqliteStore:
    """SQLite backing store, two layouts:
    - "global": single blob table keyed by global rowid from per-table
      cumulative offsets (emb_storage/storage_sqlite.py:28-39,106-113)
    - "per_table": one DB table per EV table
      (emb_storage/storage_sqlite_26_tabs.py)
    """

    def __init__(self, db_path: str, table_sizes: Sequence[int], dim: int,
                 precision: int = 32, layout: str = "global"):
        self.dim = dim
        self.precision = precision
        self.nb = row_nbytes(precision, dim)
        self.offsets = np.concatenate([[0], np.cumsum(table_sizes)])
        self.db_path = db_path
        self.layout = layout
        self.n_tables = len(table_sizes)
        self.conn = sqlite3.connect(db_path)

    def create_and_load(self, bin_dir: str, table_sizes: Sequence[int]):
        cur = self.conn.cursor()
        if self.layout == "global":
            cur.execute("DROP TABLE IF EXISTS tab1")
            cur.execute("CREATE TABLE tab1 (b BLOB)")
        for t, n in enumerate(table_sizes):
            raw = np.fromfile(os.path.join(bin_dir, f"ev-table-{t + 1}.bin"),
                              dtype=np.uint8).reshape(n, self.nb)
            if self.layout == "global":
                cur.executemany("INSERT INTO tab1 (b) VALUES (?)",
                                ((r.tobytes(),) for r in raw))
            else:
                cur.execute(f"DROP TABLE IF EXISTS ev_{t + 1}")
                cur.execute(f"CREATE TABLE ev_{t + 1} (b BLOB)")
                cur.executemany(f"INSERT INTO ev_{t + 1} (b) VALUES (?)",
                                ((r.tobytes(),) for r in raw))
        self.conn.commit()
        return self

    def _rowid(self, table: int, row: int) -> int:
        return int(self.offsets[table]) + row + 1  # sqlite rowid is 1-based

    def get(self, table: int, row: int) -> np.ndarray:
        if self.layout == "global":
            cur = self.conn.execute("SELECT b FROM tab1 WHERE rowid = ?",
                                    (self._rowid(table, row),))
        else:
            cur = self.conn.execute(
                f"SELECT b FROM ev_{table + 1} WHERE rowid = ?", (row + 1,))
        raw = np.frombuffer(cur.fetchone()[0], np.uint8)
        return _decode_rows(raw, self.precision, self.dim)[0]

    def get_batch(self, keys: Sequence[Key]) -> np.ndarray:
        if self.layout != "global":
            raw = np.stack([np.frombuffer(self.conn.execute(
                f"SELECT b FROM ev_{t + 1} WHERE rowid = ?",
                (r + 1,)).fetchone()[0], np.uint8) for t, r in keys])
            return _decode_rows(raw, self.precision, self.dim)
        rowids = [self._rowid(t, r) for t, r in keys]
        qmarks = ",".join("?" * len(rowids))
        cur = self.conn.execute(
            f"SELECT rowid, b FROM tab1 WHERE rowid IN ({qmarks})", rowids)
        by_id = {rid: blob for rid, blob in cur.fetchall()}
        raw = np.stack([np.frombuffer(by_id[rid], np.uint8) for rid in rowids])
        return _decode_rows(raw, self.precision, self.dim)

    def close(self):
        self.conn.close()


class LogKVStore:
    """Write-optimized persistent KV store — the RocksDB-class backend
    (emb_storage/storage_rocksdb.py:27-123: key per (table, row) -> raw row
    bytes, bulk load at :68).  Implemented as a native log-structured store
    (evstore_core.cpp esv_kv_*): append-only fixed-record log + in-RAM
    hash index rebuilt by one sequential scan on open; point reads via
    pread sorted by offset; updates append (LSM-style) and compact()
    reclaims superseded space.  Unlike the read-only file/mmap backends
    this supports WRITES, so trained rows can be persisted back."""

    def __init__(self, db_path: str, table_sizes: Sequence[int], dim: int,
                 precision: int = 32, layout: str = "global"):
        """layout="global": one log keyed by (table<<40)|row (reference
        storage_rocksdb.py "tableId-rowId" single-DB scheme);
        layout="per_table": one log file per EV table keyed by row
        (storage_rocksdb_26_tabs.py:1 — the 26-tab layout variant)."""
        import ctypes
        from evstore_tpu.native import get_lib
        lib = get_lib()
        if not hasattr(lib, "_kv_bound"):
            lib.esv_kv_open.restype = ctypes.c_void_p
            lib.esv_kv_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.esv_kv_put_batch.restype = ctypes.c_int
            lib.esv_kv_put_batch.argtypes = [
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
                ctypes.c_long]
            lib.esv_kv_get_batch.restype = ctypes.c_long
            lib.esv_kv_get_batch.argtypes = lib.esv_kv_put_batch.argtypes
            lib.esv_kv_count.restype = ctypes.c_long
            lib.esv_kv_count.argtypes = [ctypes.c_void_p]
            lib.esv_kv_compact.restype = ctypes.c_long
            lib.esv_kv_compact.argtypes = [ctypes.c_void_p]
            lib.esv_kv_close.argtypes = [ctypes.c_void_p]
            lib._kv_bound = True
        self._lib = lib
        self.dim = dim
        self.precision = precision
        self.nb = row_nbytes(precision, dim)
        self.table_sizes = list(table_sizes)
        self.layout = layout
        if layout == "per_table":
            self._h = None
            self._hs = []
            for t in range(len(self.table_sizes)):
                h = lib.esv_kv_open(f"{db_path}.t{t}".encode(), self.nb)
                if not h:
                    raise OSError(f"esv_kv_open({db_path}.t{t}) failed")
                self._hs.append(h)
        elif layout == "global":
            self._hs = None
            self._h = lib.esv_kv_open(db_path.encode(), self.nb)
            if not self._h:
                raise OSError(f"esv_kv_open({db_path}) failed")
        else:
            raise ValueError(f"unknown LogKV layout {layout!r}")

    @staticmethod
    def _keys(tables: np.ndarray, rows: np.ndarray) -> np.ndarray:
        return ((tables.astype(np.uint64) << np.uint64(40))
                | rows.astype(np.uint64))

    def put_rows(self, table: int, rows: np.ndarray, values: np.ndarray):
        """values fp32 [K, dim]; encoded at the store precision."""
        enc = encode_rows(np.asarray(values, np.float32), self.precision)
        if self.layout == "per_table":
            h = self._hs[table]
            keys = np.asarray(rows, np.int64).astype(np.uint64)
        else:
            h = self._h
            keys = self._keys(np.full(len(rows), table, np.int64),
                              np.asarray(rows, np.int64))
        rc = self._lib.esv_kv_put_batch(
            h, np.ascontiguousarray(keys),
            np.ascontiguousarray(enc).view(np.uint8).reshape(-1), len(rows))
        if rc != 0:
            raise OSError("esv_kv_put_batch failed")

    def create_and_load(self, bin_dir: str, table_sizes: Sequence[int],
                        chunk: int = 65536):
        """Bulk load from per-table .bin EV files (storage_rocksdb.load:68),
        streamed in chunks."""
        for t, n in enumerate(table_sizes):
            p = os.path.join(bin_dir, f"ev-table-{t + 1}.bin")
            mm = np.memmap(p, np.uint8, mode="r").reshape(n, self.nb)
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                if self.layout == "per_table":
                    h = self._hs[t]
                    keys = np.arange(s, e, dtype=np.uint64)
                else:
                    h = self._h
                    keys = self._keys(np.full(e - s, t, np.int64),
                                      np.arange(s, e, dtype=np.int64))
                rc = self._lib.esv_kv_put_batch(
                    h, np.ascontiguousarray(keys),
                    np.ascontiguousarray(mm[s:e]).reshape(-1), e - s)
                if rc != 0:
                    raise OSError("esv_kv_put_batch failed")
        return self

    def get(self, table: int, row: int) -> np.ndarray:
        return self.get_batch([(table, row)])[0]

    def get_batch(self, keys: Sequence[Key]) -> np.ndarray:
        ks = np.asarray(keys, np.int64).reshape(-1, 2)
        out = np.empty((len(ks), self.nb), np.uint8)
        if self.layout == "per_table":
            for t in np.unique(ks[:, 0]):
                sel = np.nonzero(ks[:, 0] == t)[0]
                sub = np.empty((len(sel), self.nb), np.uint8)
                self._lib.esv_kv_get_batch(
                    self._hs[int(t)],
                    np.ascontiguousarray(ks[sel, 1].astype(np.uint64)),
                    sub.reshape(-1), len(sel))
                out[sel] = sub
        else:
            packed = self._keys(ks[:, 0], ks[:, 1])
            self._lib.esv_kv_get_batch(self._h, np.ascontiguousarray(packed),
                                       out.reshape(-1), len(ks))
        return _decode_rows(out, self.precision, self.dim)

    def _handles(self):
        return self._hs if self.layout == "per_table" else [self._h]

    def count(self) -> int:
        return sum(int(self._lib.esv_kv_count(h)) for h in self._handles())

    def compact(self) -> int:
        total = 0
        for h in self._handles():
            r = int(self._lib.esv_kv_compact(h))
            if r < 0:
                raise OSError("esv_kv_compact failed")
            total += r
        return total

    def close(self):
        for h in (self._handles() or []):
            if h:
                self._lib.esv_kv_close(h)
        self._h, self._hs = None, None


class StorageManager:
    """Facade over the backends (emb_storage/storage_manager.py): backend
    selection, bulk load, cache-bypass request path, teardown."""

    BACKENDS = ("dummy", "file", "mmap", "sqlite", "logkv", "native")

    def __init__(self, backend: str = "dummy", precision: int = 32,
                 dim: int = 36, layout: str = "global"):
        """layout applies to the DB backends (sqlite/logkv): "global" = one
        table/log with a global key scheme; "per_table" = one DB table / log
        file per EV table (the reference's *_26_tabs.py layout variants)."""
        if backend not in self.BACKENDS:
            raise ValueError(f"unknown storage backend {backend!r}; "
                             f"one of {self.BACKENDS}")
        if layout not in ("global", "per_table"):
            raise ValueError(f"unknown storage layout {layout!r}")
        self.backend = backend
        self.precision = precision
        self.dim = dim
        self.layout = layout
        self.store = None

    def load(self, *, tables: Optional[Sequence[np.ndarray]] = None,
             bin_dir: Optional[str] = None,
             table_sizes: Optional[Sequence[int]] = None,
             db_path: Optional[str] = None):
        """Bulk load (storage_manager.load_ev_table_into_emb_stor:141-167)."""
        if self.backend == "dummy":
            s = DummyStore(self.precision, self.dim)
            if tables is not None:
                s.load_arrays(tables)
            else:
                s.load(bin_dir, table_sizes, self.dim)
        elif self.backend == "file":
            s = FileStore(bin_dir, table_sizes, self.dim, self.precision)
        elif self.backend == "mmap":
            s = MmapStore(bin_dir, table_sizes, self.dim, self.precision)
        elif self.backend == "sqlite":
            s = SqliteStore(db_path or os.path.join(bin_dir, "ev-table-all.db"),
                            table_sizes, self.dim, self.precision,
                            layout=self.layout)
            s.create_and_load(bin_dir, table_sizes)
        elif self.backend == "logkv":
            s = LogKVStore(db_path or os.path.join(bin_dir, "ev-table-all.log"),
                           table_sizes, self.dim, self.precision,
                           layout=self.layout)
            if s.count() == 0:     # fresh store: bulk load; else reopen as-is
                s.create_and_load(bin_dir, table_sizes)
        else:
            raise ValueError(f"backend {self.backend} requires the native "
                             "engine (evstore_tpu.native)")
        self.store = s
        return self

    def get(self, table: int, row: int) -> np.ndarray:
        return self.store.get(table, row)

    def get_batch(self, keys: Sequence[Key]) -> np.ndarray:
        return self.store.get_batch(keys)

    def request_group(self, group_row_ids: Sequence[int]) -> np.ndarray:
        """Cache-bypass path (storage_manager.request_to_emb_storage:125-139):
        fetch one row per table for a request group."""
        return self.get_batch([(t, int(r)) for t, r in enumerate(group_row_ids)])

    def close(self):
        if self.store is not None:
            self.store.close()
            self.store = None
