"""Criteo preprocessing and datasets.

Reference semantics (data_utils.py + dlrm_data_pytorch.py):

- `preprocess_criteo`: split the raw TSV (`train.txt` for Kaggle; `day_*`
  for Terabyte) into days (getCriteoAdData:876), build per-table
  categorical->contiguous-id dicts across all days (convertDicts,
  processCriteoAdData:112), clamp negative/missing dense to 0, optional
  label-balanced subsampling (sub_sample_rate, :947-966), per-day .npz plus
  a combined processed .npz with per-table counts (concatCriteoAdData:172).
- `CriteoDataset`: day-based split — train = all days but the last; the last
  day is halved into test/val (dlrm_data_pytorch.py:240-284); dense features
  are served as log1p(x) fp32 (:342,:365); categorical ids mod
  max_ind_range (:314-321); `reduceDatasetSize` keeps a leading fraction
  (:389).
- `numpy_to_binary` / `CriteoBinDataset`: pack processed arrays as int32
  records [label, 13 dense, 26 sparse] for fast mmap'd batched reads
  (script/data_loader_terabyte.py:197-368).

Everything is numpy; batches come out shaped for the jitted step:
(dense [B,13] fp32 log1p, idx [B,26] int32, y [B] fp32).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

Batch = Tuple[np.ndarray, np.ndarray, np.ndarray]

NUM_DENSE = 13
NUM_SPARSE = 26


def _parse_tsv(path: str, use_native: bool = True
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a Criteo TSV chunk: label \\t 13 ints \\t 26 hex cats.
    Missing dense -> 0; negative dense -> 0 (data_utils.py:1130-1144).
    Uses the native parser (the cython/ equivalent) when the engine .so is
    available."""
    if use_native:
        try:
            from evstore_tpu.native import parse_criteo_tsv_native
            return parse_criteo_tsv_native(path)
        except Exception:
            pass   # fall back to the pure-Python parser
    labels, dense, cats = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 1 + NUM_DENSE + NUM_SPARSE:
                continue
            labels.append(int(parts[0]))
            d = np.zeros(NUM_DENSE, np.int64)
            for i, v in enumerate(parts[1:1 + NUM_DENSE]):
                if v:
                    x = int(v)
                    d[i] = x if x > 0 else 0
            dense.append(d)
            c = np.zeros(NUM_SPARSE, np.int64)
            for i, v in enumerate(parts[1 + NUM_DENSE:]):
                # hex string; empty -> 0 (data_utils.py:1147-1153)
                c[i] = int(v, 16) if v else 0
            cats.append(c)
    return (np.asarray(labels, np.int32), np.stack(dense),
            np.stack(cats))


def preprocess_criteo(txt_path: str, out_dir: str, days: int = 7,
                      sub_sample_rate: float = 0.0, seed: int = 123,
                      dataset_name: str = "kaggle") -> str:
    """Split into days, build categorical dicts, write processed npz.
    Returns the path of the combined npz."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    y, Xi, Xc = _parse_tsv(txt_path)
    n = len(y)
    per_day = n // days

    # build per-table dicts across ALL days (convertDicts semantics:
    # first-seen order assigns contiguous ids)
    dicts: List[Dict[int, int]] = [dict() for _ in range(NUM_SPARSE)]
    Xc_ids = np.empty_like(Xc, dtype=np.int32)
    for t in range(NUM_SPARSE):
        d = dicts[t]
        col = Xc[:, t]
        out = Xc_ids[:, t]
        for i, raw in enumerate(col):
            rid = d.get(raw)
            if rid is None:
                rid = len(d)
                d[raw] = rid
            out[i] = rid
    counts = np.asarray([len(d) for d in dicts], np.int32)

    # optional balanced subsample: drop negatives with prob (1 - rate)
    # (data_utils.py:947-966 keeps rand < rate OR label == 1)
    keep = np.ones(n, bool)
    if sub_sample_rate > 0.0:
        keep = (rng.random(n) < sub_sample_rate) | (y == 1)

    day_paths = []
    for d in range(days):
        lo, hi = d * per_day, (d + 1) * per_day if d < days - 1 else n
        m = keep[lo:hi]
        p = os.path.join(out_dir, f"{dataset_name}_day_{d}.npz")
        np.savez_compressed(p, X_int=Xi[lo:hi][m], X_cat=Xc_ids[lo:hi][m],
                            y=y[lo:hi][m])
        day_paths.append(p)

    combined = os.path.join(out_dir, f"{dataset_name}_processed.npz")
    np.savez_compressed(
        combined,
        X_int=Xi[keep], X_cat=Xc_ids[keep], y=y[keep], counts=counts,
        day_offsets=np.asarray(
            [0] + list(np.cumsum([np.load(p)["y"].shape[0]
                                  for p in day_paths])), np.int64))
    return combined


@dataclasses.dataclass
class CriteoDataset:
    """Day-split view over a processed npz (dlrm_data_pytorch.CriteoDataset)."""

    X_int: np.ndarray          # [n, 13] int
    X_cat: np.ndarray          # [n, 26] int32
    y: np.ndarray              # [n]
    counts: np.ndarray         # [26] rows per table
    day_offsets: np.ndarray
    max_ind_range: int = 0

    @classmethod
    def load(cls, npz_path: str, max_ind_range: int = 0) -> "CriteoDataset":
        z = np.load(npz_path)
        return cls(z["X_int"], z["X_cat"], z["y"], z["counts"],
                   z["day_offsets"], max_ind_range)

    @classmethod
    def from_stream(cls, meta_path: str, max_ind_range: int = 0
                    ) -> "CriteoDataset":
        """Memmap-backed view over a preprocess_criteo_streaming output:
        the packed .bin is mapped, X_int/X_cat/y are zero-copy views, and
        batches() only materializes one batch at a time — terabyte datasets
        train with bounded RSS (≙ the reference's per-day mmap npz mode,
        dlrm_data_pytorch.py memory_map)."""
        z = np.load(meta_path)
        bin_path = str(z["bin_path"])
        if not os.path.isabs(bin_path) and not os.path.exists(bin_path):
            bin_path = os.path.join(os.path.dirname(meta_path),
                                    os.path.basename(bin_path))
        mm = np.memmap(bin_path, dtype=np.int32, mode="r")
        assert mm.shape[0] % RECORD_INTS == 0
        rec = mm.reshape(-1, RECORD_INTS)
        return cls(rec[:, 1:1 + NUM_DENSE], rec[:, 1 + NUM_DENSE:],
                   rec[:, 0], z["counts"], z["day_offsets"], max_ind_range)

    @property
    def table_sizes(self) -> Tuple[int, ...]:
        if self.max_ind_range > 0:
            return tuple(int(min(c, self.max_ind_range)) for c in self.counts)
        return tuple(int(c) for c in self.counts)

    def _slice(self, lo: int, hi: int):
        return self.X_int[lo:hi], self.X_cat[lo:hi], self.y[lo:hi]

    def splits(self):
        """train = days 0..D-2; last day halved into test/val
        (dlrm_data_pytorch.py:240-284)."""
        last_lo = int(self.day_offsets[-2])
        n = len(self.y)
        mid = last_lo + (n - last_lo) // 2
        return ((0, last_lo), (last_lo, mid), (mid, n))  # train, test, val

    def batches(self, split: str = "train", batch_size: int = 128,
                shuffle: bool = False, seed: int = 0,
                fraction: float = 1.0, drop_last: bool = False
                ) -> Iterator[Batch]:
        """fraction keeps a leading subset (reduceDatasetSize:389)."""
        (tr, te, va) = self.splits()
        lo, hi = {"train": tr, "test": te, "val": va}[split]
        n = hi - lo
        if fraction < 1.0:
            n = max(1, int(n * fraction))
        order = np.arange(lo, lo + n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for s in range(0, n, batch_size):
            sel = order[s:s + batch_size]
            if drop_last and len(sel) < batch_size:
                break
            xi, xc, yy = self.X_int[sel], self.X_cat[sel], self.y[sel]
            if self.max_ind_range > 0:
                xc = xc % self.max_ind_range
            dense = np.log1p(xi.astype(np.float32))  # log(x+1) (:342)
            yield dense, xc.astype(np.int32), yy.astype(np.float32)

    def num_batches(self, split: str, batch_size: int,
                    fraction: float = 1.0) -> int:
        (tr, te, va) = self.splits()
        lo, hi = {"train": tr, "test": te, "val": va}[split]
        n = hi - lo
        if fraction < 1.0:
            n = max(1, int(n * fraction))
        return -(-n // batch_size)


# --------------------------------------- streaming (terabyte) preprocessing

class _StreamingDicts:
    """Per-table raw->contiguous-id dictionaries built incrementally from
    sorted chunk uniques, ≙ convertDicts merged day by day
    (data_utils.py:112 processCriteoAdData; ids are assigned in
    sorted-within-batch, batch-order across batches — the reference's
    per-day np.unique merge, here per chunk).  Stored as parallel sorted
    numpy arrays (12 B/key) instead of Python dicts (~100 B/key), so
    terabyte-scale vocabularies fit where the reference needs a big-RAM
    node."""

    def __init__(self, n_tables: int = NUM_SPARSE):
        self.keys = [np.empty(0, np.int64) for _ in range(n_tables)]   # sorted
        self.ids = [np.empty(0, np.int32) for _ in range(n_tables)]    # aligned

    def absorb(self, t: int, col: np.ndarray) -> None:
        u = np.unique(col)
        pos = np.searchsorted(self.keys[t], u)
        found = np.zeros(len(u), bool)
        in_range = pos < len(self.keys[t])
        found[in_range] = self.keys[t][pos[in_range]] == u[in_range]
        new = u[~found]
        if len(new) == 0:
            return
        start = len(self.keys[t])
        new_ids = np.arange(start, start + len(new), dtype=np.int32)
        ins = np.searchsorted(self.keys[t], new)
        self.keys[t] = np.insert(self.keys[t], ins, new)
        self.ids[t] = np.insert(self.ids[t], ins, new_ids)

    def map(self, t: int, col: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.keys[t], col)
        return self.ids[t][pos]

    @property
    def counts(self) -> np.ndarray:
        return np.asarray([len(k) for k in self.keys], np.int32)


def _chunks_of(path: str, chunk_rows: int):
    """Yield (labels, dense, cats) chunks, native parser when available."""
    try:
        from evstore_tpu.native import parse_criteo_tsv_chunks
        yield from parse_criteo_tsv_chunks(path, chunk_rows)
        return
    except FileNotFoundError:
        raise
    except Exception:
        pass
    # pure-Python fallback: line-buffered chunking
    labels, dense, cats = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 1 + NUM_DENSE + NUM_SPARSE:
                continue
            labels.append(int(parts[0]))
            d = np.zeros(NUM_DENSE, np.int64)
            for i, v in enumerate(parts[1:1 + NUM_DENSE]):
                if v:
                    x = int(v)
                    d[i] = x if x > 0 else 0
            dense.append(d)
            c = np.zeros(NUM_SPARSE, np.int64)
            for i, v in enumerate(parts[1 + NUM_DENSE:]):
                c[i] = int(v, 16) if v else 0
            cats.append(c)
            if len(labels) == chunk_rows:
                yield (np.asarray(labels, np.int32), np.stack(dense),
                       np.stack(cats))
                labels, dense, cats = [], [], []
    if labels:
        yield (np.asarray(labels, np.int32), np.stack(dense), np.stack(cats))


# ------------------------------------------- parallel preprocessing workers

def _scan_chunk_offsets(path: str, chunk_rows: int):
    """Newline scan (no parsing) -> [(byte_lo, byte_hi, n_lines)] with
    chunk_rows lines per task.  Block reads at memchr speed; the offsets
    are exact line boundaries, so disjoint ranges partition the file."""
    size = os.path.getsize(path)
    tasks = []
    chunk_lo, lines_in_chunk = 0, 0
    off = 0
    last_byte = b""
    with open(path, "rb") as f:
        while True:
            buf = f.read(1 << 24)
            if not buf:
                break
            last_byte = buf[-1:]
            start = 0
            while True:
                i = buf.find(b"\n", start)
                if i < 0:
                    break
                lines_in_chunk += 1
                if lines_in_chunk == chunk_rows:
                    tasks.append((chunk_lo, off + i + 1, chunk_rows))
                    chunk_lo = off + i + 1
                    lines_in_chunk = 0
                start = i + 1
            off += len(buf)
    if chunk_lo < size:
        tail_lines = lines_in_chunk + (0 if last_byte == b"\n" else 1)
        tasks.append((chunk_lo, size, tail_lines))
    return tasks


def _parse_range(path: str, lo: int, hi: int, max_rows: int):
    """Parse lines starting in [lo, hi) — native when available, else the
    pure-Python fallback with identical semantics."""
    try:
        from evstore_tpu.native import parse_criteo_tsv_range
        return parse_criteo_tsv_range(path, lo, hi, max_rows)
    except FileNotFoundError:
        raise
    except Exception:
        pass
    with open(path, "rb") as f:
        f.seek(lo)
        text = f.read(hi - lo).decode("utf-8", errors="replace")
    labels, dense, cats = [], [], []
    for line in text.splitlines():
        parts = line.split("\t")
        if len(parts) != 1 + NUM_DENSE + NUM_SPARSE:
            continue
        try:
            lab = int(parts[0])
            d = np.zeros(NUM_DENSE, np.int64)
            for i, v in enumerate(parts[1:1 + NUM_DENSE]):
                if v:
                    x = int(v)
                    d[i] = x if x > 0 else 0
            c = np.zeros(NUM_SPARSE, np.int64)
            for i, v in enumerate(parts[1 + NUM_DENSE:]):
                c[i] = int(v, 16) if v else 0
        except ValueError:
            continue
        labels.append(lab)
        dense.append(d)
        cats.append(c)
    if not labels:
        return (np.empty(0, np.int32), np.empty((0, NUM_DENSE), np.int64),
                np.empty((0, NUM_SPARSE), np.int64))
    return (np.asarray(labels, np.int32), np.stack(dense), np.stack(cats))


def _pp_pass1_worker(task):
    """Parse a byte range, return (n_rows, per-table sorted uniques) —
    the expensive parse+unique runs in the worker; the parent only merges
    the (small) unique arrays, preserving sequential id-assignment order."""
    path, lo, hi, n_lines, _fi = task
    labels, _, cats = _parse_range(path, lo, hi, n_lines)
    return len(labels), [np.unique(cats[:, t]) for t in range(NUM_SPARSE)]


# Fork-shared dictionaries for pass-2 workers: set by the parent right
# before creating the pass-2 pool, inherited copy-on-write by fork (the
# sorted key arrays are never written in workers, so no copies happen).
_PP_DICTS = None


def _pp_pass2_worker(task):
    """Parse a byte range and, when the fork-shared dictionaries are
    present, MAP the categorical columns worker-side (the expensive
    26-column searchsorted) — the parent then only subsamples and writes,
    keeping it off the critical path."""
    path, lo, hi, n_lines, _fi = task
    labels, dense, cats = _parse_range(path, lo, hi, n_lines)
    if _PP_DICTS is None:
        return labels, dense, cats, False
    mapped = np.empty(cats.shape, np.int32)
    for t in range(NUM_SPARSE):
        mapped[:, t] = _PP_DICTS.map(t, cats[:, t])
    return labels, dense, mapped, True


def preprocess_criteo_streaming(inputs, out_dir: str, days: int = 7,
                                sub_sample_rate: float = 0.0, seed: int = 123,
                                dataset_name: str = "kaggle",
                                chunk_rows: int = 1_000_000,
                                num_workers: int = 0) -> str:
    """Terabyte-scale preprocessing with BOUNDED memory.

    ≙ data_utils.py getCriteoAdData(:876) + processCriteoAdData(:112) +
    concatCriteoAdData(:172), re-designed for streaming: two passes over the
    input in `chunk_rows` slices — pass 1 builds the per-table dictionaries
    (sorted-unique merge, see _StreamingDicts), pass 2 maps ids, applies the
    label-balanced subsample (keep if rand < rate or label == 1,
    data_utils.py:947-966), and APPENDS packed int32 records
    [label, 13 dense, 26 sparse] straight to the combined .bin — no
    full-dataset array ever exists in RAM.  RSS is O(chunk + dictionaries).

    num_workers > 1 parallelizes both passes (≙ the reference's
    dataset_multiprocessing option, data_utils.py:876): a newline scan
    splits each file into chunk_rows-line byte ranges; a process pool
    parses them (pass 1 additionally uniques worker-side) while the parent
    absorbs/merges dictionaries and writes records IN TASK ORDER — so id
    assignment, the subsample rng stream and the output bytes are identical
    to the sequential path on well-formed input (golden-checked).  On input
    with malformed lines, chunk boundaries are line-based rather than
    parsed-row-based, which may permute dictionary ids; output is then
    deterministic per (seed, chunk_rows) but not byte-identical to
    num_workers=0.

    inputs: one TSV path (split into `days` row-slices, Kaggle style) or a
    list of per-day paths (Terabyte `day_*` style).  Returns the path of a
    meta .npz holding {bin_path, counts, day_offsets}; load with
    CriteoDataset.from_stream for memmap-backed day-split batches.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = [inputs] if isinstance(inputs, str) else list(inputs)
    dicts = _StreamingDicts()
    parallel = bool(num_workers and num_workers > 1)
    if parallel:
        import multiprocessing as mp
        ctx = mp.get_context("fork")
        tasks = [(p, lo, hi, nl, fi) for fi, p in enumerate(paths)
                 for lo, hi, nl in _scan_chunk_offsets(p, chunk_rows)]

    # pass 1: dictionaries + row count
    n_total = 0
    if parallel:
        with ctx.Pool(num_workers) as pool:
            # ordered imap: absorb order == sequential chunk order
            for n, uniqs in pool.imap(_pp_pass1_worker, tasks, chunksize=1):
                n_total += n
                for t in range(NUM_SPARSE):
                    dicts.absorb(t, uniqs[t])
    else:
        for p in paths:
            for labels, _, cats in _chunks_of(p, chunk_rows):
                n_total += len(labels)
                for t in range(NUM_SPARSE):
                    dicts.absorb(t, cats[:, t])
    if n_total == 0:
        raise ValueError(f"no parseable rows in {paths}")

    # day boundaries: per-file for multi-file input, row-sliced otherwise
    if len(paths) > 1:
        days = len(paths)
        per_day = None
    else:
        per_day = n_total // days

    bin_path = os.path.join(out_dir, f"{dataset_name}_stream.bin")
    rng = np.random.default_rng(seed)
    day_counts = np.zeros(days, np.int64)
    row = 0

    if parallel:
        def chunk_source():
            global _PP_DICTS
            _PP_DICTS = dicts          # fork-shared with pass-2 workers
            try:
                with ctx.Pool(num_workers) as pool:
                    for task, parsed in zip(tasks,
                                            pool.imap(_pp_pass2_worker,
                                                      tasks, chunksize=1)):
                        yield task[4], parsed   # (file idx, chunk tuple)
            finally:
                _PP_DICTS = None
    else:
        def chunk_source():
            for fi, p in enumerate(paths):
                for lab, den, cat in _chunks_of(p, chunk_rows):
                    yield fi, (lab, den, cat, False)

    with open(bin_path, "wb") as out:
        for fi, (labels, dense, cats, pre_mapped) in chunk_source():
            n = len(labels)
            keep = np.ones(n, bool)
            if sub_sample_rate > 0.0:
                keep = (rng.random(n) < sub_sample_rate) | (labels == 1)
            rec = np.empty((n, RECORD_INTS), np.int32)
            rec[:, 0] = labels
            rec[:, 1:1 + NUM_DENSE] = dense
            if pre_mapped:
                rec[:, 1 + NUM_DENSE:] = cats
            else:
                for t in range(NUM_SPARSE):
                    rec[:, 1 + NUM_DENSE + t] = dicts.map(t, cats[:, t])
            if per_day is None:
                day = fi
                rec[keep].tofile(out)
                day_counts[day] += int(keep.sum())
            else:
                # row-sliced days may straddle a chunk
                d_lo = min(row // per_day, days - 1)
                d_hi = min((row + n - 1) // per_day, days - 1)
                for d in range(d_lo, d_hi + 1):
                    lo = max(d * per_day, row) - row
                    hi = (n if d == days - 1
                          else min((d + 1) * per_day, row + n) - row)
                    m = keep[lo:hi]
                    rec[lo:hi][m].tofile(out)
                    day_counts[d] += int(m.sum())
            row += n

    meta_path = os.path.join(out_dir, f"{dataset_name}_stream_meta.npz")
    np.savez(meta_path, bin_path=np.asarray(bin_path),
             counts=dicts.counts,
             day_offsets=np.concatenate([[0], np.cumsum(day_counts)]))
    return meta_path


# ------------------------------------------------ binary (terabyte) format

RECORD_INTS = 1 + NUM_DENSE + NUM_SPARSE   # 40 int32 per sample


def numpy_to_binary(npz_path: str, out_bin: str) -> str:
    """Pack processed arrays as int32 records [label, 13 dense, 26 sparse]
    (script/data_loader_terabyte.py numpy_to_binary:243)."""
    z = np.load(npz_path)
    n = z["y"].shape[0]
    rec = np.empty((n, RECORD_INTS), np.int32)
    rec[:, 0] = z["y"]
    rec[:, 1:1 + NUM_DENSE] = z["X_int"]
    rec[:, 1 + NUM_DENSE:] = z["X_cat"]
    rec.tofile(out_bin)
    return out_bin


class CriteoBinDataset:
    """mmap'd batched reads over the packed binary
    (script/data_loader_terabyte.py CriteoBinDataset:197)."""

    def __init__(self, bin_path: str, batch_size: int = 2048,
                 max_ind_range: int = 0):
        self.batch_size = batch_size
        self.max_ind_range = max_ind_range
        self.mm = np.memmap(bin_path, dtype=np.int32, mode="r")
        assert self.mm.shape[0] % RECORD_INTS == 0
        self.n = self.mm.shape[0] // RECORD_INTS

    def __len__(self):
        return -(-self.n // self.batch_size)

    def __iter__(self) -> Iterator[Batch]:
        for s in range(0, self.n, self.batch_size):
            e = min(s + self.batch_size, self.n)
            rec = np.asarray(self.mm[s * RECORD_INTS:e * RECORD_INTS]
                             ).reshape(e - s, RECORD_INTS)
            y = rec[:, 0].astype(np.float32)
            dense = np.log1p(np.maximum(rec[:, 1:1 + NUM_DENSE], 0)
                             .astype(np.float32))
            xc = rec[:, 1 + NUM_DENSE:].astype(np.int32)
            if self.max_ind_range > 0:
                xc = xc % self.max_ind_range
            yield dense, xc, y

    def iter_raw(self) -> Iterator[np.ndarray]:
        """Raw packed [b, RECORD_INTS] int32 record batches — the
        host->device transfer then ships ONE buffer per step and the
        label/log1p/mod conversion runs on device (unpack_records_device),
        fused into the train step.  One transfer per step instead of three
        matters on high-latency links; the bytes are identical (the record
        is already the minimal 160 B/example int32 encoding)."""
        for s in range(0, self.n, self.batch_size):
            e = min(s + self.batch_size, self.n)
            yield np.asarray(self.mm[s * RECORD_INTS:e * RECORD_INTS]
                             ).reshape(e - s, RECORD_INTS)


def unpack_records_device(rec, max_ind_range: int = 0):
    """Device-side twin of CriteoBinDataset.__iter__'s conversion
    (data_loader_terabyte.py:225-231 semantics): rec [B, RECORD_INTS] i32
    -> (dense f32 log1p, idx i32, y f32).  Pure jnp, fuses into the step."""
    import jax.numpy as jnp
    y = rec[:, 0].astype(jnp.float32)
    dense = jnp.log1p(jnp.maximum(rec[:, 1:1 + NUM_DENSE], 0)
                      .astype(jnp.float32))
    xc = rec[:, 1 + NUM_DENSE:]
    if max_ind_range > 0:
        xc = xc % max_ind_range
    return dense, xc, y


def make_synthetic_criteo_txt(path: str, n: int = 1000, seed: int = 0,
                              vocab: int = 50) -> str:
    """Generate a tiny raw-format train.txt for tests (the reference uses
    --data-generation=random as its CPU fixture; we additionally exercise the
    real preprocessing path)."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for _ in range(n):
            label = int(rng.random() < 0.25)
            dense = [str(int(rng.integers(-2, 100))) if rng.random() > 0.1
                     else "" for _ in range(NUM_DENSE)]
            cats = [format(int(rng.integers(0, vocab)), "x")
                    if rng.random() > 0.05 else "" for _ in range(NUM_SPARSE)]
            f.write("\t".join([str(label)] + dense + cats) + "\n")
    return path
