"""EVStore inference driver: tiered embedding lookup feeding the TPU model.

Reference: dlrm_s_pytorch_C1{,_C2,_C2_C3}.py — inference-only drivers that
swap apply_emb for the tiered lookup (apply_emb_evstore,
dlrm_s_pytorch_C1.py:227), with warm-up pass (:2226-2242), init-overhead /
ev-lookup-only mode (:2205-2222), per-request latency CDF (:299-330) and
perfect-hit accounting (:136,2272).

TPU-first structure: the cache engine runs on the host and produces the
[B, T, D] embedding rows; the jitted model consumes them via the emb_rows
injection point of dlrm_forward.  Host lookup for batch k+1 overlaps device
compute for batch k (the device call is async until blocked on).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from evstore_tpu.cache.storage import StorageManager
from evstore_tpu.cache.tiers import (AltKeyResolver, TieredCache,
                                     make_cache_from_policy)
from evstore_tpu.config import CacheConfig, DLRMConfig
from evstore_tpu.models.dlrm import DLRMParams, dlrm_forward
from evstore_tpu.train.metrics import binary_metrics
from evstore_tpu.utils.trace import LatencyRecorder, WorkloadTracer


@dataclasses.dataclass
class InferenceResult:
    metrics: Dict[str, float]
    cache_stats: dict
    latency: dict
    elapsed_s: float
    requests: int


def build_cache(ccfg: CacheConfig, cfg: DLRMConfig,
                storage: StorageManager,
                altkey_resolver: Optional[AltKeyResolver] = None,
                use_native: bool = False,
                use_device_cache: bool = False,
                mesh=None):
    if (ccfg.policy in ("lfu", "lru") and ccfg.n_caching_layers == 1
            and not use_native and not use_device_cache):
        # pure-Python baselines (reference cache_algo/LFU.py, LRU.py);
        # with use_native the engine runs the same policies at C++ speed
        # (native/__init__.py _POLICY ≙ dlrm_s_pytorch_C1.py:1295-1303)
        return make_cache_from_policy(ccfg.policy, ccfg.total_size,
                                      cfg.num_tables, storage,
                                      cfg.embedding_dim)
    if use_device_cache:
        # C1 rows resident in TPU HBM; only misses cross PCIe.  With a mesh
        # the slot array is sharded over it (capacity scales with chips).
        from evstore_tpu.cache.device_cache import (NativeDeviceC1Cache,
                                                    ShardedDeviceC1Cache)
        from evstore_tpu.cache.storage import DummyStore
        if mesh is not None:
            dc = ShardedDeviceC1Cache(ccfg, cfg.num_tables,
                                      cfg.embedding_dim, mesh)
        else:
            dc = NativeDeviceC1Cache(ccfg, cfg.num_tables, cfg.embedding_dim)
        if isinstance(storage.store, DummyStore):
            dc.load_tables(storage.store.tables)
        else:
            raise ValueError("device cache file mode: use "
                             "NativeDeviceC1Cache.open_table_files directly")
        if altkey_resolver is not None and ccfg.n_caching_layers >= 3:
            dc.load_altkeys([np.asarray(t, "uint32")
                             for t in altkey_resolver.tables])
        return dc
    if use_native:
        from evstore_tpu.cache.storage import DummyStore
        from evstore_tpu.native import NativeTieredCache
        nc = NativeTieredCache(ccfg, cfg.num_tables, cfg.embedding_dim)
        if isinstance(storage.store, DummyStore):
            nc.load_tables(storage.store.tables)
        else:
            raise ValueError("native engine file mode: use "
                             "NativeTieredCache.open_table_files directly")
        if altkey_resolver is not None and ccfg.n_caching_layers >= 3:
            nc.load_altkeys([t.astype("uint32")
                             for t in altkey_resolver.tables])
        return nc
    return TieredCache(ccfg, storage, cfg.num_tables, cfg.embedding_dim,
                       altkey_resolver)


def run_inference(params: DLRMParams, cfg: DLRMConfig, ccfg: CacheConfig,
                  batches: Iterable, storage: StorageManager,
                  altkey_resolver: Optional[AltKeyResolver] = None,
                  warmup_batches: Optional[Iterable] = None,
                  ev_lookup_only: bool = False,
                  trace_dir: Optional[str] = None,
                  cdf_path: Optional[str] = None,
                  use_native: bool = False,
                  use_device_cache: bool = False,
                  pipeline_depth: int = 0,
                  mesh=None,
                  log_fn=print) -> InferenceResult:
    """Run tiered-cache inference over `batches` of (dense, idx, labels).

    pipeline_depth > 0 runs the host tier lookup on a prefetch thread so the
    assign/fetch for batch k+1 overlaps the device compute of batch k (the
    ctypes engine call releases the GIL); policy order is preserved (one
    worker, sequential batches).  mesh (with use_device_cache) shards the
    HBM slot array over the mesh's devices."""
    cache = build_cache(ccfg, cfg, storage, altkey_resolver, use_native,
                        use_device_cache, mesh=mesh)
    import jax.numpy as jnp

    @jax.jit
    def fwd(p, dense_x, rows, idx):
        return jax.nn.sigmoid(dlrm_forward(p, dense_x, idx, cfg,
                                           emb_rows=rows))

    tracer = WorkloadTracer(trace_dir, cfg.num_tables) if trace_dir else None
    lat = LatencyRecorder()

    # warm-up pass: populate tiers without scoring (reference :2226-2242)
    if warmup_batches is not None:
        n = 0
        for _, idx, _ in warmup_batches:
            cache.request_batch(np.asarray(idx))
            n += idx.shape[0]
        log_fn(f"warm-up done: {n} requests; stats={cache.stats()}")

    # device-cache engines can hand back rows as device arrays — no numpy
    # round-trip, and the jitted forward chains asynchronously
    device_rows = hasattr(cache, "lookup_batch")

    def _lookup(idx):
        if device_rows:
            return cache.lookup_batch(idx)         # stays in HBM
        return jnp.asarray(cache.request_batch(idx))

    if pipeline_depth > 0:
        from evstore_tpu.data.loader import prefetch
        stream = prefetch(
            batches, depth=pipeline_depth, to_device=False,
            transform=lambda b: (b[0], np.asarray(b[1]), b[2],
                                 _lookup(np.asarray(b[1]))))
    else:
        stream = ((d, np.asarray(i), y, None) for d, i, y in batches)

    scores, labels = [], []
    # per-request latency method (VERDICT r2 item 9): at bs=1 each request
    # is timed individually and the device result is fenced with a real
    # device->host transfer inside the timed region (block_until_ready can
    # return at enqueue-ack — see bench.py:13-27); at bs>1 the recorded
    # figure is the batch time divided across its requests, a smoothed
    # approximation.  The CDF artifact records which method produced it.
    true_per_request = None
    t_start = time.perf_counter()
    n_req = 0
    for dense_x, idx, y, pre_rows in stream:
        if true_per_request is None:
            true_per_request = idx.shape[0] == 1 and pre_rows is None
        t0 = time.perf_counter()
        rows = pre_rows if pre_rows is not None else _lookup(idx)
        if not ev_lookup_only:
            s = fwd(params, jnp.asarray(dense_x), rows, jnp.asarray(idx))
            if true_per_request:
                s = np.asarray(s)          # real transfer = honest fence
            scores.append(s)
            labels.append(np.asarray(y))
        elif true_per_request and device_rows:
            np.asarray(rows)               # fence the device lookup too
        dt = time.perf_counter() - t0
        if tracer is not None:
            for b in range(idx.shape[0]):
                tracer.record(idx[b])
        for _ in range(idx.shape[0]):
            lat.record(dt / idx.shape[0])
        n_req += idx.shape[0]
    elapsed = time.perf_counter() - t_start

    if tracer is not None:
        tracer.close()
    if cdf_path is not None:
        lat.write_cdf(cdf_path,
                      method=("true-per-request (bs=1, fenced transfer)"
                              if true_per_request
                              else "batch-time/B approximation"))

    metrics = (binary_metrics(np.concatenate([np.asarray(s) for s in scores]),
                              np.concatenate(labels))
               if scores else {})
    res = InferenceResult(metrics=metrics, cache_stats=cache.stats(),
                          latency=lat.summary(), elapsed_s=elapsed,
                          requests=n_req)
    log_fn(f"inference: {n_req} requests in {elapsed:.2f}s "
           f"({n_req / max(elapsed, 1e-9):.0f} req/s); "
           f"perfect hits = {res.cache_stats.get('perfect_hits')}")
    return res
