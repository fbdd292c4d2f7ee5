"""Concurrent embedding-service throughput: req/s at 1/4/10 clients for
mode="lock" (the reference's contending-worker shape,
cache_manager.cpp:292-385) vs mode="batched" (round-4 aggregating
dispatcher).  bs=1 requests — the serving workload."""
import multiprocessing as mp
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from evstore_tpu.cache.service import EmbeddingClient, EmbeddingServer
from evstore_tpu.config import CacheConfig, kaggle_dlrm_config
from evstore_tpu.native import NativeTieredCache


def _client_proc(port, sizes, seed, stop_ev, count):
    c = EmbeddingClient("127.0.0.1", port, 26, 36)
    r = np.random.default_rng(seed)
    sz = np.asarray(sizes)
    while not stop_ev.is_set():
        u = r.random(26)
        idx = np.clip((((sz ** -0.1 - 1) * u + 1) ** (1 / -0.1) - 1),
                      0, sz - 1).astype(np.int64)
        c.request_batch(idx[None, :])
        with count.get_lock():
            count.value += 1
    c.sock.close()


def main():
    dim = 36
    base = kaggle_dlrm_config()
    sizes = [min(s, 200_000) for s in base.table_sizes]
    rng = np.random.default_rng(0)
    tables = [rng.uniform(-1, 1, (s, dim)).astype(np.float32) for s in sizes]
    ccfg = CacheConfig(policy="evlfu", n_caching_layers=1, total_size=64000,
                       main_precision=8)

    for mode in ("lock", "batched"):
        for n_clients in (1, 4, 10):
            eng = NativeTieredCache(ccfg, 26, dim).borrow_tables(tables)
            srv = EmbeddingServer(eng, dim, mode=mode).start()
            stop_ev = mp.Event()
            count = mp.Value("l", 0)
            procs = [mp.Process(target=_client_proc,
                                args=(srv.port, sizes, k, stop_ev, count))
                     for k in range(n_clients)]
            for pr in procs:
                pr.start()
            time.sleep(1.0)          # warm
            base_n = count.value
            t0 = time.perf_counter()
            time.sleep(4.0)
            n = count.value - base_n
            dt = time.perf_counter() - t0
            stop_ev.set()
            for pr in procs:
                pr.join(timeout=5)
                if pr.is_alive():
                    pr.terminate()
            srv.stop()
            eng.close()
            print(f"{mode:8s} clients={n_clients:2d}: {n/dt:9,.0f} req/s",
                  flush=True)


if __name__ == "__main__":
    main()
