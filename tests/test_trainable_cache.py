"""HBM-bounded training through the device cache tier (the BASELINE north
star's hard requirement: sparse updates write through the tier)."""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evstore_tpu.cache.trainable import TrainableDeviceCache
from evstore_tpu.config import CacheConfig, TrainConfig, tiny_dlrm_config
from evstore_tpu.data.synthetic import RandomDataConfig, learnable_batches
from evstore_tpu.models.dlrm import DLRMParams, init_dlrm
from evstore_tpu.train.train_loop import init_opt_state, make_train_step

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no g++ toolchain")


def _setup(capacity, n_batches=30, bs=16, seed=0):
    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=bs, learning_rate=0.2,
                       optimizer="rwsadagrad")
    ccfg = CacheConfig(policy="evlfu", total_size=capacity, main_precision=32)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    tables = [np.asarray(params.sparse[f"table_{t}"]["kind_plain"])
              for t in range(cfg.num_tables)]
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=bs,
                            num_batches=n_batches, seed=seed)
    return cfg, tcfg, ccfg, params, tables, dcfg


def test_cached_training_matches_full_table_when_no_eviction():
    """With capacity >= all distinct keys, cached training must be EXACTLY
    full-table rwsadagrad training: same per-step losses, same final tables,
    same dense params."""
    cfg, tcfg, ccfg, params, tables, dcfg = _setup(capacity=200)
    # full-table reference
    step_ref = jax.jit(make_train_step(cfg, tcfg))
    p_ref, o_ref = params, init_opt_state(params, tcfg)
    # cached
    tc = TrainableDeviceCache(cfg, tcfg, ccfg, tables)
    dense = params.dense
    dstate = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)

    losses_ref, losses_c = [], []
    for k, (dx, idx, y) in enumerate(learnable_batches(dcfg)):
        p_ref, o_ref, l1 = step_ref(p_ref, o_ref, jnp.asarray(dx),
                                    jnp.asarray(idx), jnp.asarray(y))
        dense, dstate, l2 = tc.train_batch(dense, dstate, k, dx, idx, y)
        losses_ref.append(float(l1))
        losses_c.append(float(l2))
    np.testing.assert_allclose(losses_c, losses_ref, rtol=1e-5, atol=1e-6)
    tc.flush_to_host()
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(
            tc.host_tables[t],
            np.asarray(p_ref.sparse[f"table_{t}"]["kind_plain"]),
            rtol=1e-5, atol=1e-6, err_msg=f"table_{t}")
    np.testing.assert_allclose(
        np.asarray(dense["bot"]["layer_0"]["w"]),
        np.asarray(p_ref.dense["bot"]["layer_0"]["w"]), rtol=1e-5, atol=1e-6)
    assert tc.stats()["dropped_updates"] == 0
    tc.close()


def test_cached_training_bounded_hbm_still_learns():
    """With capacity far below the working set (evictions every batch), the
    loss must still fall and dropped updates must stay a tiny fraction."""
    cfg, tcfg, ccfg, params, tables, dcfg = _setup(capacity=24,
                                                   n_batches=120, bs=32)
    tc = TrainableDeviceCache(cfg, tcfg, ccfg, tables)
    dense = params.dense
    dstate = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    losses = []
    for k, (dx, idx, y) in enumerate(learnable_batches(dcfg)):
        dense, dstate, loss = tc.train_batch(dense, dstate, k, dx, idx, y)
        losses.append(float(loss))
    assert np.mean(losses[-20:]) < np.mean(losses[:20])
    s = tc.stats()
    total_updates = s["requests"] * cfg.num_tables
    assert s["dropped_updates"] / total_updates < 0.05
    assert s["hbm_bytes"] == 24 * (cfg.embedding_dim + 1) * 4
    tc.close()


def test_small_cache_tracks_full_table_closely():
    """With write-back + zero-copy backing, cached training at SMALL
    capacity (evictions every batch) tracks full-table training; the only
    divergence source is a key evicted AND re-missed within one batch (its
    gradient applies as two partial updates) — drift must stay tiny."""
    cfg, tcfg, ccfg, params, tables, dcfg = _setup(capacity=20, n_batches=50,
                                                   bs=8, seed=7)
    step_ref = jax.jit(make_train_step(cfg, tcfg))
    p_ref, o_ref = params, init_opt_state(params, tcfg)
    tc = TrainableDeviceCache(cfg, tcfg, ccfg, tables)
    dense = params.dense
    dstate = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    losses_ref, losses_c = [], []
    for k, (dx, idx, y) in enumerate(learnable_batches(dcfg)):
        p_ref, o_ref, l1 = step_ref(p_ref, o_ref, jnp.asarray(dx),
                                    jnp.asarray(idx), jnp.asarray(y))
        dense, dstate, l2 = tc.train_batch(dense, dstate, k, dx, idx, y)
        losses_ref.append(float(l1))
        losses_c.append(float(l2))
    # trajectories must track closely (mean abs loss gap << loss scale)
    gap = np.mean(np.abs(np.asarray(losses_c) - np.asarray(losses_ref)))
    assert gap < 0.02, gap
    tc.flush_to_host()
    diffs = []
    for t in range(cfg.num_tables):
        ref = np.asarray(p_ref.sparse[f"table_{t}"]["kind_plain"])
        diffs.append(np.abs(tc.host_tables[t] - ref).max())
    assert max(diffs) < 0.15, diffs     # bounded drift on a few rows
    assert np.mean(diffs) < 0.08
    tc.close()


def test_writeback_keeps_host_consistent():
    """Rows evicted and later reloaded must carry their training updates
    (write-back correctness): train with a tiny cache, then flush; every
    touched row must differ from its init, untouched rows must be exact."""
    cfg, tcfg, ccfg, params, tables, dcfg = _setup(capacity=16, n_batches=60,
                                                   bs=8, seed=3)
    init_tables = [t.copy() for t in tables]
    tc = TrainableDeviceCache(cfg, tcfg, ccfg, tables)
    dense = params.dense
    dstate = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    touched = [set() for _ in range(cfg.num_tables)]
    for k, (dx, idx, y) in enumerate(learnable_batches(dcfg)):
        dense, dstate, _ = tc.train_batch(dense, dstate, k, dx, idx, y)
        for t in range(cfg.num_tables):
            touched[t].update(int(r) for r in np.asarray(idx)[:, t])
    tc.flush_to_host()
    for t in range(cfg.num_tables):
        for r in range(tables[t].shape[0]):
            if r not in touched[t]:
                np.testing.assert_array_equal(tc.host_tables[t][r],
                                              init_tables[t][r])
    # most touched rows changed (an occasional dropped update may leave one)
    n_changed = sum(
        int(not np.array_equal(tc.host_tables[t][r], init_tables[t][r]))
        for t in range(cfg.num_tables) for r in touched[t])
    n_touched = sum(len(s) for s in touched)
    assert n_changed > 0.9 * n_touched
    tc.close()


def test_save_load_resume(tmp_path):
    """Checkpoint the bounded-HBM trainer and resume: the resumed trajectory
    must equal the uninterrupted one (cold cache reloads through misses with
    identical values + momenta)."""
    cfg, tcfg, ccfg, params, tables, dcfg = _setup(capacity=200, n_batches=20,
                                                   bs=8, seed=11)
    batches = list(learnable_batches(dcfg))
    dense0 = params.dense
    dstate0 = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)

    # uninterrupted run
    tc_a = TrainableDeviceCache(cfg, tcfg, ccfg,
                                [t.copy() for t in tables])
    dense_a, dstate_a = dense0, dstate0
    for k, (dx, idx, y) in enumerate(batches):
        dense_a, dstate_a, _ = tc_a.train_batch(dense_a, dstate_a, k, dx,
                                                idx, y)
    tc_a.flush_to_host()

    # interrupted at step 10: save -> fresh trainer -> load -> resume
    tc_b = TrainableDeviceCache(cfg, tcfg, ccfg,
                                [t.copy() for t in tables])
    dense_b, dstate_b = dense0, dstate0
    for k in range(10):
        dx, idx, y = batches[k]
        dense_b, dstate_b, _ = tc_b.train_batch(dense_b, dstate_b, k, dx,
                                                idx, y)
    tc_b.save(str(tmp_path))
    tc_b.close()
    tc_c = TrainableDeviceCache(cfg, tcfg, ccfg,
                                [np.zeros_like(t) for t in tables])
    tc_c.load(str(tmp_path))
    dense_c, dstate_c = dense_b, dstate_b
    for k in range(10, 20):
        dx, idx, y = batches[k]
        dense_c, dstate_c, _ = tc_c.train_batch(dense_c, dstate_c, k, dx,
                                                idx, y)
    tc_c.flush_to_host()
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(tc_c.host_tables[t], tc_a.host_tables[t],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(tc_c.host_mom[t], tc_a.host_mom[t],
                                   rtol=1e-5, atol=1e-7)
    # EV export feeds the inference tiers
    paths = tc_c.export_ev_tables(str(tmp_path / "ev"))
    assert len(paths) == cfg.num_tables
    tc_a.close(); tc_c.close()


def test_file_backed_training_matches_in_ram(tmp_path):
    """Terabyte configuration: memmapped .bin master tables must train
    identically to the in-DRAM copies, and updates must persist to the
    files (the beyond-DRAM TRAINING capability)."""
    import jax.numpy as jnp
    from evstore_tpu.cache.storage import write_ev_tables_binary

    cfg, tcfg, ccfg, params, tables, dcfg = _setup(capacity=12, n_batches=40)
    write_ev_tables_binary(tables, str(tmp_path), 32)

    ram = TrainableDeviceCache(cfg, tcfg, ccfg, tables)
    fb = TrainableDeviceCache.from_files(cfg, tcfg, ccfg, str(tmp_path),
                                         [t.shape[0] for t in tables])
    dense_r = dense_f = params.dense
    dst_r = dst_f = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    for k, (dx, idx, y) in enumerate(learnable_batches(dcfg)):
        dense_r, dst_r, l_r = ram.train_batch(dense_r, dst_r, k, dx, idx, y)
        dense_f, dst_f, l_f = fb.train_batch(dense_f, dst_f, k, dx, idx, y)
        np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-6)
    ram.flush_to_host()
    fb.flush_files()
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(fb.host_tables[t], ram.host_tables[t],
                                   rtol=1e-6, atol=1e-7)
    # persistence: re-open the files cold; trained rows must be there
    reopened = np.memmap(tmp_path / "ev-table-1.bin", np.float32, mode="r",
                         shape=tables[0].shape)
    np.testing.assert_allclose(np.asarray(reopened), ram.host_tables[0],
                               rtol=1e-6, atol=1e-7)
    assert not np.allclose(np.asarray(reopened), tables[0])  # actually trained
    ram.close(); fb.close()


def test_bf16_cache_rows_track_fp32():
    """main_precision=16 stores cached rows as bf16 (half the cache HBM);
    training must track the fp32-cache run closely and still learn."""
    import jax.numpy as jnp

    cfg, tcfg, ccfg, params, tables, dcfg = _setup(capacity=64, n_batches=60)
    c16 = CacheConfig(policy="evlfu", total_size=64, main_precision=16)
    tc32 = TrainableDeviceCache(cfg, tcfg, ccfg, tables)
    tc16 = TrainableDeviceCache(cfg, tcfg, c16, tables)
    assert tc16.cache_values.dtype == jnp.bfloat16
    assert tc16.stats()["hbm_bytes"] < tc32.stats()["hbm_bytes"]

    dense32 = dense16 = params.dense
    d32 = d16 = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    l32s, l16s = [], []
    for k, (dx, idx, y) in enumerate(learnable_batches(dcfg)):
        dense32, d32, l32 = tc32.train_batch(dense32, d32, k, dx, idx, y)
        dense16, d16, l16 = tc16.train_batch(dense16, d16, k, dx, idx, y)
        l32s.append(float(l32)); l16s.append(float(l16))
    # both learn, and bf16 stays near the fp32 trajectory
    assert np.mean(l16s[-10:]) < np.mean(l16s[:10])
    assert abs(np.mean(l16s[-10:]) - np.mean(l32s[-10:])) < 0.05
    tc32.close(); tc16.close()


def test_q8_codec_stochastic_rounding_unbiased():
    """enc_sr is unbiased: averaging dec(enc_sr(x)) over many keys recovers
    x to within the Monte-Carlo error, unlike round-to-nearest whose bias is
    up to half a quantization step."""
    from evstore_tpu.cache.trainable import (_q8_decode, _q8_encode_det,
                                             _q8_encode_sr)
    x = jnp.asarray(np.linspace(-0.99, 0.99, 64, dtype=np.float32)
                    .reshape(8, 8))
    acc = np.zeros_like(np.asarray(x))
    n = 400
    for s in range(n):
        acc += np.asarray(_q8_decode(_q8_encode_sr(x, jax.random.PRNGKey(s))))
    np.testing.assert_allclose(acc / n, np.asarray(x), atol=2e-3)
    # det roundtrip error bounded by half a step (2/254/2)
    err = np.abs(np.asarray(_q8_decode(_q8_encode_det(x))) - np.asarray(x))
    assert err.max() <= (2.0 / 254.0) / 2 + 1e-6


def test_int8_cache_rows_still_learn():
    """main_precision=8 stores cached rows via the reference's int8 codec
    (quarter cache HBM) with stochastic-rounding stores; training must still
    learn and stay near the fp32 trajectory."""
    cfg, tcfg, ccfg, params, tables, dcfg = _setup(capacity=64, n_batches=60)
    c8 = CacheConfig(policy="evlfu", total_size=64, main_precision=8)
    tc32 = TrainableDeviceCache(cfg, tcfg, ccfg, tables)
    tc8 = TrainableDeviceCache(cfg, tcfg, c8, tables)
    assert tc8.cache_values.dtype == jnp.uint8
    assert tc8.stats()["hbm_bytes"] < tc32.stats()["hbm_bytes"]

    dense32 = dense8 = params.dense
    d32 = d8 = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    l32s, l8s = [], []
    for k, (dx, idx, y) in enumerate(learnable_batches(dcfg)):
        dense32, d32, l32 = tc32.train_batch(dense32, d32, k, dx, idx, y)
        dense8, d8, l8 = tc8.train_batch(dense8, d8, k, dx, idx, y)
        l32s.append(float(l32)); l8s.append(float(l8))
    assert np.mean(l8s[-10:]) < np.mean(l8s[:10])
    assert abs(np.mean(l8s[-10:]) - np.mean(l32s[-10:])) < 0.1
    tc32.close(); tc8.close()


def test_sharded_trainable_cache_matches_single_chip():
    """Cache working set sharded over the (2,4) mesh must train EXACTLY like
    the single-chip trainable cache: same losses, same final tables; per-chip
    HBM is capacity/4."""
    import jax.numpy as jnp
    from evstore_tpu.cache.trainable import ShardedTrainableDeviceCache
    from evstore_tpu.parallel.mesh import make_mesh

    cfg, tcfg, ccfg, params, tables, dcfg = _setup(capacity=16, n_batches=40)
    single = TrainableDeviceCache(cfg, tcfg, ccfg, tables)
    mesh = make_mesh(2, 4)
    shard = ShardedTrainableDeviceCache(cfg, tcfg, ccfg, tables, mesh)
    assert shard.stats()["hbm_bytes_per_chip"] * 4 == single.stats()["hbm_bytes"]

    dense_s = dense_m = params.dense
    st_s = st_m = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    for k, (dx, idx, y) in enumerate(learnable_batches(dcfg)):
        dense_s, st_s, l_s = single.train_batch(dense_s, st_s, k, dx, idx, y)
        dense_m, st_m, l_m = shard.train_batch(dense_m, st_m, k, dx, idx, y)
        np.testing.assert_allclose(float(l_m), float(l_s), rtol=1e-5,
                                   err_msg=f"step {k}")
    single.flush_to_host()
    shard.flush_to_host()
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(shard.host_tables[t],
                                   single.host_tables[t],
                                   rtol=1e-4, atol=1e-6)
    single.close(); shard.close()


def test_sharded_int8_cache_learns():
    """int8 rows in the SHARDED trainable cache: per-shard stochastic
    rounding (identical across data replicas) must still learn."""
    import jax.numpy as jnp
    from evstore_tpu.cache.trainable import ShardedTrainableDeviceCache
    from evstore_tpu.parallel.mesh import make_mesh

    cfg, tcfg, _, params, tables, dcfg = _setup(capacity=48, n_batches=60,
                                                bs=32)
    c8 = CacheConfig(policy="evlfu", total_size=48, main_precision=8)
    shard = ShardedTrainableDeviceCache(cfg, tcfg, c8, tables, make_mesh(2, 4))
    assert shard.cache_values.dtype == jnp.uint8
    dense = params.dense
    dst = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    losses = []
    for k, (dx, idx, y) in enumerate(learnable_batches(dcfg)):
        dense, dst, l = shard.train_batch(dense, dst, k, dx, idx, y)
        losses.append(float(l))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    shard.close()


def test_sharded_file_backed_composition(tmp_path):
    """ShardedTrainableDeviceCache.from_files: cache sharded over the mesh
    AND master tables on disk — bounded HBM per chip + bounded DRAM at once;
    trains identically to the single-chip in-RAM cache."""
    import jax.numpy as jnp
    from evstore_tpu.cache.storage import write_ev_tables_binary
    from evstore_tpu.cache.trainable import ShardedTrainableDeviceCache
    from evstore_tpu.parallel.mesh import make_mesh

    cfg, tcfg, ccfg, params, tables, dcfg = _setup(capacity=16, n_batches=30)
    write_ev_tables_binary(tables, str(tmp_path), 32)
    ram = TrainableDeviceCache(cfg, tcfg, ccfg, tables)
    fb = ShardedTrainableDeviceCache.from_files(
        cfg, tcfg, ccfg, str(tmp_path), [t.shape[0] for t in tables],
        mesh=make_mesh(2, 4))
    dense_r = dense_f = params.dense
    st_r = st_f = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    for k, (dx, idx, y) in enumerate(learnable_batches(dcfg)):
        dense_r, st_r, l_r = ram.train_batch(dense_r, st_r, k, dx, idx, y)
        dense_f, st_f, l_f = fb.train_batch(dense_f, st_f, k, dx, idx, y)
        np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-5)
    ram.flush_to_host(); fb.flush_files()
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(fb.host_tables[t], ram.host_tables[t],
                                   rtol=1e-4, atol=1e-6)
    ram.close(); fb.close()


def test_pipelined_matches_synchronous_bitexact():
    """VERDICT r1 item 5 'done' criterion: the pipelined trajectory
    (train_batches: packed single-transfer write-backs, elided pre-step
    write-back with same-batch store-forwarding) matches the synchronous
    per-batch path bit-for-bit — dense params, flushed tables, momenta."""
    import dataclasses as _dc
    import jax
    import jax.numpy as jnp
    from evstore_tpu.config import (CacheConfig, TrainConfig,
                                    tiny_dlrm_config)
    from evstore_tpu.cache.trainable import TrainableDeviceCache
    from evstore_tpu.data.synthetic import RandomDataConfig, random_batches
    from evstore_tpu.models.dlrm import init_dlrm

    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=32, learning_rate=0.2,
                       optimizer="rwsadagrad")
    # tiny capacity -> heavy eviction churn, exercising the write-back paths
    ccfg = CacheConfig(policy="evlfu", total_size=24, main_precision=32)
    rng = np.random.default_rng(0)
    tables = [np.asarray(rng.uniform(-0.1, 0.1, (s, cfg.embedding_dim)),
                         np.float32) for s in cfg.table_sizes]
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=32,
                            num_batches=20, seed=5, distribution="zipf",
                            zipf_alpha=1.1)

    def run(pipelined):
        tc = TrainableDeviceCache(cfg, tcfg, ccfg, tables, insert_bucket=64)
        params = init_dlrm(jax.random.PRNGKey(0), cfg)
        dense = params.dense
        dstate = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
        losses = []
        if pipelined:
            for dense, dstate, loss in tc.train_batches(
                    dense, dstate, random_batches(dcfg)):
                losses.append(float(loss))
        else:
            for k, (dx, ix, y) in enumerate(random_batches(dcfg)):
                dense, dstate, loss = tc.train_batch(dense, dstate, k + 1,
                                                     dx, ix, y)
                losses.append(float(loss))
        tc.flush_to_host()
        out = ([t.copy() for t in tc.host_tables],
               [m.copy() for m in tc.host_mom],
               jax.tree_util.tree_map(np.asarray, dense), losses)
        tc.close()
        return out

    tab_s, mom_s, dense_s, loss_s = run(False)
    tab_p, mom_p, dense_p, loss_p = run(True)
    np.testing.assert_array_equal(loss_s, loss_p)
    for t in range(cfg.num_tables):
        np.testing.assert_array_equal(tab_s[t], tab_p[t], err_msg=f"tab {t}")
        np.testing.assert_array_equal(mom_s[t], mom_p[t], err_msg=f"mom {t}")
    jax.tree_util.tree_map(np.testing.assert_array_equal, dense_s, dense_p)


def test_pipelined_int8_runs_and_learns():
    """Pipelined path with int8 cached rows (stochastic-rounding stores)."""
    import jax
    import jax.numpy as jnp
    from evstore_tpu.config import (CacheConfig, TrainConfig,
                                    tiny_dlrm_config)
    from evstore_tpu.cache.trainable import TrainableDeviceCache
    from evstore_tpu.data.synthetic import RandomDataConfig, learnable_batches
    from evstore_tpu.models.dlrm import init_dlrm

    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=64, learning_rate=0.3,
                       optimizer="rwsadagrad")
    ccfg = CacheConfig(policy="evlfu", total_size=48, main_precision=8)
    rng = np.random.default_rng(1)
    tables = [np.asarray(rng.uniform(-0.05, 0.05, (s, cfg.embedding_dim)),
                         np.float32) for s in cfg.table_sizes]
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=64,
                            num_batches=40, seed=2)
    tc = TrainableDeviceCache(cfg, tcfg, ccfg, tables, insert_bucket=64)
    params = init_dlrm(jax.random.PRNGKey(3), cfg)
    dense = params.dense
    dstate = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    losses = []
    for dense, dstate, loss in tc.train_batches(dense, dstate,
                                                learnable_batches(dcfg)):
        losses.append(float(loss))
    tc.close()
    assert np.mean(losses[-8:]) < np.mean(losses[:8])


def test_windowed_matches_synchronous_bitexact():
    """Windowed megastep (K batches per device call, lax.scan on device,
    shared window miss buffer + on-device eviction-snapshot fills): the
    trajectory must match the synchronous per-batch path bit-for-bit —
    losses, dense params, flushed tables, momenta — across window sizes,
    including windows that straddle heavy eviction churn (capacity 24)."""
    import jax
    import jax.numpy as jnp
    from evstore_tpu.config import (CacheConfig, TrainConfig,
                                    tiny_dlrm_config)
    from evstore_tpu.cache.trainable import TrainableDeviceCache
    from evstore_tpu.data.synthetic import RandomDataConfig, random_batches
    from evstore_tpu.models.dlrm import init_dlrm

    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=32, learning_rate=0.2,
                       optimizer="rwsadagrad")
    ccfg = CacheConfig(policy="evlfu", total_size=24, main_precision=32)
    rng = np.random.default_rng(0)
    tables = [np.asarray(rng.uniform(-0.1, 0.1, (s, cfg.embedding_dim)),
                         np.float32) for s in cfg.table_sizes]
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=32,
                            num_batches=30, seed=5, distribution="zipf",
                            zipf_alpha=1.1)

    def run(window):
        tc = TrainableDeviceCache(cfg, tcfg, ccfg, tables, insert_bucket=64)
        params = init_dlrm(jax.random.PRNGKey(0), cfg)
        dense = params.dense
        dstate = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
        losses = []
        if window:
            for dense, dstate, loss in tc.train_batches_windowed(
                    dense, dstate, random_batches(dcfg), window=window):
                losses.append(float(loss))
        else:
            for k, (dx, ix, y) in enumerate(random_batches(dcfg)):
                dense, dstate, loss = tc.train_batch(dense, dstate, k + 1,
                                                     dx, ix, y)
                losses.append(float(loss))
        tc.flush_to_host()
        out = ([t.copy() for t in tc.host_tables],
               [m.copy() for m in tc.host_mom],
               jax.tree_util.tree_map(np.asarray, dense), losses)
        tc.close()
        return out

    tab_s, mom_s, dense_s, loss_s = run(0)
    for W in (7, 16):         # 7: ragged final window; 16: single window+
        tab_w, mom_w, dense_w, loss_w = run(W)
        np.testing.assert_array_equal(loss_s, loss_w, err_msg=f"W={W}")
        for t in range(cfg.num_tables):
            np.testing.assert_array_equal(tab_s[t], tab_w[t],
                                          err_msg=f"W={W} tab {t}")
            np.testing.assert_array_equal(mom_s[t], mom_w[t],
                                          err_msg=f"W={W} mom {t}")
        jax.tree_util.tree_map(np.testing.assert_array_equal, dense_s,
                               dense_w)


def test_windowed_int8_runs_and_learns():
    """Windowed megastep with int8 cached rows (stochastic-rounding
    stores) still trains: loss falls on the learnable fixture."""
    import jax
    import jax.numpy as jnp
    from evstore_tpu.config import (CacheConfig, TrainConfig,
                                    tiny_dlrm_config)
    from evstore_tpu.cache.trainable import TrainableDeviceCache
    from evstore_tpu.data.synthetic import RandomDataConfig, learnable_batches
    from evstore_tpu.models.dlrm import init_dlrm

    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=64, learning_rate=0.3,
                       optimizer="rwsadagrad")
    ccfg = CacheConfig(policy="evlfu", total_size=48, main_precision=8)
    rng = np.random.default_rng(1)
    tables = [np.asarray(rng.uniform(-0.05, 0.05, (s, cfg.embedding_dim)),
                         np.float32) for s in cfg.table_sizes]
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=64,
                            num_batches=40, seed=2)
    tc = TrainableDeviceCache(cfg, tcfg, ccfg, tables, insert_bucket=64)
    params = init_dlrm(jax.random.PRNGKey(3), cfg)
    dense = params.dense
    dstate = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params.dense)
    losses = []
    for dense, dstate, loss in tc.train_batches_windowed(
            dense, dstate, learnable_batches(dcfg), window=8):
        losses.append(float(loss))
    tc.close()
    assert np.mean(losses[-8:]) < np.mean(losses[:8])


def test_cached_training_quality_loop_matches_full_table(tmp_path):
    """VERDICT r2 item 4: run_cached_training with test_freq must run the
    periodic eval through the cache, track best AUC, and checkpoint-on-best
    — and its AUC must match full-table training's within noise on the
    learnable fixture (≙ the reference's eval/ckpt loop,
    dlrm_s_pytorch.py:1743-1796)."""
    from evstore_tpu.drivers.train import (restore_dense_npz,
                                           run_cached_training, run_training)

    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=16, learning_rate=0.2,
                       optimizer="rwsadagrad", test_freq=40, print_freq=40)
    ccfg = CacheConfig(policy="evlfu", total_size=200, main_precision=32)
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=16,
                            num_batches=120, seed=0)
    tdcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                             table_sizes=cfg.table_sizes, batch_size=16,
                             num_batches=20, seed=99)
    make_train = lambda: learnable_batches(dcfg)
    make_test = lambda: learnable_batches(tdcfg)

    save = str(tmp_path / "best")
    res_c = run_cached_training(cfg, tcfg, ccfg, make_train,
                                save_dir=save,
                                make_test_batches=make_test,
                                log_fn=lambda *a: None)
    res_f = run_training(cfg, tcfg, make_train, make_test,
                         log_fn=lambda *a: None)

    # quality parity within noise on the learnable fixture
    assert res_c.best_metric > 0.75
    assert abs(res_c.best_metric - res_f.best_metric) < 0.05
    assert len(res_c.history["eval"]) >= 3   # periodic evals happened

    # checkpoint-on-best artifacts: cache tables + dense npz + metadata
    import os
    assert os.path.exists(os.path.join(save, "table_0.npy"))
    assert os.path.exists(os.path.join(save, "dense_params.npz"))
    assert os.path.exists(os.path.join(save, "best.json"))
    dense2, dstate2 = restore_dense_npz(res_c.params.dense,
                                        jax.tree_util.tree_map(
                                            lambda p: jnp.zeros_like(
                                                p, jnp.float32),
                                            res_c.params.dense), save)
    # roundtrip shape fidelity
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(res_c.params.dense),
            jax.tree_util.tree_leaves_with_path(dense2)):
        assert a.shape == b.shape


def test_cached_training_quality_loop_windowed(tmp_path):
    """The windowed megastep path must run the same quality loop (eval at
    chunk boundaries) and reach the same quality."""
    from evstore_tpu.drivers.train import run_cached_training

    cfg = tiny_dlrm_config()
    tcfg = TrainConfig(batch_size=16, learning_rate=0.2,
                       optimizer="rwsadagrad", test_freq=40, print_freq=40)
    ccfg = CacheConfig(policy="evlfu", total_size=200, main_precision=32)
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=16,
                            num_batches=120, seed=0)
    tdcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                             table_sizes=cfg.table_sizes, batch_size=16,
                             num_batches=20, seed=99)
    res = run_cached_training(cfg, tcfg, ccfg,
                              lambda: learnable_batches(dcfg),
                              window=8,
                              make_test_batches=lambda: learnable_batches(
                                  tdcfg),
                              log_fn=lambda *a: None)
    assert res.best_metric > 0.75
    assert len(res.history["eval"]) >= 3


def test_long_horizon_cached_auc_matches_full_table():
    """VERDICT r4 item 6: multi-epoch accuracy, not just throughput.  The
    HBM-bounded cached trainer (capacity 38% of distinct keys, evictions +
    write-back live, windowed megastep W=4) must land within 1e-3 held-out
    AUC of full-table training after 2 epochs at fp32 rows, and within
    1.5e-2 at int8 rows (stochastic-rounding stores; in practice int8
    lands slightly ABOVE full-table on this fixture).  The full 3-epoch
    curves live in scripts/long_horizon_quality.py + EXPERIMENTS §28."""
    from evstore_tpu.models.dlrm import dlrm_forward
    from evstore_tpu.train.metrics import binary_metrics
    from evstore_tpu.config import make_dlrm_config

    cfg = make_dlrm_config(8, (2000, 1500, 1000, 800), (16,), (16,),
                           num_dense=4)
    tcfg = TrainConfig(batch_size=128, learning_rate=0.1,
                       optimizer="rwsadagrad")
    n_train, n_eval, epochs = 100, 8, 2
    dcfg = RandomDataConfig(num_dense=4, table_sizes=cfg.table_sizes,
                            batch_size=128, num_batches=n_train + n_eval,
                            seed=11)
    batches = list(learnable_batches(dcfg))
    train_b, eval_b = batches[:n_train], batches[n_train:]
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    T = cfg.num_tables

    def auc_full(p):
        s, l = [], []
        for dx, idx, y in eval_b:
            s.append(np.asarray(jax.nn.sigmoid(dlrm_forward(
                p, jnp.asarray(dx), jnp.asarray(idx), cfg))))
            l.append(y)
        return binary_metrics(np.concatenate(s), np.concatenate(l))["auc"]

    step = jax.jit(make_train_step(cfg, tcfg))
    p, o = params, init_opt_state(params, tcfg)
    first_epoch_auc = None
    for ep in range(epochs):
        for dx, idx, y in train_b:
            p, o, _ = step(p, o, jnp.asarray(dx), jnp.asarray(idx),
                           jnp.asarray(y))
        if ep == 0:
            first_epoch_auc = auc_full(p)
    auc_ref = auc_full(p)
    assert auc_ref > 0.75 and auc_ref > first_epoch_auc  # long-horizon gain

    # fp32: two-sided 1e-3 (the VERDICT bar).  int8: one-sided — the
    # stochastic-rounding stores act as a regularizer and land ABOVE
    # full-table on this fixture (+0.015 measured); what the bound must
    # exclude is DEGRADATION.
    for prec, bound, two_sided in ((32, 1e-3, True), (8, 1.5e-2, False)):
        ccfg = CacheConfig(policy="evlfu", total_size=2000,
                           main_precision=prec)
        tc = TrainableDeviceCache(
            cfg, tcfg, ccfg,
            [np.asarray(params.sparse[f"table_{t}"]["kind_plain"])
             for t in range(T)])
        dense = params.dense
        dstate = jax.tree_util.tree_map(
            lambda q: jnp.zeros_like(q, jnp.float32), params.dense)
        k = 0
        for _ in range(epochs):
            for dense, dstate, _ in tc.train_batches_windowed(
                    dense, dstate, iter(train_b), window=4,
                    start_step=k + 1):
                k += 1
        tc.flush_to_host()
        s, l = [], []
        from evstore_tpu.models.dlrm import DLRMParams as _DP
        for dx, idx, y in eval_b:
            rows = np.stack([tc.host_tables[t][np.asarray(idx)[:, t]]
                             for t in range(T)], axis=1)
            s.append(np.asarray(jax.nn.sigmoid(dlrm_forward(
                _DP(dense, {}), jnp.asarray(dx), None, cfg,
                emb_rows=jnp.asarray(rows)))))
            l.append(y)
        auc_c = binary_metrics(np.concatenate(s), np.concatenate(l))["auc"]
        st = tc.stats()
        assert st["hit_rate"] < 0.9, "capacity must actually bind"
        if two_sided:
            assert abs(auc_c - auc_ref) <= bound, (prec, auc_c, auc_ref)
        else:
            assert auc_c - auc_ref >= -bound, (prec, auc_c, auc_ref)
            assert auc_c > 0.75
        tc.close()


def test_borrow_stays_aliased_for_noncontiguous_inputs():
    """Regression (round 5): np.asarray of a TPU jax array is
    non-C-contiguous, and np.array(copy=True)'s default order='K' kept
    those strides — the engine's zero-copy borrow then silently copied,
    freezing the masters and serving every miss STALE (-0.11 held-out
    AUC on the real chip while CPU runs were exact).  host_tables must
    be C-ordered and the borrow verified aliased; write-backs must be
    visible to subsequent fetches."""
    from evstore_tpu.config import make_dlrm_config
    cfg = make_dlrm_config(4, (50, 40), (8,), (8,), num_dense=4)
    tcfg = TrainConfig(batch_size=8, learning_rate=0.1,
                       optimizer="rwsadagrad")
    ccfg = CacheConfig(policy="evlfu", total_size=16, main_precision=32)
    rng = np.random.default_rng(0)
    # F-ordered inputs reproduce the TPU layout trap on any platform
    tables = [np.asfortranarray(rng.uniform(-1, 1, (s, 4)).astype(np.float32))
              for s in (50, 40)]
    assert not tables[0].flags["C_CONTIGUOUS"]
    tc = TrainableDeviceCache(cfg, tcfg, ccfg, tables)
    before = tc.assigner.fetch_rows_arrays(np.array([0]), np.array([7]))
    tc.host_tables[0][7] = 42.0
    after = tc.assigner.fetch_rows_arrays(np.array([0]), np.array([7]))
    np.testing.assert_array_equal(before[0], tables[0][7])
    np.testing.assert_array_equal(after[0], np.full(4, 42.0, np.float32))
    tc.close()
