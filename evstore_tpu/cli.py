"""Command-line interface with reference flag parity.

The reference drives everything through ~90 argparse flags on
dlrm_s_pytorch.py (:924-1047) plus the EVStore flags on the C1/C2/C3
drivers (dlrm_s_pytorch_C1.py:1248-1268).  This CLI accepts the same flag
names (dash-style) and maps them onto DLRMConfig/TrainConfig/CacheConfig.
One binary covers the reference's five drivers: `--inference-only` +
`--use-evstore` + `--n-caching-layers {1,2,3}` select the C1 / C1+C2 /
C1+C2+C3 behavior (the reference selects it by editing a C++ #define and
rebuilding, cache_manager.cpp:13).

Usage:
  python -m evstore_tpu.cli --arch-mlp-bot 13-512-256-64-36 ...
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from evstore_tpu.config import (CacheConfig, DLRMConfig, TrainConfig,
                                make_dlrm_config)


def _dash_ints(s: str) -> List[int]:
    return [int(x) for x in s.split("-")]


def _str_bool(s) -> bool:
    # the reference hand-parses string booleans (dlrm_s_pytorch_C1.py:1276-1294)
    if isinstance(s, bool):
        return s
    return str(s).lower() in ("true", "1", "yes")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native DLRM with EVStore tiered embedding")
    # model arch (dlrm_s_pytorch.py:926-936)
    p.add_argument("--arch-sparse-feature-size", type=int, default=2)
    p.add_argument("--arch-embedding-size", type=str, default="4-3-2")
    p.add_argument("--arch-mlp-bot", type=str, default="4-3-2")
    p.add_argument("--arch-mlp-top", type=str, default="4-2-1")
    p.add_argument("--arch-interaction-op", type=str, default="dot")
    p.add_argument("--arch-interaction-itself", action="store_true")
    p.add_argument("--weighted-pooling", type=str, default=None)
    # embedding tricks (:937-944)
    p.add_argument("--md-flag", action="store_true")
    p.add_argument("--md-threshold", type=int, default=200)
    p.add_argument("--md-temperature", type=float, default=0.3)
    p.add_argument("--md-round-dims", action="store_true")
    p.add_argument("--qr-flag", action="store_true")
    p.add_argument("--qr-threshold", type=int, default=200)
    p.add_argument("--qr-operation", type=str, default="mult")
    p.add_argument("--qr-collisions", type=int, default=4)
    # activations and loss (:946-951)
    p.add_argument("--loss-function", type=str, default="bce")
    p.add_argument("--loss-weights", type=str, default="1.0-1.0")
    p.add_argument("--loss-threshold", type=float, default=0.0)
    p.add_argument("--round-targets", type=_str_bool, default=False)
    # data (:952-968)
    p.add_argument("--data-size", type=int, default=1)
    p.add_argument("--num-batches", type=int, default=0)
    p.add_argument("--data-generation", type=str, default="random",
                   choices=["random", "synthetic", "dataset"])
    p.add_argument("--rand-data-dist", type=str, default="uniform")
    p.add_argument("--rand-data-min", type=float, default=0)
    p.add_argument("--rand-data-max", type=float, default=1)
    p.add_argument("--rand-data-mu", type=float, default=-1)
    p.add_argument("--rand-data-sigma", type=float, default=1)
    p.add_argument("--data-set", type=str, default="kaggle")
    p.add_argument("--raw-data-file", type=str, default="")
    p.add_argument("--processed-data-file", type=str, default="")
    p.add_argument("--max-ind-range", type=int, default=-1)
    p.add_argument("--data-sub-sample-rate", type=float, default=0.0)
    p.add_argument("--num-indices-per-lookup", type=int, default=1,
                   help="max multi-hot bag size L (>1 -> EmbeddingBag-style "
                        "pooled lookups, dlrm_data_pytorch.py:1062-1120)")
    p.add_argument("--num-indices-per-lookup-fixed", type=_str_bool,
                   default=False)
    p.add_argument("--memory-map", action="store_true")
    p.add_argument("--dataset-multiprocessing", type=int, default=0,
                   help="process-pool workers for --memory-map streaming "
                        "preprocessing (≙ data_utils.py:876 "
                        "dataset_multiprocessing; 0/1 = sequential)")
    p.add_argument("--mlperf-bin-loader", action="store_true")
    p.add_argument("--percent-data-for-inference", type=float, default=1.0)
    # training (:977-1002)
    p.add_argument("--mini-batch-size", type=int, default=128)
    p.add_argument("--nepochs", type=int, default=1)
    p.add_argument("--learning-rate", type=float, default=0.01)
    p.add_argument("--optimizer", type=str, default="sgd",
                   choices=["sgd", "adagrad", "rwsadagrad"])
    p.add_argument("--print-precision", type=int, default=5)
    p.add_argument("--numpy-rand-seed", type=int, default=123)
    p.add_argument("--print-freq", type=int, default=1024)
    p.add_argument("--test-freq", type=int, default=-1)
    p.add_argument("--test-mini-batch-size", type=int, default=-1)
    p.add_argument("--nbatches-test", type=int, default=0)
    p.add_argument("--lr-num-warmup-steps", type=int, default=0)
    p.add_argument("--lr-decay-start-step", type=int, default=0)
    p.add_argument("--lr-num-decay-steps", type=int, default=0)
    # checkpointing / modes (:1004-1032)
    p.add_argument("--save-model", type=str, default="")
    p.add_argument("--load-model", type=str, default="")
    p.add_argument("--inference-only", action="store_true")
    p.add_argument("--mlperf-logging", action="store_true")
    p.add_argument("--mlperf-acc-threshold", type=float, default=0.0)
    p.add_argument("--mlperf-auc-threshold", type=float, default=0.0)
    p.add_argument("--quantize-embedding-with-bit", type=int, default=32)
    p.add_argument("--quantize-mlp-with-bit", type=int, default=32)
    p.add_argument("--enable-profiling", action="store_true")
    p.add_argument("--tensor-board-filename", type=str, default="run_0")
    # parallelism (TPU re-interpretation of --use-gpu / ndevices)
    p.add_argument("--mesh-data", type=int, default=0,
                   help="data-parallel mesh axis (0 = all devices)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="model-parallel (table-sharding) mesh axis")
    p.add_argument("--dedup-exchange", type=_str_bool, default=False,
                   help="ship unique rows through the sharded exchange")
    import os as _os
    p.add_argument("--alltoall-impl", type=str,
                   default=_os.environ.get("DLRM_ALLTOALL_IMPL", "psum"),
                   choices=["psum", "butterfly", "alltoall"],
                   help="embedding exchange impl (≙ DLRM_ALLTOALL_IMPL, "
                        "extend_distributed.py:34): psum = row-sharded; "
                        "butterfly/alltoall = table-wise lax.all_to_all")
    p.add_argument("--compute-dtype", type=str, default="bfloat16")
    p.add_argument("--use-pallas-gather", type=_str_bool, default=False,
                   help="Pallas double-buffered row gather on the eval/"
                        "inference path (honest fenced A/B on v5e: eval "
                        "0.35x — loses to XLA fusion, EXPERIMENTS §9; the "
                        "knob exists for other TPU generations)")
    p.add_argument("--use-pallas-interaction", type=_str_bool, default=False,
                   help="fused Pallas dot-interaction kernel (wins in "
                        "isolation, loses end-to-end to XLA fusion — "
                        "config.py:50-55; off by default)")
    # EVStore flags (dlrm_s_pytorch_C1.py:1248-1268)
    p.add_argument("--use-evstore", type=_str_bool, default=False)
    p.add_argument("--train-window", type=int, default=0,
                   help="cached training: batches per device call (the "
                        "windowed megastep, cache/trainable.py); 0/1 = "
                        "per-batch pipelined")
    p.add_argument("--use-emb-cache", type=_str_bool, default=True)
    p.add_argument("--cache-algo", type=str, default="evlfu",
                   choices=["evlfu", "lfu", "lru", "native"])
    p.add_argument("--cache-engine", type=str, default="python",
                   choices=["python", "native"],
                   help="run the selected --cache-algo policy in the Python "
                        "frontend or the C++ engine (native LFU/LRU at "
                        "engine speed ≙ dlrm_s_pytorch_C1.py:1295-1303 "
                        "baselines); --cache-algo native implies native")
    p.add_argument("--emb-cache-size", type=int, default=64000)
    p.add_argument("--n-caching-layers", type=int, default=1)
    p.add_argument("--size-proportion", type=str, default="48-48-4")
    p.add_argument("--main-precision", type=int, default=32)
    p.add_argument("--secondary-precision", type=int, default=8)
    p.add_argument("--high-agghit-threshold", type=int, default=23)
    p.add_argument("--emb-stor", type=str, default="dummy",
                   choices=["dummy", "file", "mmap", "sqlite", "logkv",
                            "native"])
    p.add_argument("--emb-stor-layout", type=str, default="global",
                   choices=["global", "per_table"],
                   help="DB layout for sqlite/logkv: one global table "
                        "(storage_sqlite.py) or one per EV table "
                        "(storage_*_26_tabs.py)")
    p.add_argument("--ev-table-path", type=str, default="")
    p.add_argument("--alt-key-path", type=str, default="")
    p.add_argument("--ev-precs", type=int, default=32)
    p.add_argument("--ev-lookup-only", type=_str_bool, default=False)
    p.add_argument("--approx-emb-threshold", type=int, default=-1)
    p.add_argument("--enable-warmup", type=_str_bool, default=False)
    p.add_argument("--trace-inference-workload", type=_str_bool, default=False)
    p.add_argument("--write-cdf-file", type=str, default="")
    p.add_argument("--use-device-cache", type=_str_bool, default=False,
                   help="C1 rows resident in TPU HBM (device cache)")
    p.add_argument("--extra-mem-load", type=int, default=0,
                   help="MB of HBM ballast (≙ lock-gpu driver's "
                        "extra-mem-load, dlrm_s_pytorch_lock_gpu_C1.py:1819)")
    p.add_argument("--output-dir", type=str, default="./output")
    return p


def configs_from_args(args) -> tuple:
    emb_sizes = _dash_ints(args.arch_embedding_size)
    bot = _dash_ints(args.arch_mlp_bot)
    top_hidden = _dash_ints(args.arch_mlp_top)[:-1]
    if args.max_ind_range > 0:
        emb_sizes = [min(s, args.max_ind_range) for s in emb_sizes]
    cfg = make_dlrm_config(
        args.arch_sparse_feature_size, emb_sizes, bot[1:-1], top_hidden,
        num_dense=bot[0],
        interaction_op=args.arch_interaction_op,
        interaction_itself=args.arch_interaction_itself,
        qr_flag=args.qr_flag, qr_operation=args.qr_operation,
        qr_collisions=args.qr_collisions, qr_threshold=args.qr_threshold,
        md_flag=args.md_flag, md_threshold=args.md_threshold,
        md_temperature=args.md_temperature, md_round_dims=args.md_round_dims,
        compute_dtype=args.compute_dtype,
        use_pallas_gather=args.use_pallas_gather,
        use_pallas_interaction=args.use_pallas_interaction,
        loss_threshold=args.loss_threshold,
        weighted_pooling=args.weighted_pooling)
    lw = [float(x) for x in args.loss_weights.split("-")]
    tcfg = TrainConfig(
        batch_size=args.mini_batch_size,
        test_batch_size=(args.test_mini_batch_size
                         if args.test_mini_batch_size > 0
                         else args.mini_batch_size),
        learning_rate=args.learning_rate, optimizer=args.optimizer,
        loss_function=args.loss_function, loss_weights=(lw[0], lw[1]),
        nepochs=args.nepochs, numpy_rand_seed=args.numpy_rand_seed,
        lr_num_warmup_steps=args.lr_num_warmup_steps,
        lr_decay_start_step=args.lr_decay_start_step,
        lr_num_decay_steps=args.lr_num_decay_steps,
        test_freq=args.test_freq, print_freq=args.print_freq,
        mlperf_acc_threshold=args.mlperf_acc_threshold,
        mlperf_auc_threshold=args.mlperf_auc_threshold,
        save_model=args.save_model, load_model=args.load_model)
    ccfg = CacheConfig(
        policy=("evlfu" if args.cache_algo == "native" else args.cache_algo),
        n_caching_layers=args.n_caching_layers,
        total_size=args.emb_cache_size,
        size_proportion=tuple(_dash_ints(args.size_proportion)),
        main_precision=args.main_precision,
        secondary_precision=args.secondary_precision,
        high_agghit_threshold=args.high_agghit_threshold,
        approx_emb_threshold=args.approx_emb_threshold,
        storage_backend=args.emb_stor,
        storage_path=args.ev_table_path)
    return cfg, tcfg, ccfg


def _make_data(args, cfg):
    from evstore_tpu.data.synthetic import RandomDataConfig, random_batches
    if args.data_generation == "dataset":
        import os
        from evstore_tpu.data.criteo import (CriteoBinDataset, CriteoDataset,
                                             preprocess_criteo,
                                             preprocess_criteo_streaming)
        if args.mlperf_bin_loader:
            # packed int32 records (≙ script/data_loader_terabyte.py
            # CriteoBinDataset under --mlperf-bin-loader,
            # dlrm_s_pytorch.py:1164-1192)
            ds = CriteoBinDataset(args.processed_data_file,
                                  batch_size=args.mini_batch_size,
                                  max_ind_range=max(args.max_ind_range, 0))
            n_test = args.nbatches_test or max(
                1, int(len(ds) * args.percent_data_for_inference))

            def test_iter():
                for k, b in enumerate(ds):
                    if k >= n_test:
                        break
                    yield b

            return (lambda: iter(ds), test_iter)
        pf = args.processed_data_file
        if args.raw_data_file and not (pf and os.path.exists(pf)):
            # preprocessing on demand from the raw TSV (≙ CriteoDataset's
            # lazy getCriteoAdData call, dlrm_data_pytorch.py:53-120);
            # --memory-map selects the bounded-RSS streaming pipeline whose
            # output is consumed via memmap
            out_dir = os.path.join(args.output_dir, "processed")
            if args.memory_map:
                pf = preprocess_criteo_streaming(
                    args.raw_data_file, out_dir, days=7,
                    sub_sample_rate=args.data_sub_sample_rate,
                    seed=args.numpy_rand_seed, dataset_name=args.data_set,
                    num_workers=args.dataset_multiprocessing)
            else:
                pf = preprocess_criteo(
                    args.raw_data_file, out_dir, days=7,
                    sub_sample_rate=args.data_sub_sample_rate,
                    seed=args.numpy_rand_seed, dataset_name=args.data_set)
        if pf.endswith("_stream_meta.npz"):
            ds = CriteoDataset.from_stream(pf, max(args.max_ind_range, 0))
        else:
            ds = CriteoDataset.load(pf, max(args.max_ind_range, 0))
        return (lambda: ds.batches("train", args.mini_batch_size,
                                   drop_last=True),
                lambda: ds.batches("test", args.mini_batch_size,
                                   fraction=args.percent_data_for_inference,
                                   drop_last=True))
    if args.data_generation == "synthetic":
        dist = "zipf"
    elif args.rand_data_dist == "gaussian":
        # --data-generation=random --rand-data-dist=gaussian
        # (generate_dist_input_batch, dlrm_data_pytorch.py:1011-1068)
        dist = "gaussian"
    else:
        dist = "uniform"
    nb = args.num_batches or 100
    dcfg = RandomDataConfig(
        num_dense=cfg.num_dense_features, table_sizes=cfg.table_sizes,
        batch_size=args.mini_batch_size, num_batches=nb,
        seed=args.numpy_rand_seed, distribution=dist,
        rand_data_mu=args.rand_data_mu, rand_data_sigma=args.rand_data_sigma,
        rand_data_min=args.rand_data_min, rand_data_max=args.rand_data_max,
        num_indices_per_lookup=args.num_indices_per_lookup,
        num_indices_per_lookup_fixed=getattr(
            args, "num_indices_per_lookup_fixed", False))
    import dataclasses as _dc
    test_d = _dc.replace(dcfg, num_batches=max(args.nbatches_test, 10),
                         seed=args.numpy_rand_seed + 1)
    return (lambda: random_batches(dcfg), lambda: random_batches(test_d))


def main(argv: Optional[List[str]] = None) -> int:
    import os
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass
    args = build_parser().parse_args(argv)
    if args.enable_profiling:
        # device trace around the whole run (≙ torch.autograd.profiler
        # around the main loop, dlrm_s_pytorch.py:1567-1569,1880-1890)
        from evstore_tpu.utils.profiling import profile_trace
        with profile_trace(os.path.join(args.output_dir, "profile")):
            return _run(args)
    return _run(args)


def _run(args) -> int:
    import os
    import jax
    cfg, tcfg, ccfg = configs_from_args(args)
    if args.mlperf_logging:
        from evstore_tpu.utils.logging import MLPerfLogger
        MLPerfLogger().submission_metadata(
            platform=jax.devices()[0].device_kind.replace(" ", "-"))
    make_train, make_test = _make_data(args, cfg)

    if not args.inference_only:
        mesh = None
        n_dev = len(jax.devices())
        n_data = args.mesh_data or (n_dev // max(args.mesh_model, 1))
        if n_data * args.mesh_model > 1:
            from evstore_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(n_data, args.mesh_model)
        if args.use_evstore:
            # HBM-bounded training through the cache tier (the reference
            # FORBIDS training with EVStore, dlrm_s_pytorch_C1.py:1321-1323
            # — here it is a first-class mode)
            if args.num_indices_per_lookup > 1:
                print("error: --use-evstore requires bag size 1 (the tier "
                      "protocol is groupability-keyed on one row per table, "
                      "like the reference's Criteo drivers)", file=sys.stderr)
                return 2
            from evstore_tpu.drivers.train import run_cached_training
            res = run_cached_training(
                cfg, tcfg, ccfg, make_train,
                ev_table_dir=(args.ev_table_path or None),
                table_sizes=list(cfg.table_sizes),
                save_dir=args.save_model or None,
                mesh=(mesh if args.mesh_model > 1 else None),
                seed=args.numpy_rand_seed,
                window=args.train_window,
                make_test_batches=(make_test if args.test_freq > 0
                                   else None))
            print(f"training done: steps={res.steps} "
                  f"best={res.best_metric:.4f} (cached)")
            return 0
        from evstore_tpu.drivers.train import run_training
        res = run_training(
            cfg, tcfg, make_train, make_test,
            ckpt_dir=args.save_model or None,
            ev_export_dir=(args.ev_table_path or None),
            resume=bool(args.load_model), seed=args.numpy_rand_seed,
            mesh=mesh, dedup_exchange=args.dedup_exchange,
            alltoall_impl=args.alltoall_impl,
            multihot=args.num_indices_per_lookup > 1)
        print(f"training done: steps={res.steps} best={res.best_metric:.4f}")
        return 0

    # inference path (the reference's C1/C1C2/C1C2C3 drivers)
    import jax
    import numpy as np
    if args.extra_mem_load > 0:
        from evstore_tpu.utils.memory import HBMBallast
        _ballast = HBMBallast(args.extra_mem_load)  # held for process life
    from evstore_tpu.cache.storage import StorageManager
    from evstore_tpu.drivers.infer import run_inference
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.utils.checkpoint import (latest_step,
                                              load_ev_tables_into_params,
                                              restore_checkpoint)
    from evstore_tpu.train.train_loop import init_opt_state

    params = init_dlrm(jax.random.PRNGKey(args.numpy_rand_seed), cfg)
    if args.load_model:
        s = latest_step(args.load_model)
        if s is not None:
            params, _, _ = restore_checkpoint(args.load_model, s, params,
                                              init_opt_state(params, tcfg))
    if args.quantize_embedding_with_bit < 32:
        from evstore_tpu.utils.checkpoint import quantize_embeddings
        params = quantize_embeddings(params, args.quantize_embedding_with_bit)
    if args.quantize_mlp_with_bit < 32:
        from evstore_tpu.utils.checkpoint import quantize_mlps
        params = quantize_mlps(params, args.quantize_mlp_with_bit)
    if args.ev_table_path and args.use_evstore:
        sm = StorageManager(args.emb_stor, precision=args.ev_precs,
                            dim=cfg.embedding_dim,
                            layout=args.emb_stor_layout)
        sm.load(bin_dir=args.ev_table_path,
                table_sizes=list(cfg.table_sizes))
    else:
        tables = [np.asarray(params.sparse[f"table_{t}"]["kind_plain"])
                  for t in range(cfg.num_tables)]
        sm = StorageManager("dummy", dim=cfg.embedding_dim).load(tables=tables)

    if not args.use_evstore:
        from evstore_tpu.train.train_loop import evaluate
        m = evaluate(params, cfg, make_test())
        print(f"inference done: {m}")
        return 0

    mesh = None
    if args.use_device_cache and args.mesh_model > 1:
        # shard the device-cache slots over the mesh (capacity scales with
        # chips); data axis unused for the host-driven lookup
        from evstore_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(max(args.mesh_data, 1), args.mesh_model)
    res = run_inference(
        params, cfg, ccfg, make_test(), sm,
        warmup_batches=make_test() if args.enable_warmup else None,
        ev_lookup_only=args.ev_lookup_only,
        trace_dir=(args.output_dir + "/trace"
                   if args.trace_inference_workload else None),
        cdf_path=args.write_cdf_file or None,
        use_native=(args.cache_algo == "native"
                    or args.cache_engine == "native"),
        use_device_cache=args.use_device_cache,
        mesh=mesh)
    print(f"inference done: metrics={res.metrics} "
          f"perfect_hits={res.cache_stats.get('perfect_hits')} "
          f"p99={res.latency.get('p99_s')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
