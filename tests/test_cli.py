"""CLI flag-parity tests (reference flags -> configs -> runs)."""

import numpy as np
import pytest

from evstore_tpu.cli import build_parser, configs_from_args, main


def test_kaggle_flags_map_to_config():
    argv = ("--arch-sparse-feature-size 36 "
            "--arch-embedding-size 100-200-300 "
            "--arch-mlp-bot 13-512-256-64-36 --arch-mlp-top 512-256-1 "
            "--mini-batch-size 128 --learning-rate 0.1 "
            "--optimizer rwsadagrad --loss-function bce").split()
    args = build_parser().parse_args(argv)
    cfg, tcfg, ccfg = configs_from_args(args)
    assert cfg.embedding_dim == 36
    assert cfg.table_sizes == (100, 200, 300)
    assert cfg.mlp_bot == (13, 512, 256, 64, 36)
    # top input derived from interaction: 36 + C(4,2)=6 -> 42
    assert cfg.mlp_top == (42, 512, 256, 1)
    assert tcfg.learning_rate == 0.1 and tcfg.optimizer == "rwsadagrad"


def test_max_ind_range_caps_tables():
    argv = ("--arch-sparse-feature-size 4 --arch-embedding-size 100-2000 "
            "--arch-mlp-bot 4-4 --arch-mlp-top 8-1 "
            "--max-ind-range 500").split()
    cfg, _, _ = configs_from_args(build_parser().parse_args(argv))
    assert cfg.table_sizes == (100, 500)


def test_evstore_flags():
    argv = ("--use-evstore True --cache-algo evlfu --emb-cache-size 1000 "
            "--n-caching-layers 3 --main-precision 8 "
            "--secondary-precision 4 --size-proportion 48-48-4 "
            "--emb-stor mmap").split()
    _, _, ccfg = configs_from_args(build_parser().parse_args(argv))
    assert ccfg.total_size == 1000 and ccfg.n_caching_layers == 3
    assert ccfg.main_precision == 8 and ccfg.secondary_precision == 4
    assert ccfg.storage_backend == "mmap"


def test_cli_train_random_end_to_end(capsys):
    rc = main(("--arch-sparse-feature-size 4 --arch-embedding-size 40-30 "
               "--arch-mlp-bot 4-8-4 --arch-mlp-top 8-1 "
               "--mini-batch-size 16 --num-batches 10 --print-freq 5 "
               "--learning-rate 0.1 --optimizer sgd").split())
    assert rc == 0
    assert "training done" in capsys.readouterr().out


def test_cli_evstore_inference_end_to_end(capsys, tmp_path):
    rc = main(("--inference-only --use-evstore True "
               "--arch-sparse-feature-size 4 --arch-embedding-size 40-30 "
               "--arch-mlp-bot 4-8-4 --arch-mlp-top 8-1 "
               "--mini-batch-size 8 --num-batches 6 --nbatches-test 6 "
               "--data-generation synthetic "
               "--cache-algo evlfu --emb-cache-size 50 "
               f"--write-cdf-file {tmp_path}/cdf.csv").split())
    assert rc == 0
    out = capsys.readouterr().out
    assert "inference done" in out and "perfect_hits" in out
    assert (tmp_path / "cdf.csv").exists()


def test_cli_plain_inference(capsys):
    rc = main(("--inference-only "
               "--arch-sparse-feature-size 4 --arch-embedding-size 40-30 "
               "--arch-mlp-bot 4-8-4 --arch-mlp-top 8-1 "
               "--mini-batch-size 8 --nbatches-test 5").split())
    assert rc == 0
    assert "inference done" in capsys.readouterr().out


def test_cli_train_sharded_mesh(capsys):
    """--mesh-data/--mesh-model route training through the SPMD sharded step
    (8-virtual-device CPU mesh from conftest)."""
    rc = main(("--arch-sparse-feature-size 4 --arch-embedding-size 40-30 "
               "--arch-mlp-bot 4-8-4 --arch-mlp-top 8-1 "
               "--mini-batch-size 16 --num-batches 8 --print-freq 4 "
               "--mesh-data 2 --mesh-model 4 --dedup-exchange True "
               "--learning-rate 0.1 --optimizer rwsadagrad").split())
    assert rc == 0
    assert "training done" in capsys.readouterr().out


def test_cli_train_butterfly_alltoall(capsys):
    """--alltoall-impl butterfly routes training through the table-wise
    lax.all_to_all exchange (≙ DLRM_ALLTOALL_IMPL=alltoall), including eval
    + EV export from the reconstructed table stack."""
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        rc = main(("--arch-sparse-feature-size 4 --arch-embedding-size "
                   "40-40-30-30 --arch-mlp-bot 4-8-4 --arch-mlp-top 8-1 "
                   "--mini-batch-size 16 --num-batches 8 --print-freq 4 "
                   "--nbatches-test 4 --test-freq 4 "
                   "--mesh-data 8 --alltoall-impl butterfly "
                   "--dedup-exchange True "
                   f"--ev-table-path {d} "
                   "--learning-rate 0.1 --optimizer rwsadagrad").split())
        assert rc == 0
        assert os.path.exists(os.path.join(d, "ev-table-1.bin"))
    out = capsys.readouterr().out
    assert "training done" in out and "eval @" in out


def test_cli_sharded_device_cache_inference(capsys):
    """--use-device-cache + --mesh-model shards the HBM cache over the
    virtual 8-device mesh end-to-end through the CLI."""
    rc = main(("--inference-only --use-evstore True --use-device-cache True "
               "--arch-sparse-feature-size 4 --arch-embedding-size 40-30 "
               "--arch-mlp-bot 4-8-4 --arch-mlp-top 8-1 "
               "--mini-batch-size 8 --nbatches-test 6 "
               "--data-generation synthetic --mesh-data 1 --mesh-model 8 "
               "--cache-algo evlfu --emb-cache-size 64").split())
    assert rc == 0
    assert "inference done" in capsys.readouterr().out


def test_cli_cached_training_end_to_end(capsys):
    """--use-evstore during TRAINING routes through the HBM-bounded cached
    trainer (the reference forbids this combination)."""
    rc = main(("--use-evstore True "
               "--arch-sparse-feature-size 4 --arch-embedding-size 40-30 "
               "--arch-mlp-bot 4-8-4 --arch-mlp-top 8-1 "
               "--mini-batch-size 16 --num-batches 10 --print-freq 5 "
               "--emb-cache-size 30 "
               "--learning-rate 0.1 --optimizer rwsadagrad").split())
    assert rc == 0
    assert "training done" in capsys.readouterr().out


def test_cli_cached_training_sharded(capsys):
    """Cached training with the working set sharded over the virtual mesh."""
    rc = main(("--use-evstore True "
               "--arch-sparse-feature-size 4 --arch-embedding-size 40-30 "
               "--arch-mlp-bot 4-8-4 --arch-mlp-top 8-1 "
               "--mini-batch-size 16 --num-batches 8 --print-freq 4 "
               "--emb-cache-size 32 --mesh-data 2 --mesh-model 4 "
               "--learning-rate 0.1 --optimizer rwsadagrad").split())
    assert rc == 0
    assert "training done" in capsys.readouterr().out


ARCH = ("--arch-sparse-feature-size 4 --arch-embedding-size A "
        "--arch-mlp-bot 13-8-4 --arch-mlp-top 14-1 "
        "--mini-batch-size 32 --print-freq 4 --optimizer sgd "
        "--learning-rate 0.1")


def _dataset_argv(tmp_path, n=600, vocab=40):
    """A synthetic raw TSV + its in-RAM preprocessing, with matching arch."""
    from evstore_tpu.data.criteo import (make_synthetic_criteo_txt,
                                         preprocess_criteo)
    txt = make_synthetic_criteo_txt(str(tmp_path / "train.txt"), n=n,
                                    seed=11, vocab=vocab)
    npz = preprocess_criteo(txt, str(tmp_path / "proc"), days=3)
    counts = np.load(npz)["counts"]
    arch = ARCH.replace("A", "-".join(str(c) for c in counts))
    return txt, npz, arch


def test_cli_mlperf_bin_loader(capsys, tmp_path):
    """--mlperf-bin-loader consumes packed int32 records
    (≙ dlrm_s_pytorch.py:1164-1192)."""
    from evstore_tpu.data.criteo import numpy_to_binary
    _, npz, arch = _dataset_argv(tmp_path)
    bin_path = numpy_to_binary(npz, str(tmp_path / "data.bin"))
    rc = main((arch + " --data-generation dataset --mlperf-bin-loader "
               f"--processed-data-file {bin_path} "
               "--nbatches-test 2 --nepochs 1").split())
    assert rc == 0
    assert "training done" in capsys.readouterr().out


def test_cli_raw_data_file_preprocesses_on_demand(capsys, tmp_path):
    """--raw-data-file with no processed file triggers preprocessing
    (≙ dlrm_data_pytorch.py:53-120)."""
    from evstore_tpu.data.criteo import make_synthetic_criteo_txt
    txt = make_synthetic_criteo_txt(str(tmp_path / "raw.txt"), n=600,
                                    seed=11, vocab=40)
    # counts are not known up front; use vocab-sized tables (>= real counts,
    # ids stay in range because counts <= vocab)
    arch = ARCH.replace("A", "-".join(["41"] * 26))
    rc = main((arch + " --data-generation dataset "
               f"--raw-data-file {txt} "
               f"--output-dir {tmp_path / 'out'}").split())
    assert rc == 0
    assert "training done" in capsys.readouterr().out
    import os
    assert os.path.exists(tmp_path / "out" / "processed")


def test_cli_memory_map_streaming(capsys, tmp_path):
    """--memory-map routes through the streaming preprocessing + memmap
    dataset (bounded RSS)."""
    from evstore_tpu.data.criteo import make_synthetic_criteo_txt
    txt = make_synthetic_criteo_txt(str(tmp_path / "raw.txt"), n=600,
                                    seed=11, vocab=40)
    arch = ARCH.replace("A", "-".join(["41"] * 26))
    rc = main((arch + " --data-generation dataset --memory-map "
               f"--raw-data-file {txt} "
               f"--output-dir {tmp_path / 'out'}").split())
    assert rc == 0
    assert "training done" in capsys.readouterr().out
    import glob
    assert glob.glob(str(tmp_path / "out" / "processed" / "*_stream.bin"))


def test_cli_enable_profiling(capsys, tmp_path):
    """--enable-profiling captures a jax trace around the run
    (≙ dlrm_s_pytorch.py:1567-1569)."""
    rc = main(("--arch-sparse-feature-size 4 --arch-embedding-size 40-30 "
               "--arch-mlp-bot 4-8-4 --arch-mlp-top 8-1 "
               "--mini-batch-size 16 --num-batches 6 --print-freq 3 "
               "--enable-profiling "
               f"--output-dir {tmp_path / 'out'}").split())
    assert rc == 0
    import glob
    assert glob.glob(str(tmp_path / "out" / "profile" / "**" / "*"),
                     recursive=True), "no trace artifacts written"


def test_cli_mlperf_logging(capsys):
    rc = main(("--arch-sparse-feature-size 4 --arch-embedding-size 40-30 "
               "--arch-mlp-bot 4-8-4 --arch-mlp-top 8-1 "
               "--mini-batch-size 16 --num-batches 4 --print-freq 2 "
               "--mlperf-logging").split())
    assert rc == 0
    out = capsys.readouterr().out
    assert ":::MLLOG" in out and "submission_platform" in out
