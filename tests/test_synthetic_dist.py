"""Synthetic sparse-index distributions (VERDICT r3 missing #5: the
gaussian mode of generate_dist_input_batch, dlrm_data_pytorch.py:1011-1068)."""

import numpy as np

from evstore_tpu.data.synthetic import RandomDataConfig, random_batches


def test_gaussian_indices_clip_and_center():
    cfg = RandomDataConfig(num_dense=2, table_sizes=(1000, 500),
                           batch_size=4096, num_batches=1, seed=0,
                           distribution="gaussian",
                           rand_data_min=100, rand_data_max=400,
                           rand_data_mu=-1, rand_data_sigma=30)
    dense, idx, _ = next(iter(random_batches(cfg)))
    assert idx.min() >= 100 and idx.max() <= 400
    # mu=-1 -> midpoint 250; sigma 30 -> sample mean within a few units
    assert abs(idx[:, 0].mean() - 250) < 5
    assert abs(idx[:, 1].mean() - 250) < 5


def test_gaussian_default_range_is_table():
    cfg = RandomDataConfig(num_dense=2, table_sizes=(50,), batch_size=2048,
                           num_batches=1, seed=1, distribution="gaussian",
                           rand_data_min=0, rand_data_max=-1,
                           rand_data_sigma=1000)  # wide -> hits the clip ends
    _, idx, _ = next(iter(random_batches(cfg)))
    assert idx.min() == 0 and idx.max() == 49


def test_gaussian_multihot_bag_dedup():
    # the reference np.unique's each bag; our static-shape version zeroes
    # the weights of repeated slots instead
    cfg = RandomDataConfig(num_dense=2, table_sizes=(20,), batch_size=64,
                           num_batches=1, seed=2, distribution="gaussian",
                           rand_data_sigma=2.0, num_indices_per_lookup=8,
                           num_indices_per_lookup_fixed=True)
    _, idx, bag_w, _ = next(iter(random_batches(cfg)))
    # narrow gaussian over 20 rows guarantees collisions
    assert bag_w.sum() < bag_w.size
    for b in range(idx.shape[0]):
        kept = idx[b, 0][bag_w[b, 0] > 0]
        assert len(np.unique(kept)) == len(kept)


def test_cli_maps_gaussian(tmp_path):
    from evstore_tpu.cli import build_parser, _make_data
    from evstore_tpu.config import tiny_dlrm_config
    args = build_parser().parse_args(
        ["--data-generation", "random", "--rand-data-dist", "gaussian",
         "--rand-data-min", "0", "--rand-data-max", "3",
         "--mini-batch-size", "32", "--num-batches", "2"])
    cfg = tiny_dlrm_config()
    train_fn, _ = _make_data(args, cfg)
    for _, idx, _ in train_fn():
        assert idx.max() <= 3
