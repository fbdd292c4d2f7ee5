"""Criteo preprocessing + dataset pipeline (data_utils.py /
dlrm_data_pytorch.py semantics)."""

import numpy as np
import pytest

from evstore_tpu.data.criteo import (CriteoBinDataset, CriteoDataset,
                                     make_synthetic_criteo_txt,
                                     numpy_to_binary, preprocess_criteo)


@pytest.fixture(scope="module")
def processed(tmp_path_factory):
    d = tmp_path_factory.mktemp("criteo")
    txt = make_synthetic_criteo_txt(str(d / "train.txt"), n=700, seed=1)
    npz = preprocess_criteo(txt, str(d), days=7)
    return d, npz


def test_preprocess_shapes_and_dicts(processed):
    d, npz = processed
    z = np.load(npz)
    n = z["y"].shape[0]
    assert n == 700
    assert z["X_int"].shape == (n, 13)
    assert z["X_cat"].shape == (n, 26)
    # contiguous ids: every table's ids cover 0..count-1
    for t in range(26):
        ids = z["X_cat"][:, t]
        assert ids.min() == 0
        assert ids.max() == z["counts"][t] - 1
        assert len(np.unique(ids)) == z["counts"][t]
    # dense never negative (clamped)
    assert z["X_int"].min() >= 0
    # 7 day files exist
    assert len(list(d.glob("kaggle_day_*.npz"))) == 7


def test_day_split_semantics(processed):
    _, npz = processed
    ds = CriteoDataset.load(npz)
    (tr_lo, tr_hi), (te_lo, te_hi), (va_lo, va_hi) = ds.splits()
    assert tr_lo == 0 and tr_hi == te_lo and te_hi == va_lo
    assert va_hi == len(ds.y)
    # last day halved into test/val
    assert abs((te_hi - te_lo) - (va_hi - va_lo)) <= 1
    # train = 6 of 7 days
    assert tr_hi == ds.day_offsets[-2]


def test_batches_log1p_and_types(processed):
    _, npz = processed
    ds = CriteoDataset.load(npz)
    dense, idx, y = next(ds.batches("train", batch_size=32))
    assert dense.shape == (32, 13) and dense.dtype == np.float32
    assert idx.shape == (32, 26) and idx.dtype == np.int32
    assert y.shape == (32,) and y.dtype == np.float32
    # log1p of the stored ints
    np.testing.assert_allclose(dense[0],
                               np.log1p(ds.X_int[0].astype(np.float32)),
                               rtol=1e-6)


def test_max_ind_range_mod(processed):
    _, npz = processed
    ds = CriteoDataset.load(npz, max_ind_range=7)
    assert all(s <= 7 for s in ds.table_sizes)
    _, idx, _ = next(ds.batches("train", batch_size=64))
    assert idx.max() < 7


def test_fraction_reduces(processed):
    _, npz = processed
    ds = CriteoDataset.load(npz)
    full = sum(y.shape[0] for _, _, y in ds.batches("train", 32))
    frac = sum(y.shape[0] for _, _, y in ds.batches("train", 32, fraction=0.1))
    assert frac == max(1, int(full * 0.1))


def test_subsample_keeps_positives(tmp_path):
    txt = make_synthetic_criteo_txt(str(tmp_path / "t.txt"), n=500, seed=2)
    npz = preprocess_criteo(txt, str(tmp_path), days=5, sub_sample_rate=0.2)
    z = np.load(npz)
    full_y, _, _ = __import__("evstore_tpu.data.criteo", fromlist=["x"]
                              )._parse_tsv(txt)
    assert z["y"].sum() == full_y.sum()      # every positive kept
    assert len(z["y"]) < 500                 # negatives dropped


def test_binary_roundtrip(processed, tmp_path):
    _, npz = processed
    bin_path = numpy_to_binary(npz, str(tmp_path / "data.bin"))
    ds = CriteoDataset.load(npz)
    bds = CriteoBinDataset(bin_path, batch_size=100)
    n = 0
    for (d1, i1, y1) in bds:
        n += y1.shape[0]
    assert n == len(ds.y)
    d1, i1, y1 = next(iter(bds))
    np.testing.assert_array_equal(i1, ds.X_cat[:100])
    np.testing.assert_array_equal(y1, ds.y[:100].astype(np.float32))
    np.testing.assert_allclose(
        d1, np.log1p(ds.X_int[:100].astype(np.float32)), rtol=1e-6)


def test_training_on_criteo_pipeline(processed):
    """End-to-end: preprocess -> dataset -> train a tiny DLRM -> eval."""
    import jax
    from evstore_tpu.config import TrainConfig, make_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.train.train_loop import evaluate, train
    _, npz = processed
    ds = CriteoDataset.load(npz)
    cfg = make_dlrm_config(8, ds.table_sizes, (16,), (16,), num_dense=13)
    tcfg = TrainConfig(batch_size=32, learning_rate=0.1,
                       optimizer="rwsadagrad", print_freq=5)
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    params, _, hist = train(params, cfg, tcfg,
                            ds.batches("train", 32, drop_last=True),
                            log_fn=lambda *_: None)
    assert np.all(np.isfinite(hist["loss"]))
    m = evaluate(params, cfg, ds.batches("test", 32, drop_last=True))
    assert 0 <= m["accuracy"] <= 1


def test_native_parser_matches_python(tmp_path):
    """The C++ TSV parser (the cython/ preprocessing equivalent) must agree
    with the pure-Python parser byte-for-byte."""
    import shutil
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from evstore_tpu.data.criteo import _parse_tsv
    txt = make_synthetic_criteo_txt(str(tmp_path / "t.txt"), n=500, seed=9)
    a_native = _parse_tsv(txt, use_native=True)
    a_python = _parse_tsv(txt, use_native=False)
    for x, y in zip(a_native, a_python):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_unpack_records_device_matches_host(tmp_path):
    """Device-side record unpack (one packed h2d buffer per step) must
    reproduce CriteoBinDataset's host conversion exactly."""
    import numpy as np
    from evstore_tpu.data.criteo import (CriteoBinDataset, RECORD_INTS,
                                         unpack_records_device)
    rng = np.random.default_rng(3)
    rec = np.empty((64, RECORD_INTS), np.int32)
    rec[:, 0] = rng.integers(0, 2, 64)
    rec[:, 1:14] = rng.integers(-3, 1000, (64, 13))   # negatives clamp to 0
    rec[:, 14:] = rng.integers(0, 1 << 20, (64, 26))
    p = tmp_path / "r.bin"
    rec.tofile(p)
    for mir in (0, 1000):
        ds = CriteoBinDataset(str(p), batch_size=64, max_ind_range=mir)
        d_h, i_h, y_h = next(iter(ds))
        raw = next(ds.iter_raw())
        import jax.numpy as jnp
        d_d, i_d, y_d = unpack_records_device(jnp.asarray(raw),
                                              max_ind_range=mir)
        np.testing.assert_array_equal(np.asarray(y_d), y_h)
        np.testing.assert_allclose(np.asarray(d_d), d_h, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i_d), i_h)
