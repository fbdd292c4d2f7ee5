"""Tier-quality fixture (VERDICT r3 weak #5): the synthetic workload must
reach exact-rows AUC >= 0.75 (the reference anchors its claims at ~0.80,
experiments.md:959-981) and the tier ablation deltas must stay bounded
at that operating point."""

import shutil

import numpy as np
import pytest

from evstore_tpu.config import CacheConfig
from evstore_tpu.data.synthetic import quality_fixture
from evstore_tpu.train.metrics import binary_metrics

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")

SIZES = [1460, 583, 2173, 3194, 1000, 700, 900, 1100] * 2  # 16 tables
DIM = 12


@pytest.fixture(scope="module")
def fixture():
    return quality_fixture(SIZES, dim=DIM, batch_size=256, num_batches=40,
                           seed=1)


def _run(fixture, n_layers, main_p, sec_p, with_c3, total=2000):
    from evstore_tpu.native import NativeTieredCache
    tables, altkeys, batches, labels, score_fn = fixture
    ccfg = CacheConfig(policy="evlfu", n_caching_layers=n_layers,
                       total_size=total, main_precision=main_p,
                       secondary_precision=sec_p,
                       size_proportion=(48, 48, 4))
    nc = NativeTieredCache(ccfg, len(SIZES), DIM)
    nc.borrow_tables(tables)
    if with_c3:
        nc.load_altkeys(altkeys)
    scores = np.concatenate([score_fn(nc.request_batch(idx))
                             for idx in batches])
    st = nc.stats()
    nc.close()
    return binary_metrics(1 / (1 + np.exp(-scores)), labels)["auc"], st


def test_exact_rows_auc_above_bar(fixture):
    tables, altkeys, batches, labels, score_fn = fixture
    scores = np.concatenate([
        score_fn(np.stack([tables[t][idx[:, t]] for t in range(len(SIZES))],
                          axis=1)) for idx in batches])
    auc = binary_metrics(1 / (1 + np.exp(-scores)), labels)["auc"]
    assert auc >= 0.75, auc


def test_tier_quality_deltas_bounded(fixture):
    tables, altkeys, batches, labels, score_fn = fixture
    scores = np.concatenate([
        score_fn(np.stack([tables[t][idx[:, t]] for t in range(len(SIZES))],
                          axis=1)) for idx in batches])
    auc_exact = binary_metrics(1 / (1 + np.exp(-scores)), labels)["auc"]

    auc_fp32, st = _run(fixture, 1, 32, 8, False)
    assert st["c1"]["hit_rate"] < 0.999      # RAM-limited regime is real
    np.testing.assert_allclose(auc_fp32, auc_exact, atol=1e-9)

    auc_i8, _ = _run(fixture, 1, 8, 4, False)
    assert abs(auc_i8 - auc_exact) < 2e-3, auc_i8

    auc_c3, st3 = _run(fixture, 3, 8, 4, True)
    assert st3["c3"]["hits"] > 0             # C3 actually serving
    assert abs(auc_c3 - auc_exact) < 5e-2, auc_c3
    # ordering: more approximation, no better quality
    assert auc_c3 <= auc_i8 + 1e-6
