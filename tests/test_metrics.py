import numpy as np
import pytest

from evstore_tpu.train.metrics import average_precision, binary_metrics, roc_auc


def test_auc_perfect_and_random():
    labels = np.array([0, 0, 1, 1])
    assert roc_auc(np.array([0.1, 0.2, 0.8, 0.9]), labels) == 1.0
    assert roc_auc(np.array([0.9, 0.8, 0.2, 0.1]), labels) == 0.0
    np.testing.assert_allclose(
        roc_auc(np.array([0.5, 0.5, 0.5, 0.5]), labels), 0.5)


def test_auc_with_ties_matches_sklearn_if_available():
    rng = np.random.default_rng(0)
    scores = np.round(rng.random(500), 2)  # force ties
    labels = (rng.random(500) < 0.3).astype(int)
    ours = roc_auc(scores, labels)
    try:
        from sklearn.metrics import roc_auc_score
    except ImportError:
        pytest.skip("sklearn not available")
    np.testing.assert_allclose(ours, roc_auc_score(labels, scores), rtol=1e-10)


def test_ap_matches_sklearn_if_available():
    rng = np.random.default_rng(1)
    scores = rng.random(300)
    labels = (rng.random(300) < 0.4).astype(int)
    ours = average_precision(scores, labels)
    try:
        from sklearn.metrics import average_precision_score
    except ImportError:
        pytest.skip("sklearn not available")
    np.testing.assert_allclose(ours, average_precision_score(labels, scores),
                               rtol=1e-8)


def test_binary_metrics_block():
    scores = np.array([0.9, 0.8, 0.3, 0.2])
    labels = np.array([1, 0, 1, 0])
    m = binary_metrics(scores, labels)
    assert m["accuracy"] == 0.5
    assert m["recall"] == 0.5
    assert m["precision"] == 0.5
    np.testing.assert_allclose(m["f1"], 0.5)
    assert 0 <= m["auc"] <= 1
    assert set(m) == {"accuracy", "recall", "precision", "f1", "ap", "auc"}


def test_auc_degenerate():
    assert np.isnan(roc_auc(np.array([0.5, 0.6]), np.array([1, 1])))
