"""Embedding / model-output analysis and visualization.

Reference: tools/visualize.py (1030 LoC) — UMAP/t-SNE projections of
embedding tables, categorical count analysis, HDBSCAN clustering of model
outputs.  Those libraries aren't in the TPU image, so the core analyses are
implemented dependency-free (PCA projection, per-table count/frequency
analysis, k-means clustering); UMAP/t-SNE are used when importable.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def pca_project(rows: np.ndarray, n_components: int = 2,
                center: bool = True) -> np.ndarray:
    """[N, D] -> [N, n_components] principal-component projection."""
    x = np.asarray(rows, np.float64)
    if center:
        x = x - x.mean(axis=0, keepdims=True)
    # SVD on the covariance-free thin form
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return (x @ vt[:n_components].T).astype(np.float32)


def project_embeddings(rows: np.ndarray, method: str = "auto",
                       n_components: int = 2, seed: int = 0) -> np.ndarray:
    """umap | tsne | pca | auto (best available) — visualize.py's
    visualize_embeddings_umap equivalent."""
    if method in ("umap", "auto"):
        try:
            import umap
            return umap.UMAP(n_components=n_components,
                             random_state=seed).fit_transform(rows)
        except ImportError:
            if method == "umap":
                raise
    if method in ("tsne",):
        try:
            from sklearn.manifold import TSNE
            return TSNE(n_components=n_components,
                        random_state=seed).fit_transform(rows)
        except ImportError:
            raise
    return pca_project(rows, n_components)


def categorical_counts(idx: np.ndarray, table_sizes: Sequence[int]
                       ) -> List[Dict[str, float]]:
    """Per-table access statistics over a [N, T] index log
    (visualize.py's analyze-categorical-counts)."""
    out = []
    for t, n in enumerate(table_sizes):
        col = idx[:, t]
        uniq, counts = np.unique(col, return_counts=True)
        sorted_counts = np.sort(counts)[::-1]
        csum = np.cumsum(sorted_counts) / max(col.size, 1)
        out.append({
            "table": t,
            "rows": int(n),
            "distinct_accessed": int(len(uniq)),
            "coverage": len(uniq) / max(n, 1),
            "top1_share": float(sorted_counts[0] / col.size) if col.size else 0,
            "rows_for_50pct": int(np.searchsorted(csum, 0.5) + 1),
            "rows_for_90pct": int(np.searchsorted(csum, 0.9) + 1),
        })
    return out


def kmeans(x: np.ndarray, k: int, n_iter: int = 50, seed: int = 0
           ) -> np.ndarray:
    """Plain Lloyd's k-means labels (the HDBSCAN-clustering stand-in)."""
    rng = np.random.default_rng(seed)
    x = np.asarray(x, np.float64)
    centers = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    labels = np.zeros(len(x), np.int32)
    for _ in range(n_iter):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        new_labels = d.argmin(axis=1).astype(np.int32)
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
        for c in range(len(centers)):
            m = labels == c
            if m.any():
                centers[c] = x[m].mean(axis=0)
    return labels


def analyze_model_outputs(scores: np.ndarray, labels: np.ndarray,
                          n_bins: int = 20) -> Dict:
    """Score-distribution/calibration analysis (analyze_model_data
    equivalent): per-bin positive rate vs mean score."""
    scores = np.asarray(scores).ravel()
    labels = np.asarray(labels).ravel()
    edges = np.linspace(0, 1, n_bins + 1)
    binid = np.clip(np.digitize(scores, edges) - 1, 0, n_bins - 1)
    rows = []
    for b in range(n_bins):
        m = binid == b
        if m.sum() == 0:
            continue
        rows.append({"bin": b, "n": int(m.sum()),
                     "mean_score": float(scores[m].mean()),
                     "positive_rate": float(labels[m].mean())})
    ece = sum(r["n"] * abs(r["mean_score"] - r["positive_rate"])
              for r in rows) / max(len(scores), 1)
    return {"bins": rows, "ece": float(ece)}
