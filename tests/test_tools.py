"""Offline tooling: alt-key generation, precision reduction, profiling."""

import numpy as np
import pytest

from evstore_tpu.tools.gen_altkeys import (generate_altkeys,
                                           workload_frequencies,
                                           write_altkeys_binary)
from evstore_tpu.tools.reduce_precision import (apply_preconditioning_add_x,
                                                reduce_tables)


@pytest.fixture
def tables(rng):
    return [rng.uniform(-0.9, 0.9, (30, 8)).astype(np.float32)
            for _ in range(3)]


def test_altkeys_nearest_neighbor(tables):
    # make row 5 of table 0 a near-duplicate of row 7 of table 1
    tables[1][7] = tables[0][5] + 1e-4
    alts = generate_altkeys(tables, n_neighbors=3)
    assert len(alts) == 3 and all(len(a) == 30 for a in alts)
    # altKey codec: (t+1) + 100*row
    ak = int(alts[0][5])
    assert ak == 2 + 100 * 7
    # reverse direction too
    assert int(alts[1][7]) == 1 + 100 * 5


def test_altkeys_popularity_pick(tables):
    freq = [np.zeros(30), np.zeros(30), np.zeros(30)]
    # make table2 row 3 hugely popular; it should win whenever it's among
    # the k neighbors
    freq[2][3] = 1e6
    alts = generate_altkeys(tables, workload_freq=freq, n_neighbors=89)
    popular = sum(int(a) == 3 + 100 * 3 for a in np.concatenate(alts))
    # with k spanning every other row, the popular row wins for all but itself
    assert popular == 89


def test_altkeys_binary_bigendian(tables, tmp_path):
    alts = generate_altkeys(tables, n_neighbors=2)
    paths = write_altkeys_binary(alts, str(tmp_path))
    raw = np.fromfile(paths[0], dtype=">u4")
    np.testing.assert_array_equal(raw, alts[0])
    # and the AltKeyResolver reads them back
    from evstore_tpu.cache.tiers import AltKeyResolver
    r = AltKeyResolver(bin_dir=str(tmp_path), table_sizes=[30, 30, 30])
    assert r([(0, 5)])[0] == int(alts[0][5])


def test_workload_frequencies(tmp_path, tables):
    d = tmp_path / "trace"
    d.mkdir()
    (d / "trace-table-1.csv").write_text("1\n1\n2\n")
    (d / "trace-table-2.csv").write_text("0\n")
    f = workload_frequencies(str(d), [30, 30, 30])
    assert f[0][1] == 2 and f[0][2] == 1 and f[1][0] == 1
    assert f[2].sum() == 0


def test_reduce_precision_pipeline(tables, tmp_path):
    from evstore_tpu.cache.storage import (FileStore, write_ev_tables_binary)
    src = tmp_path / "ev32"
    dst = tmp_path / "ev8"
    write_ev_tables_binary(tables, str(src), 32)
    reduce_tables(str(src), str(dst), [30, 30, 30], 8, new_precision=8)
    fs = FileStore(str(dst), [30, 30, 30], 8, precision=8)
    got = fs.get(1, 3)
    assert np.max(np.abs(got - tables[1][3])) < 0.01
    fs.close()


def test_preconditioning_add(tables, tmp_path):
    from evstore_tpu.cache.storage import write_ev_tables_binary, FileStore
    src = tmp_path / "a"
    dst = tmp_path / "b"
    write_ev_tables_binary(tables, str(src), 32)
    apply_preconditioning_add_x(str(src), str(dst), [30, 30, 30], 8, 0.05)
    fs = FileStore(str(dst), [30, 30, 30], 8)
    np.testing.assert_allclose(fs.get(0, 0), tables[0][0] + 0.05, rtol=1e-5)
    fs.close()


def test_reduce_precision_cli(tables, tmp_path):
    from evstore_tpu.cache.storage import write_ev_tables_binary
    from evstore_tpu.tools.reduce_precision import main
    src = tmp_path / "ev32"
    write_ev_tables_binary(tables, str(src), 32)
    rc = main(["--in-dir", str(src), "--out-dir", str(tmp_path / "ev4"),
               "--table-sizes", "30-30-30", "--dim", "8",
               "--new-precision", "4"])
    assert rc == 0
    assert (tmp_path / "ev4" / "ev-table-1.bin").exists()


def test_profiling_helpers(tmp_path):
    import jax.numpy as jnp
    from evstore_tpu.utils.profiling import StepTimer, profile_trace, span
    t = StepTimer()
    t.start()
    x = jnp.ones(8) * 2
    t.stop(x)
    assert t.mean_ms() >= 0
    with span("test_span"):
        pass
    with profile_trace(str(tmp_path / "prof"), enabled=False):
        pass


def test_plot_cdf_tool(tmp_path):
    """plot_cdf renders a PNG (or ASCII fallback) from LatencyRecorder CSVs
    (≙ script/plot_cdf.py)."""
    from evstore_tpu.tools.plot_cdf import main, read_cdf
    from evstore_tpu.utils.trace import LatencyRecorder

    lat = LatencyRecorder()
    for i in range(200):
        lat.record(0.001 + (i % 37) * 1e-5)
    p = tmp_path / "cdf.csv"
    lat.write_cdf(str(p))
    lats, qs = read_cdf(str(p))
    assert len(lats) == len(qs) > 10
    assert qs[-1] == 1.0
    rc = main([str(p), "--out", str(tmp_path / "cdf.png")])
    assert rc == 0


def test_visualize_analyses(rng):
    """Projection / count / cluster / calibration analyses (≙ reference
    tools/visualize.py: UMAP-or-fallback projections, categorical count
    analysis, HDBSCAN clustering, analyze_model_data:856)."""
    from evstore_tpu.tools import visualize as V

    # two well-separated blobs: PCA fallback + density clustering find them
    blob = np.concatenate([rng.normal(0, 0.1, (60, 8)),
                           rng.normal(5, 0.1, (60, 8))]).astype(np.float32)
    pts = V.project_embeddings(blob, method="pca")
    assert pts.shape == (120, 2)
    labels = V.density_cluster(blob, min_cluster_size=10)
    summ = V.cluster_summary(labels)
    assert summ["n_clusters"] >= 2

    # zipfian counts: heavier tail -> larger fitted alpha
    heavy = rng.zipf(2.0, 5000) % 100
    light = rng.integers(0, 100, 5000)
    idx = np.stack([heavy, light], axis=1)
    cc = V.categorical_counts(idx, [100, 100])
    assert cc[0]["zipf_alpha"] > cc[1]["zipf_alpha"]
    assert cc[0]["rows_for_90pct"] < cc[1]["rows_for_90pct"]

    scores = rng.uniform(0, 1, 120)
    y = (rng.uniform(0, 1, 120) < scores).astype(np.float32)
    rep = V.analyze_model_data(scores, y, features=blob)
    assert rep["calibration"]["ece"] < 0.2
    assert "clusters" in rep and rep["score_stats"]["pos_mean"] > \
        rep["score_stats"]["neg_mean"]

    stats = V.embedding_norm_stats(blob)
    assert stats["max"] >= stats["p99"] >= stats["p50"] >= stats["min"]
    nb = V.neighbor_similarity(blob, sample=40)
    assert nb["nn1_mean"] < nb["row_distance_scale"]


def test_visualize_cli(tmp_path, rng):
    """End-to-end CLI over an EV-table .bin export + a traced workload."""
    from evstore_tpu.cache.storage import write_ev_tables_binary
    from evstore_tpu.tools.visualize import main

    sizes = [40, 30]
    tabs = [rng.normal(size=(s, 8)).astype(np.float32) for s in sizes]
    write_ev_tables_binary(tabs, str(tmp_path))
    idx = np.stack([rng.integers(0, 40, 500), rng.integers(0, 30, 500)], 1)
    scores = rng.uniform(0, 1, 500)
    labs = (scores > 0.5).astype(np.float32)
    np.savez(tmp_path / "trace.npz", idx=idx, scores=scores, labels=labs)

    rc = main(["--ev-table-path", str(tmp_path), "--dim", "8",
               "--table-sizes", "40-30", "--project", "pca",
               "--trace-npz", str(tmp_path / "trace.npz"),
               "--out-dir", str(tmp_path / "out"), "--sample", "40"])
    assert rc == 0
    import json
    rep = json.loads((tmp_path / "out" / "report.json").read_text())
    assert "norms" in rep and "categorical" in rep and "model" in rep
    assert (tmp_path / "out" / "table0_projection.png").exists()
    assert (tmp_path / "out" / "count_ranks.png").exists()
    assert (tmp_path / "out" / "calibration.png").exists()


def test_hlo_collective_bytes_tuple_shapes():
    """Round-5 regression: tuple-shaped collectives (incl. >=6-element
    tuples whose `/*index=5*/` comments broke the old parser's bridge
    regex) must have EVERY element counted; `-done` forms and
    get-tuple-element lines must not double-count."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from exchange_bytes import hlo_collective_bytes

    hlo = "\n".join([
        # plain collective: 26*128*36*4 = 479232 B
        '  %a2a = f32[26,128,36]{2,1,0} all-to-all(%x), dimensions={0}',
        # 6-element tuple with /*index=5*/ comment: 6 * 64 * 4 = 1536 B
        '  %ar = (f32[64]{0}, f32[64]{0}, f32[64]{0}, f32[64]{0}, '
        'f32[64]{0}, /*index=5*/f32[64]{0}) all-reduce(%a, %b, %c, %d, '
        '%e, %f), to_apply=%add',
        # consumers of the tuple must not count
        '  %gte = f32[64]{0} get-tuple-element(%ar), index=0',
        # async pair: -start counts (bf16[128]=256 B), -done does not
        '  %ags = bf16[128]{0} all-gather-start(%y), dimensions={0}',
        '  %agd = bf16[128]{0} all-gather-done(%ags)',
    ])
    out = hlo_collective_bytes(hlo)
    assert out["all-to-all"] == 26 * 128 * 36 * 4
    assert out["all-reduce"] == 6 * 64 * 4
    assert out["all-gather"] == 128 * 2
    assert out["total"] == out["all-to-all"] + out["all-reduce"] + \
        out["all-gather"]


def test_mlperf_residency_report(tmp_path):
    """MLPerf-shape rehearsal helpers (scripts/mlperf_rehearsal.py): the
    residency math must show the five 40M-row tables each exceeding a
    16 GB chip, and sparse table files must occupy their full virtual
    size while consuming ~no disk."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from mlperf_rehearsal import gen_sparse_tables, residency_report
    from evstore_tpu.config import mlperf_dlrm_config

    sizes = list(mlperf_dlrm_config().table_sizes)
    r = residency_report(sizes, 128, 16.0)
    tiered = r["tables_requiring_tier"]
    assert len(tiered) == 5
    assert all(d["rows"] == 40_000_000 for d in tiered)
    assert all(d["gb_fp32"] > 16.0 for d in tiered)   # each alone > chip
    assert r["chips_for_full_residency_fp32"] >= 8
    assert r["resident_tables"] == len(sizes) - 5

    small = [100, 50]
    gb = gen_sparse_tables(str(tmp_path), small, 4)
    assert gb == (150 * 4 * 4) / 1e9
    p = tmp_path / "ev-table-1.bin"
    assert p.stat().st_size == 100 * 4 * 4
    st = os.stat(p)
    assert st.st_blocks * 512 < 100 * 4 * 4  # sparse: blocks < virtual
