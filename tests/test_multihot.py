"""Multi-hot (bag size > 1) embedding lookups.

Reference: apply_emb drives torch.nn.EmbeddingBag(mode="sum") with ragged
offsets and optional per-sample weights (dlrm_s_pytorch.py:407-459); the
random generator draws a variable number of unique indices per (sample,
table) up to --num-indices-per-lookup (dlrm_data_pytorch.py:1062-1120).

TPU-first re-expression: static max bag size L, idx [B, T, L] + bag_weights
[B, T, L] with 0-weight padding (exact for sum pooling).  Parity here is
proved directly against torch.nn.EmbeddingBag.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evstore_tpu.config import TrainConfig, make_dlrm_config
from evstore_tpu.models.dlrm import dlrm_forward
from evstore_tpu.models.embedding import pool_bags, sparse_arch_lookup
from evstore_tpu.train.train_loop import (evaluate, init_opt_state,
                                          make_train_step, unpack_batch)


def _cfg(**kw):
    return make_dlrm_config(8, (50, 35, 20), (16, 8), (12,), num_dense=6,
                            compute_dtype="float32", **kw)


def _multihot_batch(cfg, B=16, L=4, seed=0, variable=True):
    rng = np.random.default_rng(seed)
    dense = rng.random((B, cfg.num_dense_features)).astype(np.float32)
    T = cfg.num_tables
    idx = np.stack([rng.integers(0, s, (B, L)) for s in cfg.table_sizes],
                   axis=1).astype(np.int32)
    if variable:
        sz = rng.integers(1, L + 1, (B, T))
        w = (np.arange(L)[None, None, :] < sz[..., None]).astype(np.float32)
    else:
        w = np.ones((B, T, L), np.float32)
    y = rng.integers(0, 2, B).astype(np.float32)
    return dense, idx, w, y


def test_pool_bags_matches_embeddingbag():
    """sparse_arch_lookup([B,T,L], weights) ≡ torch EmbeddingBag(mode='sum',
    per_sample_weights) with ragged offsets."""
    torch = pytest.importorskip("torch")
    cfg = _cfg()
    params_key = jax.random.PRNGKey(0)
    from evstore_tpu.models.dlrm import init_dlrm
    params = init_dlrm(params_key, cfg)
    B, L = 16, 4
    dense, idx, w, _ = _multihot_batch(cfg, B=B, L=L, seed=3)

    ours = np.asarray(sparse_arch_lookup(params.sparse, jnp.asarray(idx), cfg,
                                         jnp.asarray(w)))
    for t in range(cfg.num_tables):
        tab = np.asarray(params.sparse[f"table_{t}"]["kind_plain"], np.float32)
        eb = torch.nn.EmbeddingBag(tab.shape[0], tab.shape[1], mode="sum")
        with torch.no_grad():
            eb.weight.copy_(torch.from_numpy(tab.copy()))
        # ragged flatten: keep only weight>0 entries, offsets per sample
        flat_ids, flat_w, offsets = [], [], []
        for b in range(B):
            offsets.append(len(flat_ids))
            keep = w[b, t] > 0
            flat_ids.extend(idx[b, t][keep].tolist())
            flat_w.extend(w[b, t][keep].tolist())
        out = eb(torch.tensor(flat_ids, dtype=torch.int64),
                 torch.tensor(offsets, dtype=torch.int64),
                 per_sample_weights=torch.tensor(flat_w)).detach().numpy()
        np.testing.assert_allclose(ours[:, t], out, rtol=1e-5, atol=1e-6,
                                   err_msg=f"table_{t}")


def test_multihot_train_step_matches_torch():
    """One SGD step with bags: pooled forward + coalesced row grads must
    match a torch EmbeddingBag model end-to-end."""
    torch = pytest.importorskip("torch")
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=16, learning_rate=0.25, optimizer="sgd")
    from evstore_tpu.models.dlrm import init_dlrm
    params = init_dlrm(jax.random.PRNGKey(1), cfg)
    B, L = 16, 3
    rng = np.random.default_rng(5)
    dense = rng.random((B, cfg.num_dense_features)).astype(np.float32)
    # duplicate-heavy ids ACROSS bags: coalescing must match autograd
    idx = np.stack([rng.integers(0, min(s, 5), (B, L))
                    for s in cfg.table_sizes], axis=1).astype(np.int32)
    sz = rng.integers(1, L + 1, (B, cfg.num_tables))
    w = (np.arange(L)[None, None, :] < sz[..., None]).astype(np.float32)
    y = rng.integers(0, 2, B).astype(np.float32)

    step = jax.jit(make_train_step(cfg, tcfg))
    p1, _, loss_jax = step(params, init_opt_state(params, tcfg),
                           jnp.asarray(dense), jnp.asarray(idx),
                           jnp.asarray(y), jnp.asarray(w))

    # torch twin with EmbeddingBag pooling
    from tests.test_torch_crosscheck import TorchDLRM
    tm = TorchDLRM(params, cfg)

    def fwd(dense_t, idx_np, w_np):
        x = tm.bot(dense_t)
        ly = []
        for t in range(cfg.num_tables):
            rows = tm.embs[t](torch.from_numpy(
                idx_np[:, t].astype(np.int64)))      # [B, L, D]
            wt = torch.from_numpy(w_np[:, t])        # [B, L]
            ly.append((rows * wt.unsqueeze(-1)).sum(dim=1))
        feats = torch.stack([x] + ly, dim=1)
        gram = torch.bmm(feats, feats.transpose(1, 2))
        li, lj = np.tril_indices(feats.shape[1], k=-1)
        flat = gram[:, torch.from_numpy(li), torch.from_numpy(lj)]
        return tm.top(torch.cat([x, flat], dim=1))[:, 0]

    logits = fwd(torch.from_numpy(dense), idx, w)
    loss = torch.nn.BCEWithLogitsLoss()(logits, torch.from_numpy(y))
    loss.backward()
    with torch.no_grad():
        for p in tm.parameters():
            p -= tcfg.learning_rate * p.grad
    np.testing.assert_allclose(float(loss_jax), float(loss), rtol=1e-5)
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(
            np.asarray(p1.sparse[f"table_{t}"]["kind_plain"]),
            tm.embs[t].weight.detach().numpy(),
            rtol=1e-4, atol=1e-6, err_msg=f"table_{t}")


def test_multihot_sharded_matches_single_device():
    """The psum-exchange SPMD step with bags reproduces the single-device
    step (pooling commutes with the exchange)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 (virtual) devices")
    from evstore_tpu.parallel.mesh import make_mesh
    from evstore_tpu.parallel.sharded import (make_sharded_train_step,
                                              shard_dlrm_params)
    from evstore_tpu.models.dlrm import init_dlrm

    cfg = _cfg()
    B, L = 16, 3
    tcfg = TrainConfig(batch_size=B, learning_rate=0.2, optimizer="rwsadagrad")
    dense, idx, w, y = _multihot_batch(cfg, B=B, L=L, seed=7)

    params = init_dlrm(jax.random.PRNGKey(2), cfg)
    opt = init_opt_state(params, tcfg)
    ref_step = jax.jit(make_train_step(cfg, tcfg))
    p_ref, _, loss_ref = ref_step(params, opt, jnp.asarray(dense),
                                  jnp.asarray(idx), jnp.asarray(y),
                                  jnp.asarray(w))

    mesh = make_mesh(len(jax.devices()) // 2, 2)
    params2 = init_dlrm(jax.random.PRNGKey(2), cfg)
    opt2 = init_opt_state(params2, tcfg)
    params2, opt2, _, _ = shard_dlrm_params(params2, mesh, opt2)
    step = make_sharded_train_step(cfg, tcfg, mesh, B,
                                   multihot=True)(params2, opt2)
    p_sh, _, loss_sh = step(params2, opt2, jnp.asarray(dense),
                            jnp.asarray(idx), jnp.asarray(y), jnp.asarray(w))
    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=1e-5)
    for t in range(cfg.num_tables):
        ref_tab = np.asarray(p_ref.sparse[f"table_{t}"]["kind_plain"])
        sh_tab = np.asarray(p_sh.sparse[f"table_{t}"]["kind_plain"])
        np.testing.assert_allclose(ref_tab, sh_tab[:ref_tab.shape[0]],
                                   rtol=1e-4, atol=1e-6, err_msg=f"table_{t}")


def test_synthetic_multihot_generator():
    from evstore_tpu.data.synthetic import RandomDataConfig, random_batches
    cfg = _cfg()
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=8,
                            num_batches=3, num_indices_per_lookup=4)
    batches = list(random_batches(dcfg))
    assert len(batches) == 3
    for b in batches:
        dense, idx, y, w = unpack_batch(b)
        assert idx.shape == (8, cfg.num_tables, 4)
        assert w.shape == idx.shape
        # every bag has at least one real entry; padding is a suffix
        assert (w[:, :, 0] == 1).all()
        assert ((np.diff(w, axis=2) <= 0).all())
        for t, s in enumerate(cfg.table_sizes):
            assert idx[:, t].max() < s
    # fixed mode: all-ones weights
    import dataclasses
    d2 = dataclasses.replace(dcfg, num_indices_per_lookup_fixed=True)
    _, _, _, w = unpack_batch(next(iter(random_batches(d2))))
    assert (w == 1).all()


def test_multihot_training_learns_and_eval_runs():
    """End-to-end: train on multi-hot synthetic batches, loss decreases and
    evaluate() consumes the 4-tuple batches."""
    from evstore_tpu.data.synthetic import RandomDataConfig, random_batches
    from evstore_tpu.train.train_loop import train
    from evstore_tpu.models.dlrm import init_dlrm
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=64, learning_rate=0.1, optimizer="rwsadagrad",
                       print_freq=10)
    dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                            table_sizes=cfg.table_sizes, batch_size=64,
                            num_batches=30, num_indices_per_lookup=3)
    params = init_dlrm(jax.random.PRNGKey(4), cfg)
    params, _, hist = train(params, cfg, tcfg, random_batches(dcfg))
    assert np.isfinite(hist["loss"]).all()
    m = evaluate(params, cfg, random_batches(dcfg))
    assert 0.0 <= m["accuracy"] <= 1.0


def test_cli_num_indices_per_lookup():
    from evstore_tpu.cli import main
    rc = main(["--arch-sparse-feature-size", "4",
               "--arch-embedding-size", "40-30-20",
               "--arch-mlp-bot", "4-8-4",
               "--arch-mlp-top", "14-8-1",
               "--num-indices-per-lookup", "3",
               "--num-batches", "4", "--mini-batch-size", "16",
               "--print-freq", "2"])
    assert rc == 0
