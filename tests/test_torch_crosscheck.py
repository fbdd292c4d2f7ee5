"""Cross-framework numeric check: our JAX DLRM vs an independently-built
torch-CPU DLRM twin with identical weights.

This is the analog of the reference's ONLY automated test,
test/dlrm_s_test.sh:23-47, which runs the same tiny config through the
PyTorch and Caffe2 implementations in --debug-mode and literally diffs the
printed parameters/outputs ("no numeric values in the output = SUCCESS").
Here the second framework is torch (CPU, baked into the image) and the
comparison is numeric: forward logits, loss, and a full SGD step (dense +
embedding updates) must agree to fp32 tolerance.

The torch twin is built from the reference's forward semantics
(dlrm_s_pytorch.py: apply_mlp :407, apply_emb :416-459 with bag size 1,
interact_features dot :483-516 lower-triangle, sigmoid+BCE :297-312) —
not from our JAX code — so agreement is evidence both implement the same
math.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from evstore_tpu.config import TrainConfig, make_dlrm_config
from evstore_tpu.models.dlrm import dlrm_forward, dlrm_loss, init_dlrm
from evstore_tpu.train.train_loop import init_opt_state, make_train_step


def _cfg():
    return make_dlrm_config(8, (50, 35, 20, 60), (16, 8), (12,),
                            num_dense=6, compute_dtype="float32")


class TorchDLRM(torch.nn.Module):
    """Reference-semantics DLRM in torch, weights copied from our pytree."""

    def __init__(self, params, cfg):
        super().__init__()

        def mlp(dims, layers):
            mods = []
            for i in range(len(dims) - 1):
                lin = torch.nn.Linear(dims[i], dims[i + 1])
                w = np.asarray(layers[f"layer_{i}"]["w"], np.float32)
                b = np.asarray(layers[f"layer_{i}"]["b"], np.float32)
                with torch.no_grad():
                    lin.weight.copy_(torch.from_numpy(w.T.copy()))
                    lin.bias.copy_(torch.from_numpy(b.copy()))
                mods.append(lin)
                if i < len(dims) - 2:
                    mods.append(torch.nn.ReLU())
            return torch.nn.Sequential(*mods)

        # bottom MLP ends with a ReLU in the reference (sigmoid_bot=-1 ->
        # relu on every layer, dlrm_s_pytorch.py:226-240)
        bot = mlp(cfg.mlp_bot, params.dense["bot"])
        self.bot = torch.nn.Sequential(*list(bot) + [torch.nn.ReLU()])
        self.top = mlp(cfg.mlp_top, params.dense["top"])
        self.embs = torch.nn.ModuleList()
        for t in range(cfg.num_tables):
            tab = np.asarray(params.sparse[f"table_{t}"]["kind_plain"],
                             np.float32)
            e = torch.nn.Embedding(tab.shape[0], tab.shape[1])
            with torch.no_grad():
                e.weight.copy_(torch.from_numpy(tab.copy()))
            self.embs.append(e)

    def forward(self, dense_x, idx):
        x = self.bot(dense_x)                                  # [B, D]
        ly = [e(idx[:, t]) for t, e in enumerate(self.embs)]   # T x [B, D]
        feats = torch.stack([x] + ly, dim=1)                   # [B, F, D]
        gram = torch.bmm(feats, feats.transpose(1, 2))         # [B, F, F]
        li, lj = np.tril_indices(feats.shape[1], k=-1)
        flat = gram[:, torch.from_numpy(li), torch.from_numpy(lj)]
        z = torch.cat([x, flat], dim=1)
        return self.top(z)[:, 0]                               # logits [B]


def _batch(cfg, B=32, seed=0):
    rng = np.random.default_rng(seed)
    dense = rng.random((B, cfg.num_dense_features)).astype(np.float32)
    idx = np.stack([rng.integers(0, s, B) for s in cfg.table_sizes],
                   axis=1).astype(np.int32)
    y = rng.integers(0, 2, B).astype(np.float32)
    return dense, idx, y


def test_forward_and_loss_match_torch():
    cfg = _cfg()
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    tm = TorchDLRM(params, cfg)
    dense, idx, y = _batch(cfg)

    logits_jax = np.asarray(dlrm_forward(params, jnp.asarray(dense),
                                         jnp.asarray(idx), cfg))
    with torch.no_grad():
        logits_t = tm(torch.from_numpy(dense),
                      torch.from_numpy(idx.astype(np.int64))).numpy()
    np.testing.assert_allclose(logits_jax, logits_t, rtol=1e-4, atol=1e-5)

    loss_jax = float(dlrm_loss(jnp.asarray(logits_jax), jnp.asarray(y)))
    loss_t = float(torch.nn.BCEWithLogitsLoss()(
        torch.from_numpy(logits_jax), torch.from_numpy(y)))
    np.testing.assert_allclose(loss_jax, loss_t, rtol=1e-6)


def test_sgd_step_matches_torch():
    """One full SGD step (forward, BCE, backward, update) must produce the
    same dense weights AND the same embedding tables (duplicate-index grads
    coalesce identically)."""
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=32, learning_rate=0.3, optimizer="sgd")
    params = init_dlrm(jax.random.PRNGKey(1), cfg)
    tm = TorchDLRM(params, cfg)
    rng = np.random.default_rng(2)
    dense, _, y = _batch(cfg, seed=2)
    # duplicate-heavy indices: coalescing must match torch's dense autograd
    idx = np.stack([rng.integers(0, min(s, 4), 32) for s in cfg.table_sizes],
                   axis=1).astype(np.int32)

    step = jax.jit(make_train_step(cfg, tcfg))
    p1, _, loss_jax = step(params, init_opt_state(params, tcfg),
                           jnp.asarray(dense), jnp.asarray(idx),
                           jnp.asarray(y))

    logits = tm(torch.from_numpy(dense), torch.from_numpy(idx.astype(np.int64)))
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
    # bottom layer-0 weight (stored [m,n]; torch stores [n,m])
    np.testing.assert_allclose(
        np.asarray(p1.dense["bot"]["layer_0"]["w"]),
        tm.bot[0].weight.detach().numpy().T,
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p1.dense["top"]["layer_0"]["w"]),
        tm.top[0].weight.detach().numpy().T,
        rtol=1e-4, atol=1e-6)
