"""fwd+bwd decomposition at the flagship config (which of MLPs /
interaction / loss dominates the ~13 ms; candidates for round-4 levers).
Fenced+slope, carry-perturbed (no hoisting)."""
import functools, json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
from bench import device_sync
from evstore_tpu.config import TrainConfig, kaggle_small_dlrm_config
from evstore_tpu.models.dlrm import DLRMParams, init_dlrm, dlrm_forward, dlrm_loss
from evstore_tpu.models.dlrm import bottom_mlp, top_mlp
from evstore_tpu.ops.interaction import dot_interaction

def slope(run, lo, hi, reps=3):
    run(lo); ts = {}
    for n in (lo, hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); run(n); best = min(best, time.perf_counter()-t0)
        ts[n] = best
    return (ts[hi]-ts[lo])/(hi-lo)

B = 32768
cfg = kaggle_small_dlrm_config(max_rows=1_000_000, compute_dtype="bfloat16")
T, D = cfg.num_tables, cfg.embedding_dim
rng = np.random.default_rng(0)
dx = jnp.asarray(rng.random((B, cfg.num_dense_features), np.float32))
y = jnp.asarray(rng.integers(0, 2, B).astype(np.float32))
emb = jnp.asarray(rng.normal(0, 0.1, (B, T, D)).astype(np.float32)).astype(jnp.bfloat16)
params = init_dlrm(jax.random.PRNGKey(0), cfg)
out = {}

def timed(name, maker, lo=5, hi=20):
    f = maker()
    out[name] = slope(lambda n: device_sync(f(n)), lo, hi) * 1e3
    print(f"{name:24s} {out[name]:8.2f} ms", flush=True)

# full fwd+bwd with emb injected (no gathers)
def mk_full():
    def loss_fn(dparams, emb_in, dxi):
        logits = dlrm_forward(DLRMParams(dparams, params.sparse), dxi, None,
                              cfg, emb_rows=emb_in)
        return dlrm_loss(logits, y)
    @functools.partial(jax.jit, static_argnums=(0,))
    def f(n):
        def body(acc, _):
            dxi = dx + acc * 1e-30
            l, (gd, ge) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                params.dense, emb, dxi)
            s = sum(jnp.sum(x).astype(jnp.float32)
                    for x in jax.tree_util.tree_leaves((gd, ge)))
            return acc + (l + s) * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc
    return f

# bottom+top MLP only fwd+bwd (no interaction: feed top from concat pad)
def mk_mlps():
    top_in = cfg.mlp_top[0]
    def loss_fn(dparams, dxi):
        xb = bottom_mlp(dparams, dxi, cfg)
        pad = jnp.zeros((B, top_in - xb.shape[1]), xb.dtype)
        z = top_mlp(dparams, jnp.concatenate([xb, pad], 1), cfg)
        return dlrm_loss(z.astype(jnp.float32), y)
    @functools.partial(jax.jit, static_argnums=(0,))
    def f(n):
        def body(acc, _):
            dxi = dx + acc * 1e-30
            l, gd = jax.value_and_grad(loss_fn)(params.dense, dxi)
            s = sum(jnp.sum(x).astype(jnp.float32)
                    for x in jax.tree_util.tree_leaves(gd))
            return acc + (l + s) * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc
    return f

# interaction only fwd+bwd (f32-HIGHEST policy as in the model)
def mk_inter():
    x0 = jnp.asarray(rng.normal(0, 0.1, (B, D)).astype(np.float32)).astype(jnp.bfloat16)
    def loss_fn(x_in, emb_in):
        z = dot_interaction(x_in, emb_in, cfg.interaction_itself)
        return jnp.sum(z.astype(jnp.float32) ** 2) * 1e-6
    @functools.partial(jax.jit, static_argnums=(0,))
    def f(n):
        def body(acc, _):
            xi = x0 + (acc * 1e-30).astype(x0.dtype)
            l, (gx, ge) = jax.value_and_grad(loss_fn, argnums=(0, 1))(xi, emb)
            return acc + (l + jnp.sum(gx).astype(jnp.float32)
                          + jnp.sum(ge).astype(jnp.float32)) * 1e-20, None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return acc
    return f

timed("fwdbwd_emb_injected", mk_full)
timed("mlps_only", mk_mlps)
timed("interaction_only", mk_inter)
print(json.dumps(out))
