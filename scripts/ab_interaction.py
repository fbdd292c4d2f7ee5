import functools, json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
from bench import device_sync

def slope(run, lo, hi, reps=3):
    run(lo); ts = {}
    for n in (lo, hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); run(n); best = min(best, time.perf_counter()-t0)
        ts[n] = best
    return (ts[hi]-ts[lo])/(hi-lo)

B, T, D = 32768, 26, 36
F = T + 1
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(0, 0.1, (B, D)).astype(np.float32)).astype(jnp.bfloat16)
emb = jnp.asarray(rng.normal(0, 0.1, (B, T, D)).astype(np.float32)).astype(jnp.bfloat16)
li, lj = np.tril_indices(F, k=-1)
P = len(li)
flat_idx = jnp.asarray(li * F + lj, jnp.int32)
S = np.zeros((F * F, P), np.float32)
S[li * F + lj, np.arange(P)] = 1.0
S = jnp.asarray(S)

def gram_of(feats, prec):
    return jnp.einsum("bfd,bgd->bfg", feats, feats,
                      preferred_element_type=jnp.float32, precision=prec)

def make(name, prec, tril):
    def inter(x_in, emb_in):
        feats = jnp.concatenate([x_in[:, None, :], emb_in], 1)
        gram = gram_of(feats, prec)
        if tril == "gather":
            flat = gram[:, jnp.asarray(li), jnp.asarray(lj)].astype(x_in.dtype)
        elif tril == "take":
            flat = jnp.take(gram.reshape(B, F * F), flat_idx, axis=1).astype(x_in.dtype)
        else:  # selection matmul
            flat = jnp.dot(gram.reshape(B, F * F).astype(jnp.bfloat16), S.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32).astype(x_in.dtype)
        return jnp.concatenate([x_in, flat], 1)
    def loss_fn(x_in, emb_in):
        z = inter(x_in, emb_in)
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
    ms = slope(lambda n: device_sync(f(n)), 5, 20) * 1e3
    print(f"{name:30s} {ms:8.2f} ms", flush=True)
    return ms

H = jax.lax.Precision.HIGHEST
DEF = jax.lax.Precision.DEFAULT
out = {}
out["highest_gather"] = make("HIGHEST + gather (current)", H, "gather")
out["default_gather"] = make("DEFAULT + gather", DEF, "gather")
out["highest_selmm"] = make("HIGHEST + selection-matmul", H, "selmm")
out["default_selmm"] = make("DEFAULT + selection-matmul", DEF, "selmm")
out["highest_take"] = make("HIGHEST + flat take", H, "take")
print(json.dumps(out))

# lane-batched gram: B in the minor (lane) dim, f/g/d tiny loop dims
def make_lane(name, prec):
    def inter(x_in, emb_in):
        feats = jnp.concatenate([x_in[:, None, :], emb_in], 1)   # [B,F,D]
        ft = feats.transpose(1, 2, 0)                            # [F,D,B]
        gramT = jnp.einsum("fdb,gdb->fgb", ft, ft,
                           preferred_element_type=jnp.float32,
                           precision=prec)                       # [F,F,B]
        flatT = gramT.reshape(F * F, B)[flat_idx]                # [P,B] static
        return jnp.concatenate([x_in, flatT.T.astype(x_in.dtype)], 1)
    def loss_fn(x_in, emb_in):
        z = inter(x_in, emb_in)
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
    ms = slope(lambda n: device_sync(f(n)), 5, 20) * 1e3
    print(f"{name:30s} {ms:8.2f} ms", flush=True)
    return ms

out["lane_highest"] = make_lane("lane-batched gram HIGHEST", H)
out["lane_default"] = make_lane("lane-batched gram DEFAULT", DEF)
print(json.dumps(out))
