"""Round-5 device-time decomposition of the flagship train step via the
jax profiler (tunnel-noise-free, unlike wall-clock slopes: the r4 capture's
own band was [22.7, 73.6] ms for identical code).

Runs 10 steps under jax.profiler.trace and reports total TensorCore busy
time per step plus the top fused ops (grouped by op name + output type).

Usage: python scripts/trace_step_r5.py [--pallas] [--batch 65536]
"""

from __future__ import annotations

import argparse
import collections
import functools
import glob
import gzip
import json
import os
import re
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import device_sync, _batches


def run_trace(use_pallas: bool, B: int, trace_dir: str, n_steps: int = 10):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                      + "/.jax_cache")
    from evstore_tpu.config import TrainConfig, kaggle_small_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.train.train_loop import init_opt_state, make_train_step
    from evstore_tpu.train.optim import make_pack_spec, pack_tables

    cfg = kaggle_small_dlrm_config(max_rows=1_000_000,
                                   compute_dtype="bfloat16",
                                   use_pallas_interaction=use_pallas)
    tcfg = TrainConfig(batch_size=B, learning_rate=0.1,
                       optimizer="rwsadagrad")
    pack_spec = make_pack_spec(init_dlrm(jax.random.PRNGKey(0), cfg),
                               tcfg.optimizer)
    step = make_train_step(cfg, tcfg, pack=pack_spec)
    raw = _batches(cfg, B, 4)
    Dl = [jnp.asarray(d) for d, _, _ in raw]
    Il = [jnp.asarray(i) for _, i, _ in raw]
    Yl = [jnp.asarray(y) for _, _, y in raw]

    from evstore_tpu.train.train_loop import step_jit

    @functools.partial(step_jit, static_argnums=(2,), donate_argnums=(0, 1))
    def run_n(params, opt_state, n):
        loss = None
        for i in range(n):
            j = i % len(Dl)
            params, opt_state, loss = step(params, opt_state,
                                           Dl[j], Il[j], Yl[j])
        return params, opt_state, loss

    def fresh():
        p = init_dlrm(jax.random.PRNGKey(0), cfg)
        o = init_opt_state(p, tcfg)
        return pack_tables(p, o, pack_spec)

    p, o = fresh()
    device_sync(run_n(p, o, n_steps)[2])     # compile + warm
    shutil.rmtree(trace_dir, ignore_errors=True)
    p, o = fresh()
    jax.profiler.start_trace(trace_dir)
    device_sync(run_n(p, o, n_steps)[2])
    jax.profiler.stop_trace()


def parse(trace_dir: str, n_steps: int = 10, top: int = 18):
    evs = []
    for f in glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        tids = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "thread_name":
                tids[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
        for ev in data.get("traceEvents", []):
            if (ev.get("ph") == "X" and "dur" in ev
                    and tids.get((ev["pid"], ev.get("tid"))) == "XLA Ops"):
                evs.append(ev)
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0
    for e in evs:
        if e["name"].startswith("jit_run_n"):
            continue
        total += e["dur"]
        ln = e.get("args", {}).get("long_name", "")
        m = re.match(r"%\S+ = \(?(\S+?)\{", ln)
        base = (re.sub(r"\.\d+$", "", e["name"]) + ":"
                + (m.group(1) if m else "?"))
        agg[base] += e["dur"]
        cnt[base] += 1
    print(f"TOTAL device: {total / (n_steps * 1000):.2f} ms/step")
    for n, d in agg.most_common(top):
        print(f"  {d / (n_steps * 1000):8.3f} ms/step x{cnt[n] // n_steps:<4d} {n[:84]}")
    return total / (n_steps * 1000)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--dir", default=None)
    args = ap.parse_args()
    d = args.dir or f"/tmp/trace_r5_{'pallas' if args.pallas else 'xla'}"
    run_trace(args.pallas, args.batch, d)
    parse(d)
