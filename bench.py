"""Headline benchmark: DLRM training throughput on the Criteo Kaggle config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference trains Criteo Kaggle at ~17.9 ms/it @ batch 128 =
~7,150 examples/s on an RTX6000/P100-class GPU
(BASELINE.md; logs/sample-train-criteo_kaggle_5mil.txt:75-113).
"""

import json
import sys
import time

import numpy as np

BASELINE_EXAMPLES_PER_S = 128 / 0.0179  # ~7151/s (reference GPU number)


def main():
    import jax
    import jax.numpy as jnp
    from evstore_tpu.config import TrainConfig, kaggle_small_dlrm_config
    from evstore_tpu.models.dlrm import init_dlrm
    from evstore_tpu.train.train_loop import init_opt_state, make_train_step

    B = 8192
    cfg = kaggle_small_dlrm_config(max_rows=1_000_000,
                                   compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=B, learning_rate=0.1, optimizer="rwsadagrad")
    params = init_dlrm(jax.random.PRNGKey(0), cfg)
    opt_state = init_opt_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg), donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    n_prebuilt = 8
    batches = []
    for _ in range(n_prebuilt):
        dense = jnp.asarray(rng.random((B, 13)), jnp.float32)
        idx = jnp.asarray(
            np.stack([rng.integers(0, s, B) for s in cfg.table_sizes], axis=1),
            jnp.int32)
        labels = jnp.asarray(rng.integers(0, 2, B), jnp.float32)
        batches.append((dense, idx, labels))

    # warmup/compile
    params, opt_state, loss = step(params, opt_state, *batches[0])
    jax.block_until_ready(loss)

    n_steps = 60
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, loss = step(params, opt_state,
                                       *batches[i % n_prebuilt])
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    examples_per_s = n_steps * B / dt
    print(json.dumps({
        "metric": "train_examples_per_s_per_chip",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / BASELINE_EXAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
