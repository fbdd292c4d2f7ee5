"""Two-process jax.distributed run exercising parallel/multihost.py end to
end WITHOUT a pod (VERDICT r2 item 6).

Reference: extend_distributed.init_distributed (extend_distributed.py:65-151)
is the reference's battle-hardened multi-process entry point; its test story
is "run it on a cluster".  Here two CPU processes (4 virtual devices each)
rendezvous on a localhost coordinator and drive init_multihost,
make_pod_mesh, host_batch_slice and make_global_batch through one sharded
train step — the missing "multi-node without a cluster" coverage (SURVEY
§4).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from evstore_tpu.parallel.multihost import (host_batch_slice, init_multihost,
                                            make_global_batch, make_pod_mesh)

rank, size = init_multihost(coordinator_address=coord, num_processes=nproc,
                            process_id=pid)
assert (rank, size) == (pid, nproc), (rank, size)

mesh = make_pod_mesh(n_model=4)           # (data=2, model=4) over 8 devices
assert dict(mesh.shape) == {"data": 2, "model": 4}, mesh.shape
# model groups must stay within one process (ICI orientation)
for row in np.asarray(mesh.devices):
    assert len({d.process_index for d in row}) == 1

from jax.sharding import PartitionSpec as P
from evstore_tpu.config import TrainConfig, tiny_dlrm_config
from evstore_tpu.data.synthetic import RandomDataConfig, learnable_batches
from evstore_tpu.models.dlrm import init_dlrm
from evstore_tpu.parallel.sharded import (make_sharded_train_step,
                                          shard_dlrm_params)
from evstore_tpu.train.train_loop import init_opt_state

cfg = tiny_dlrm_config()
tcfg = TrainConfig(batch_size=16, learning_rate=0.2, optimizer="rwsadagrad")
params = init_dlrm(jax.random.PRNGKey(0), cfg)
opt_state = init_opt_state(params, tcfg)
params, opt_state, _, _ = shard_dlrm_params(params, mesh, opt_state)
step = make_sharded_train_step(cfg, tcfg, mesh, tcfg.batch_size)(params,
                                                                 opt_state)

B = tcfg.batch_size
lo, hi = host_batch_slice(B)
assert hi - lo == B // nproc, (lo, hi)

dcfg = RandomDataConfig(num_dense=cfg.num_dense_features,
                        table_sizes=cfg.table_sizes, batch_size=B,
                        num_batches=3, seed=0)
losses = []
for dense, idx, y in learnable_batches(dcfg):   # same stream on every host
    local = (np.asarray(dense)[lo:hi], np.asarray(idx)[lo:hi],
             np.asarray(y)[lo:hi])
    gdense, gidx, gy = make_global_batch(
        local, mesh, (P("data"), P("data"), P("data")))
    assert gdense.shape[0] == B                 # global batch reassembled
    params, opt_state, loss = step(params, opt_state, gdense, gidx, gy)
    losses.append(float(loss))

print("RESULT " + json.dumps({"pid": pid, "losses": losses}), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.skipif(os.environ.get("ESV_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_multihost_train_step(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    procs = [subprocess.Popen([sys.executable, str(script), coord, "2",
                               str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env,
                              cwd=REPO)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line in:\n{out}"
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r["losses"]
    # both hosts computed the same global loss each step, and it moved
    assert len(results) == 2
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    assert all(np.isfinite(results[0]))
    assert results[0][-1] != results[0][0]
