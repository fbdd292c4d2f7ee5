from evstore_tpu.parallel.mesh import make_mesh, pad_rows_for_mesh  # noqa: F401
from evstore_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_train_step, make_sharded_eval_step, shard_dlrm_params,
)
