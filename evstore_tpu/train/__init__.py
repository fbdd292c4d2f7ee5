from evstore_tpu.train.optim import (  # noqa: F401
    make_optimizer, lr_schedule, OptState,
)
from evstore_tpu.train.metrics import roc_auc, binary_metrics  # noqa: F401
