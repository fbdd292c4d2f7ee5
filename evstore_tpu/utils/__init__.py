from evstore_tpu.utils.trace import LatencyRecorder, WorkloadTracer  # noqa: F401
from evstore_tpu.utils.config_io import (  # noqa: F401
    store_training_config, read_training_config,
)
