from evstore_tpu.data.synthetic import (  # noqa: F401
    random_batches, RandomDataConfig,
)
