from evstore_tpu.cache.policy import EvLFU, LFU, LRU  # noqa: F401
from evstore_tpu.cache.storage import (  # noqa: F401
    DummyStore, FileStore, MmapStore, SqliteStore, StorageManager,
)
from evstore_tpu.cache.tiers import TieredCache  # noqa: F401
