from evstore_tpu.models.dlrm import (  # noqa: F401
    init_dlrm, dlrm_forward, dlrm_loss, DLRMParams,
)
