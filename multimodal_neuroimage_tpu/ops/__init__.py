from multimodal_neuroimage_tpu.ops.fir import (  # noqa: F401
    fir_bandsplit_batch,
    masked_zscore,
)
