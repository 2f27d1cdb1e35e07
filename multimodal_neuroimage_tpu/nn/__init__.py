from multimodal_neuroimage_tpu.nn import bert, common  # noqa: F401
