from multimodal_neuroimage_tpu.serve.predictor import Predictor

__all__ = ["Predictor"]
