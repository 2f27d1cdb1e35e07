"""multimodal_neuroimage_tpu — a TPU-native (JAX/XLA/pjit/Pallas) framework for
phenotype prediction from multimodal ABCD/HCP neuroimaging.

Brand-new framework with the capabilities of the PyTorch reference
(Transconnectome/multimodal_neuroimage): FIR-bandsplit fMRI ROI timeseries encoded by
BERT-style temporal transformers, 84x84 structural matrices encoded by SwinV2 with
scaled-cosine shifted-window attention, SwinFusion cross-window-attention fusion, and
Func+Struct multimodal combiners — re-designed TPU-first:

 * one jitted train/eval step over a GSPMD data-parallel ``jax.sharding.Mesh``
   (replaces DDP/NCCL, reference utils.py:37-93, trainer.py:269-296)
 * fused on-device FIR band-split + zscore + pad input preprocessing
   (replaces per-item nitime filtering in reference datasets.py:272-307)
 * bf16 compute policy instead of CUDA AMP loss scaling (reference trainer.py:378-409)
 * orbax checkpointing with partial-restore phase chaining
   (reference model.py:90-108, trainer.py:107-162)
 * subject-level metric aggregation with a global allgather
   (fixes the reference's shard-local metrics, trainer.py:756-778)
"""

__version__ = "0.1.0"

from multimodal_neuroimage_tpu.config import Config, config_for_phase  # noqa: F401
