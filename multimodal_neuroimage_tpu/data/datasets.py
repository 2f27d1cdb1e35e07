"""Per-dataset item loaders (host side).

Functional replacement for the reference's 9 Dataset classes
(reference data_preprocess_and_load/datasets.py:25-835): each dataset is a
``load_item(record) -> dict of numpy`` function keyed exactly like the
reference's ``__getitem__`` dicts, so model input routing is one-to-one.

Two preprocessing placements for the fMRI band-split (cfg.preprocess):
  * 'host'   — full reference-equivalent numpy/scipy pipeline per item
               (datasets.py:272-307 semantics via data/filters.py)
  * 'device' — items return the RAW (ROI, t_max) series + native length;
               the loader runs the fused FIR/zscore/pad kernel per batch
               on the TPU (ops/fir.py), removing the reference's #1
               input-pipeline cost (FIR recomputed per item per epoch).

Structural matrices keep the reference's global-zscore + fp16 storage
(datasets.py:416, 474, 600) — they're cast by the bf16 compute policy anyway.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from multimodal_neuroimage_tpu.data.filters import (pad_time_axis,
                                                    preprocess_fmri_host,
                                                    zscore)
from multimodal_neuroimage_tpu.data.index import SubjectRecord

ABCD_SEQ_LEN = 368     # ABCD pad target (datasets.py:222-229)
ABCD_SKIP_TR = 20      # first 20 TRs dropped (datasets.py:222)
HCP_SEQ_LEN = 1200     # HCP pad target (datasets.py:117-122)


def _load_abcd_fmri_raw(path: str) -> np.ndarray:
    """(T, R) npy -> (R, T) with the first 20 TRs dropped (datasets.py:222)."""
    return np.load(path)[ABCD_SKIP_TR:].T.astype(np.float64)


def _struct_matrix(path: str) -> np.ndarray:
    """84x84 npy, global zscore, fp16 (datasets.py:416, 474, 600)."""
    y = np.load(path)
    return zscore(y.astype(np.float64), axis=None).astype(np.float16)


def _base(record: SubjectRecord, target_key: str) -> Dict[str, np.ndarray]:
    return {"subject": np.int64(record.idx),
            "subject_name": record.subject,
            target_key: np.float32(record.target)}


class ItemLoader:
    """Dataset dispatch (replaces DataHandler.get_dataset, dataloaders.py:30-50)."""

    def __init__(self, cfg, augment: bool = False):
        self.cfg = cfg
        self.target_key = cfg.target
        fns: Dict[str, Callable[[SubjectRecord], Dict]] = {
            "hcp": self.hcp,
            "fMRI_timeseries": self.fmri_timeseries,
            "fMRI_image": self.fmri_image,
            "DTI": self.dti,
            "sMRI": self.smri,
            "struct": self.struct_pair,
            "DTI+sMRI": self.dti_smri,
            "multimodal": self.multimodal,
            "multimodal_prs": self.multimodal_prs,
        }
        if cfg.dataset_name not in fns:
            raise NotImplementedError(cfg.dataset_name)
        self.fn = fns[cfg.dataset_name]
        # train-only augmentation (reference datasets.py:46-48; the eval
        # dataset clone sets augment=None, dataloaders.py:59-60)
        self.augment = None
        if augment and cfg.augment_prob > 0:
            from multimodal_neuroimage_tpu.data.augmentations import brain_gaussian
            self.augment = brain_gaussian(augment_prob=cfg.augment_prob,
                                          seed=cfg.seed)
        # device-preprocess mode defers FIR/zscore/pad to the fused TPU kernel
        # (the sinc-resampled ultralow variant and the Boxcar filter — the
        # fused kernel implements only the FIR-taps split — stay on host)
        self.device_fmri = (cfg.preprocess == "device"
                            and cfg.filtering_type == "FIR"
                            and cfg.feature_map_gen != "resample"
                            and cfg.dataset_name in ("fMRI_timeseries",
                                                     "multimodal",
                                                     "multimodal_prs")
                            and cfg.fmri_type in ("timeseries",
                                                  "divided_frequency",
                                                  "time_domain_low",
                                                  "time_domain_ultralow"))

    def __call__(self, record: SubjectRecord) -> Dict[str, np.ndarray]:
        return self.fn(record)

    # -- fMRI ---------------------------------------------------------------
    def _raw_fmri_item(self, record: SubjectRecord) -> Dict[str, np.ndarray]:
        """Device-preprocess payload: zero-padded raw series + native length.

        Train-time augmentation applies HERE, to the raw series before the
        on-device FIR — the same point in the chain as the host path
        (which augments y before preprocess_fmri_host)."""
        y = _load_abcd_fmri_raw(record.paths["fmri"])
        if self.augment is not None:
            y = self.augment(y)
        R, T = y.shape
        buf = np.zeros((R, ABCD_SEQ_LEN), dtype=np.float32)
        buf[:, :T] = y
        out = _base(record, self.target_key)
        out["fmri_raw"] = buf
        out["fmri_length"] = np.int32(T)
        return out

    def fmri_timeseries(self, record: SubjectRecord) -> Dict[str, np.ndarray]:
        if self.device_fmri:
            return self._raw_fmri_item(record)
        y = _load_abcd_fmri_raw(record.paths["fmri"])
        if self.augment is not None:
            y = self.augment(y)
        out = _base(record, self.target_key)
        out.update(preprocess_fmri_host(
            y, self.cfg.fmri_type, ABCD_SEQ_LEN, self.cfg.filtering_type,
            self.cfg.fir_lb_hz, self.cfg.tr_seconds, self.cfg.fir_order,
            self.cfg.feature_map_gen, self.cfg.feature_map_size))
        return out

    def fmri_image(self, record: SubjectRecord) -> Dict[str, np.ndarray]:
        """4-D NIfTI volume path (datasets.py:130-169) via the built-in
        NIfTI-1 reader (nibabel-free)."""
        from multimodal_neuroimage_tpu.data.nifti import read_nifti
        y = read_nifti(record.paths["fmri_image"])
        if self.augment is not None:
            y = self.augment(y)
        out = _base(record, self.target_key)
        out["fmri_sequence"] = y.astype(np.float32)
        return out

    def hcp(self, record: SubjectRecord) -> Dict[str, np.ndarray]:
        y = np.load(record.paths["fmri"]).astype(np.float64)  # (22, <=1200)
        y = zscore(y, axis=None)
        out = _base(record, self.target_key)
        out["fmri_sequence"] = pad_time_axis(y, HCP_SEQ_LEN).T.astype(np.float32)
        return out

    # -- structural ----------------------------------------------------------
    def dti(self, record: SubjectRecord) -> Dict[str, np.ndarray]:
        out = _base(record, self.target_key)
        out["dti"] = _struct_matrix(record.paths["dti"])
        return out

    def smri(self, record: SubjectRecord) -> Dict[str, np.ndarray]:
        out = _base(record, self.target_key)
        out["smri"] = _struct_matrix(record.paths["smri"])
        return out

    def struct_pair(self, record: SubjectRecord) -> Dict[str, np.ndarray]:
        out = _base(record, self.target_key)
        out["smri"] = _struct_matrix(record.paths["smri"])
        out["dti"] = _struct_matrix(record.paths["dti"])
        return out

    def dti_smri(self, record: SubjectRecord) -> Dict[str, np.ndarray]:
        out = _base(record, self.target_key)
        out["struct"] = _struct_matrix(record.paths["struct"])
        return out

    # -- multimodal -----------------------------------------------------------
    def multimodal(self, record: SubjectRecord) -> Dict[str, np.ndarray]:
        out = _base(record, self.target_key)
        out["struct"] = _struct_matrix(record.paths["struct"])
        if self.device_fmri:
            raw = self._raw_fmri_item(record)
            out["fmri_raw"] = raw["fmri_raw"]
            out["fmri_length"] = raw["fmri_length"]
            return out
        y = _load_abcd_fmri_raw(record.paths["fmri"])
        if self.augment is not None:
            y = self.augment(y)
        bands = preprocess_fmri_host(
            y, "divided_frequency", ABCD_SEQ_LEN, self.cfg.filtering_type,
            self.cfg.fir_lb_hz, self.cfg.tr_seconds, self.cfg.fir_order,
            self.cfg.feature_map_gen, self.cfg.feature_map_size)
        # multimodal key names (datasets.py:700): raw sequence is
        # 'fmri_raw_sequence' here vs 'fmri_sequence' in the fMRI-only dataset
        out["fmri_raw_sequence"] = bands["fmri_sequence"]
        out["fmri_lowfreq_sequence"] = bands["fmri_lowfreq_sequence"]
        out["fmri_ultralowfreq_sequence"] = bands["fmri_ultralowfreq_sequence"]
        return out

    def multimodal_prs(self, record: SubjectRecord) -> Dict[str, np.ndarray]:
        out = self.multimodal(record)
        out["prs"] = np.asarray(record.prs, dtype=np.float32)
        return out
