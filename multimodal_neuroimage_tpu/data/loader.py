"""Input pipeline: subject-level splits -> batched, device-prefetched streams.

Replaces the reference's DataHandler + torch DataLoader stack
(reference data_preprocess_and_load/dataloaders.py:17-182):

  * ``drop_last=True`` batching (dataloaders.py:139) — keeps shapes static
    for XLA (one compiled program per dataset);
  * per-epoch reshuffle seeded like ``DistributedSampler.set_epoch``
    (trainer.py:365-366) but with an explicit counter-based rng, so every
    host draws the SAME permutation and takes its own contiguous shard
    (replaces rank-sliced DistributedSampler, dataloaders.py:74-81);
  * pin_memory/persistent_workers host->GPU staging (dataloaders.py:136-141)
    -> a thread pool for npy/preprocess work plus a one-deep device-put
    lookahead (double-buffered host->HBM prefetch);
  * optional on-device fused FIR band-split per batch (ops/fir.py) when
    cfg.preprocess == 'device'.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from multimodal_neuroimage_tpu.data.datasets import ABCD_SEQ_LEN, ItemLoader
from multimodal_neuroimage_tpu.data.index import SubjectRecord, build_subject_index
from multimodal_neuroimage_tpu.data.splits import SplitManager
from multimodal_neuroimage_tpu.parallel.mesh import shard_batch


def collate(items: List[Dict], target_key: str) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Stack item dicts; the phenotype target is renamed to 'target' and
    subject_name strings stay host-side."""
    names = [it["subject_name"] for it in items]
    batch: Dict[str, np.ndarray] = {}
    for key in items[0]:
        if key == "subject_name":
            continue
        out_key = "target" if key == target_key else key
        batch[out_key] = np.stack([np.asarray(it[key]) for it in items])
    return batch, names


def device_preprocess(batch: Dict, cfg) -> Dict:
    """Fused on-device FIR band-split for batches carrying raw series
    (cfg.preprocess == 'device'; replaces datasets.py:272-307 per-item CPU work)."""
    if "fmri_raw" not in batch:
        return batch
    from multimodal_neuroimage_tpu.ops.fir import fir_bandsplit_batch
    bands = fir_bandsplit_batch(
        batch["fmri_raw"], batch["fmri_length"], t_max=ABCD_SEQ_LEN,
        lb_hz=cfg.fir_lb_hz, tr_seconds=cfg.tr_seconds,
        fir_order=cfg.fir_order,
        global_zscore_raw=(cfg.fmri_type == "timeseries"))
    out = {k: v for k, v in batch.items()
           if k not in ("fmri_raw", "fmri_length")}
    raw_key = ("fmri_raw_sequence"
               if cfg.dataset_name in ("multimodal", "multimodal_prs")
               else "fmri_sequence")
    if cfg.fmri_type == "timeseries":
        out["fmri_sequence"] = bands["raw"]
    elif cfg.fmri_type == "time_domain_low":
        out["fmri_sequence"] = bands["low"]
    elif cfg.fmri_type == "time_domain_ultralow":
        out["fmri_sequence"] = bands["ultralow"]
    else:  # divided_frequency
        out[raw_key] = bands["raw"]
        out["fmri_lowfreq_sequence"] = bands["low"]
        out["fmri_ultralowfreq_sequence"] = bands["ultralow"]
    return out


class DataPipeline:
    """Split-aware batched pipeline over the subject index."""

    def __init__(self, cfg, mesh=None, records: Optional[List[SubjectRecord]] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.records = records if records is not None else build_subject_index(cfg)
        # train loader augments; eval loader never does (dataloaders.py:59-60)
        self.item_loader = ItemLoader(cfg, augment=True)
        self.eval_item_loader = ItemLoader(cfg, augment=False)
        splitter = SplitManager(cfg.base_path, cfg.dataset_name, cfg.seed,
                                cfg.train_split, cfg.val_split)
        subjects = [r.subject for r in self.records]
        train_s, val_s, test_s = splitter.split(subjects)
        by_name = {r.subject: r for r in self.records}
        self.splits: Dict[str, List[SubjectRecord]] = {
            "train": [by_name[s] for s in train_s if s in by_name],
            "val": [by_name[s] for s in val_s if s in by_name],
            "test": [by_name[s] for s in test_s if s in by_name],
        }
        self.pool = ThreadPoolExecutor(max_workers=max(cfg.workers, 1))

    def steps_per_epoch(self, split: str = "train") -> int:
        pc = jax.process_count()
        per_host = self.cfg.batch_size
        return len(self.splits[split]) // (per_host * pc)

    def _batches(self, split: str, epoch: int, shuffle: bool
                 ) -> Iterator[Tuple[Dict[str, np.ndarray], List[str]]]:
        recs = self.splits[split]
        order = np.arange(len(recs))
        if shuffle:
            order = np.random.default_rng(
                (self.cfg.seed, epoch)).permutation(len(recs))
        loader = self.item_loader if split == "train" else self.eval_item_loader
        bs = self.cfg.batch_size
        pc, pi = jax.process_count(), jax.process_index()
        global_bs = bs * pc
        n_steps = len(recs) // global_bs  # drop_last
        use_native = (self.cfg.preprocess == "native"
                      and self._native_supported(split))

        def load(idxs):
            nonlocal use_native
            if use_native:
                batch = self._native_batch([recs[i] for i in idxs])
                if batch is not None:
                    return batch
                use_native = False  # lib unavailable: fall back permanently
            items = list(self.pool.map(lambda i: loader(recs[i]), idxs))
            return collate(items, self.cfg.target)

        for step in range(n_steps):
            start = step * global_bs + pi * bs
            batch, names = load(order[start:start + bs])
            if split != "train":
                # constant-shape validity vector: every eval batch carries
                # one so the tail batch below doesn't retrace the eval step
                batch["valid"] = np.ones(len(names), np.float32)
            yield batch, names

        # pad-and-mask final partial batch for eval splits — the reference
        # only drops the last batch for TRAIN (dataloaders.py:139); without
        # this a val split smaller than one global batch would produce no
        # metrics and no BEST checkpoint at all. batch['valid'] zeros the
        # pad rows so compute_losses excludes them EXACTLY (train/losses.py)
        tail = len(recs) - n_steps * global_bs
        if split != "train" and tail > 0:
            start = n_steps * global_bs + pi * bs
            idxs, pad = [], []
            for j in range(bs):
                k = start + j
                idxs.append(order[k] if k < len(recs) else order[k % len(recs)])
                pad.append(k >= len(recs))
            batch, names = load(np.asarray(idxs))
            batch["valid"] = np.asarray(
                [0.0 if p else 1.0 for p in pad], np.float32)
            names = [None if p else n for n, p in zip(names, pad)]
            yield batch, names

    # -- native (C++) batch fast path ------------------------------------------
    def _native_supported(self, split: str) -> bool:
        cfg = self.cfg
        if split == "train" and cfg.augment_prob > 0:
            return False  # augmentation runs in the Python item path
        if cfg.dataset_name in ("DTI", "sMRI", "DTI+sMRI", "struct",
                                "fMRI_image"):
            return True
        if cfg.filtering_type != "FIR":
            return False  # fastpipe implements only the FIR-taps band split
        if cfg.dataset_name in ("multimodal", "multimodal_prs"):
            return cfg.feature_map_gen != "resample"
        if cfg.dataset_name == "fMRI_timeseries":
            return cfg.fmri_type == "divided_frequency" and \
                cfg.feature_map_gen != "resample"
        return False

    def _native_batch(self, recs) -> Optional[Tuple[Dict, List[str]]]:
        """Whole-batch load+preprocess through native/fastpipe.cpp (parallel
        npy parse + filtfilt + zscore + pad in C++). Returns None when the
        native library can't be built — callers fall back to the item path."""
        from multimodal_neuroimage_tpu.data import native
        from multimodal_neuroimage_tpu.data.filters import design_highpass_fir
        if not native.native_available():
            return None
        cfg = self.cfg
        names = [r.subject for r in recs]
        batch: Dict[str, np.ndarray] = {
            "subject": np.asarray([r.idx for r in recs], np.int64),
            "target": np.asarray([r.target for r in recs], np.float32),
        }
        if cfg.dataset_name == "fMRI_image":
            from multimodal_neuroimage_tpu.data.nifti import read_nifti_header
            paths = [r.paths["fmri_image"] for r in recs]
            vols = native.nifti_batch_native(
                paths, read_nifti_header(paths[0]), cfg.workers)
            if vols is None:
                return None
            batch["fmri_sequence"] = vols
            return batch, names
        mat_key = {"DTI": ("dti", "dti"), "sMRI": ("smri", "smri"),
                   "DTI+sMRI": ("struct", "struct")}.get(cfg.dataset_name)
        if cfg.dataset_name == "struct":
            batch["smri"] = native.matrix_batch_native(
                [r.paths["smri"] for r in recs], 84, 84, cfg.workers)
            batch["dti"] = native.matrix_batch_native(
                [r.paths["dti"] for r in recs], 84, 84, cfg.workers)
        elif mat_key is not None:
            batch[mat_key[0]] = native.matrix_batch_native(
                [r.paths[mat_key[1]] for r in recs], 84, 84, cfg.workers)
        if cfg.dataset_name in ("multimodal", "multimodal_prs"):
            batch["struct"] = native.matrix_batch_native(
                [r.paths["struct"] for r in recs], 84, 84, cfg.workers)
        if cfg.dataset_name in ("multimodal", "multimodal_prs",
                                "fMRI_timeseries"):
            taps = design_highpass_fir(cfg.fir_order, cfg.fir_lb_hz,
                                       1.0 / cfg.tr_seconds)
            bands = native.bandsplit_batch_native(
                [r.paths["fmri"] for r in recs], taps,
                t_max=cfg.sequence_length, n_rois=cfg.intermediate_vec,
                nthreads=cfg.workers)
            raw_key = ("fmri_raw_sequence"
                       if cfg.dataset_name != "fMRI_timeseries"
                       else "fmri_sequence")
            batch[raw_key] = bands["raw"]
            batch["fmri_lowfreq_sequence"] = bands["low"]
            batch["fmri_ultralowfreq_sequence"] = bands["ultralow"]
        if cfg.dataset_name == "multimodal_prs":
            batch["prs"] = np.stack([r.prs for r in recs]).astype(np.float32)
        return batch, names

    def epoch(self, split: str, epoch: int = 0, shuffle: Optional[bool] = None,
              to_device: bool = True
              ) -> Iterator[Tuple[Dict, List[str]]]:
        """Yield (batch, subject_names). With ``to_device`` the batch is
        committed to the mesh ('data'-sharded) with a one-deep lookahead so
        host IO overlaps device compute."""
        if shuffle is None:
            shuffle = split == "train"
        it = self._batches(split, epoch, shuffle)
        if not to_device or self.mesh is None:
            yield from it
            return

        def put(pair):
            batch, names = pair
            dev = shard_batch(batch, self.mesh)
            dev = device_preprocess(dev, self.cfg)
            return dev, names

        pending = None
        for pair in it:
            nxt = put(pair)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending
