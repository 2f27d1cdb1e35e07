"""Subject index builder: metadata scan, cohort intersection, target encoding.

Replaces the reference's per-dataset-ctor boilerplate (reference
data_preprocess_and_load/datasets.py:171-212, 369-655 — each class re-reads
``ABCD_phenotype_total.csv``, drops NA targets, intersects with
``multimodal_sub_list.txt``, z-normalizes regression targets over the non-NA
cohort, and resolves per-modality file paths) with ONE shared builder.

File-name conventions are kept identical so a user can point this framework at
data prepared for the reference:
  * fMRI:   <fmri_dir>/sub-<KEY>/desikankilliany_sub-<KEY>.npy  (84 ROIs)
            harvard_oxford variant for 48 ROIs (datasets.py:206-210)
  * DTI:    <dti_dir>/dti_count_<KEY>.npy
  * sMRI:   <smri_dir>/smri_<kind>_<KEY>.npy, kind from dir name
            (datasets.py:454-461)
  * DTI+sMRI: <dir>/dti_count+smri_<kind>_<KEY>.npy
  * HCP:    <hcp_dir>/<SUBJECT>_cortex.npy
  * PRS:    ABCD_EUR_Multibased_PRScsx_PC1-10resid_scaled.csv, columns
            CPeur2/EAeur1/IQeur2 z-scored over the merged cohort
            (datasets.py:720-764)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


@dataclass
class SubjectRecord:
    idx: int
    subject: str
    paths: Dict[str, str]
    target: float
    prs: Optional[np.ndarray] = None


def _smri_kind(path: str) -> str:
    """sMRI measure resolved from directory name (datasets.py:454-461)."""
    for kind in ("area", "cortical_thickness", "meancurv", "volume"):
        if kind in path:
            return kind
    return "cortical_thickness"


def resolve_paths(dataset_name: str, subject: str, cfg) -> Dict[str, str]:
    paths: Dict[str, str] = {}
    if dataset_name in ("fMRI_timeseries", "multimodal", "multimodal_prs"):
        atlas = ("desikankilliany" if cfg.intermediate_vec == 84
                 else "harvard_oxford")
        paths["fmri"] = os.path.join(cfg.fmri_timeseries_path,
                                     f"sub-{subject}",
                                     f"{atlas}_sub-{subject}.npy")
    if dataset_name == "DTI":
        paths["dti"] = os.path.join(cfg.dti_path, f"dti_count_{subject}.npy")
    if dataset_name in ("sMRI",):
        kind = _smri_kind(cfg.smri_path)
        paths["smri"] = os.path.join(cfg.smri_path, f"smri_{kind}_{subject}.npy")
    if dataset_name == "struct":
        kind = _smri_kind(cfg.smri_path)
        paths["smri"] = os.path.join(cfg.smri_path, f"smri_{kind}_{subject}.npy")
        paths["dti"] = os.path.join(cfg.dti_path, f"dti_count_{subject}.npy")
    if dataset_name in ("DTI+sMRI", "multimodal", "multimodal_prs"):
        kind = _smri_kind(cfg.dti_smri_path)
        paths["struct"] = os.path.join(cfg.dti_smri_path,
                                       f"dti_count+smri_{kind}_{subject}.npy")
    if dataset_name == "hcp":
        paths["fmri"] = os.path.join(cfg.hcp_path, f"{subject}_cortex.npy")
    if dataset_name == "fMRI_image":
        # 4-D NIfTI volumes (datasets.py:157: masked_image_sub-<KEY>.nii.gz)
        paths["fmri_image"] = os.path.join(
            cfg.fmri_image_path, f"masked_image_sub-{subject}.nii.gz")
    return paths


def build_hcp_index(cfg, require_target: bool = True
                    ) -> List[SubjectRecord]:
    """HCP cohort (reference datasets.py:60-108): sex from
    HCP_1200_gender.csv (Subject/Gender, M->1), age from
    HCP_1200_precise_age.csv (subject/age, z-scored); subjects come from the
    ``<id>_cortex.npy`` files present in hcp_path."""
    meta_dir = os.path.join(cfg.base_path, "data", "metadata")
    if cfg.target == "age":
        meta = pd.read_csv(cfg.metadata_csv or os.path.join(
            meta_dir, "HCP_1200_precise_age.csv"))
        lookup = meta.set_index(meta["subject"].astype(int))["age"]
        mean, std = float(lookup.mean()), float(lookup.std())
    elif cfg.target == "sex":
        meta = pd.read_csv(cfg.metadata_csv or os.path.join(
            meta_dir, "HCP_1200_gender.csv"))
        lookup = meta.set_index(meta["Subject"].astype(int))["Gender"]
    else:
        # the reference's other-target branch was dead code (datasets.py:84
        # referenced an undefined meta_data — SURVEY §2.3); fail loudly
        raise ValueError(f"HCP supports targets 'sex'/'age', got {cfg.target}")

    records: List[SubjectRecord] = []
    i = 0
    for fname in sorted(os.listdir(cfg.hcp_path)):
        if not fname.endswith("_cortex.npy"):
            continue
        subject = fname.split("_")[0]
        key = int(subject)
        val = lookup.loc[key] if key in lookup.index else None
        if val is None or pd.isna(val):
            # absent OR NaN-valued metadata row: a NaN age would poison the
            # loss, a NaN gender would silently encode as 0.0 (the ABCD
            # path dropna()s; mirror that here)
            if require_target:
                continue
            target = 0.0       # unlabeled serving subject, never read
        elif cfg.target == "age":
            target = (float(val) - mean) / std
        else:
            target = 1.0 if str(val) == "M" else 0.0
        records.append(SubjectRecord(
            idx=i, subject=subject,
            paths=resolve_paths("hcp", subject, cfg), target=target))
        i += 1
    return records


def build_subject_index(cfg, require_target: bool = True
                        ) -> List[SubjectRecord]:
    """Scan metadata, intersect cohorts, encode targets.

    Regression targets are z-scored with the mean/std of the FULL non-NA
    metadata cohort (before intersection), matching datasets.py:193-196.

    ``require_target=False`` (serving): subjects whose target is missing
    or NA stay in the index with a dummy 0.0 target — the deterministic
    predict forward never reads it.
    """
    if cfg.dataset_name == "hcp":
        return build_hcp_index(cfg, require_target=require_target)
    meta_csv = cfg.metadata_csv or os.path.join(
        cfg.base_path, "data", "metadata", "ABCD_phenotype_total.csv")
    meta = pd.read_csv(meta_csv)
    key_col = "subjectkey" if "subjectkey" in meta.columns else meta.columns[0]
    if cfg.target in meta.columns:
        labeled = meta[[key_col, cfg.target]].dropna(axis=0)
        non_na = (labeled if require_target
                  else meta[[key_col, cfg.target]].fillna({cfg.target: 0.0}))
    elif require_target:
        raise KeyError(f"target column {cfg.target!r} not in {meta_csv}")
    else:
        labeled = meta[[key_col]].assign(**{cfg.target: 0.0}).iloc[:0]
        non_na = meta[[key_col]].assign(**{cfg.target: 0.0})

    subjects = list(non_na[key_col].astype(str))
    sub_list = cfg.subject_list_path or os.path.join(cfg.base_path,
                                                     "multimodal_sub_list.txt")
    if os.path.exists(sub_list):
        with open(sub_list) as f:
            intersect = set(f.read().splitlines())
        subjects = sorted(set(subjects) & intersect)
    else:
        subjects = sorted(set(subjects))

    if cfg.fine_tune_task == "regression":
        # stats over the genuinely-labeled rows ONLY: under
        # require_target=False the fillna(0.0) dummies must not shift the
        # z-scoring away from the training-time encoding
        cont_mean = float(labeled[cfg.target].mean())
        cont_std = float(labeled[cfg.target].std())
        if not np.isfinite(cont_std) or cont_std == 0.0:
            cont_mean, cont_std = 0.0, 1.0   # unlabeled serving cohort

    prs_table = None
    if cfg.dataset_name == "multimodal_prs":
        prs_csv = os.path.join(
            cfg.prs_path, "ABCD_EUR_Multibased_PRScsx_PC1-10resid_scaled.csv")
        prs = pd.read_csv(prs_csv)
        prs["subjectkey"] = prs["subjectkey"].astype(str).str.replace("_", "")
        prs = prs[["subjectkey", "CPeur2", "EAeur1", "IQeur2"]].dropna(axis=0)
        merged = non_na.assign(**{key_col: non_na[key_col].astype(str)}).merge(
            prs, how="inner", left_on=key_col, right_on="subjectkey")
        stats = {c: (float(merged[c].mean()), float(merged[c].std()))
                 for c in ("CPeur2", "EAeur1", "IQeur2")}
        prs_table = {
            row["subjectkey"]: np.asarray(
                [(row[c] - stats[c][0]) / stats[c][1]
                 for c in ("CPeur2", "EAeur1", "IQeur2")], dtype=np.float32)
            for _, row in merged.iterrows()}
        subjects = sorted(set(subjects) & set(prs_table))

    lookup = non_na.set_index(non_na[key_col].astype(str))[cfg.target]
    records: List[SubjectRecord] = []
    for i, subject in enumerate(subjects):
        raw_t = lookup.loc[subject]
        raw_t = raw_t.iloc[0] if hasattr(raw_t, "iloc") else raw_t
        if cfg.fine_tune_task == "regression":
            target = (float(raw_t) - cont_mean) / cont_std
        else:
            target = float(raw_t)
        records.append(SubjectRecord(
            idx=i, subject=subject,
            paths=resolve_paths(cfg.dataset_name, subject, cfg),
            target=target,
            prs=None if prs_table is None else prs_table[subject]))
    return records
