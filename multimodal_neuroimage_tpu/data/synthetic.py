"""Synthetic ABCD-layout cohort generator (tests / benchmarks).

Writes npy files + metadata CSV in the exact directory/file-name layout the
reference consumes (SURVEY §2.3 datasets row; data/index.py docstring), so the
REAL loading path is exercised end-to-end without ABCD access. Signals are
planted to correlate with the binary target so smoke training can demonstrate
AUROC > 0.5.

Shapes follow the reference contract (SURVEY §2.4):
  * fMRI ROI timeseries: (20 + T, 84) with T in [350, 361] — loader drops the
    first 20 TRs (datasets.py:222)
  * DTI / sMRI / DTI+sMRI matrices: (84, 84)
  * PRS csv: CPeur2/EAeur1/IQeur2 columns
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pandas as pd


def generate_synthetic_cohort(
    root: str,
    n_subjects: int = 32,
    seed: int = 55555555,
    n_rois: int = 84,
    targets: Optional[List[str]] = None,
    include_fmri_image: bool = False,
    smri_signal: float = 0.5,
    smri_strength_noise: float = 0.0,
) -> str:
    """Create a synthetic cohort under ``root``; returns ``root``.

    Layout written:
      root/data/metadata/ABCD_phenotype_total.csv
      root/multimodal_sub_list.txt
      root/data/fmri_timeseries/sub-<K>/desikankilliany_sub-<K>.npy
      root/data/dti/dti_count_<K>.npy
      root/data/smri_cortical_thickness/smri_cortical_thickness_<K>.npy
      root/data/dti+smri_cortical_thickness/dti_count+smri_cortical_thickness_<K>.npy
      root/data/prs/ABCD_EUR_Multibased_PRScsx_PC1-10resid_scaled.csv
      root/data/fmri_image/masked_image_sub-<K>.nii.gz   (include_fmri_image)
    """
    targets = targets or ["sex", "ADHD_label", "age", "nihtbx_totalcomp_uncorrected", "BMI"]
    rng = np.random.default_rng(seed)
    keys = [f"NDARSYN{i:06d}" for i in range(n_subjects)]
    sex = rng.integers(0, 2, n_subjects)
    adhd = rng.integers(0, 2, n_subjects)
    age = rng.normal(120.0, 8.0, n_subjects)
    iq = rng.normal(100.0, 15.0, n_subjects)
    bmi = rng.normal(18.0, 3.0, n_subjects)

    meta_dir = os.path.join(root, "data", "metadata")
    fmri_dir = os.path.join(root, "data", "fmri_timeseries")
    dti_dir = os.path.join(root, "data", "dti")
    smri_dir = os.path.join(root, "data", "smri_cortical_thickness")
    dti_smri_dir = os.path.join(root, "data", "dti+smri_cortical_thickness")
    prs_dir = os.path.join(root, "data", "prs")
    img_dir = os.path.join(root, "data", "fmri_image")
    for d in (meta_dir, fmri_dir, dti_dir, smri_dir, dti_smri_dir, prs_dir,
              img_dir):
        os.makedirs(d, exist_ok=True)

    cols = {"subjectkey": keys}
    for t in targets:
        cols[t] = {"sex": sex.astype(float), "ADHD_label": adhd.astype(float),
                   "age": age, "nihtbx_totalcomp_uncorrected": iq,
                   "BMI": bmi}.get(t, rng.normal(0, 1, n_subjects))
    pd.DataFrame(cols).to_csv(
        os.path.join(meta_dir, "ABCD_phenotype_total.csv"), index=False)

    with open(os.path.join(root, "multimodal_sub_list.txt"), "w") as f:
        f.write("\n".join(keys) + "\n")

    pd.DataFrame({
        "subjectkey": [k[:4] + "_" + k[4:] for k in keys],
        "CPeur2": iq / 100 + rng.normal(0, 0.1, n_subjects),
        "EAeur1": iq / 120 + rng.normal(0, 0.1, n_subjects),
        "IQeur2": iq / 90 + rng.normal(0, 0.1, n_subjects),
    }).to_csv(os.path.join(
        prs_dir, "ABCD_EUR_Multibased_PRScsx_PC1-10resid_scaled.csv"),
        index=False)

    t_axis = np.arange(20 + 361) * 0.8
    for i, key in enumerate(keys):
        srng = np.random.default_rng(seed + 1000 + i)
        T = int(srng.integers(350, 362))
        # fMRI: pink-ish noise + a sex-dependent slow oscillation in half the ROIs
        sig = srng.normal(0, 1.0, (20 + T, n_rois)).astype(np.float64)
        carrier = np.sin(2 * np.pi * 0.01 * t_axis[:20 + T])[:, None]
        sig[:, : n_rois // 2] += (0.8 if sex[i] else 0.2) * carrier
        sub_dir = os.path.join(fmri_dir, f"sub-{key}")
        os.makedirs(sub_dir, exist_ok=True)
        np.save(os.path.join(sub_dir, f"desikankilliany_sub-{key}.npy"),
                sig.astype(np.float32))

        if include_fmri_image:
            # small 4-D volume (reference datasets.py:130-169 loads full-res
            # NIfTI; the synthetic stand-in keeps the same reader contract)
            from multimodal_neuroimage_tpu.data.nifti import write_nifti
            vol = srng.normal(0, 1.0, (12, 14, 12, 24)).astype(np.float32)
            write_nifti(os.path.join(
                img_dir, f"masked_image_sub-{key}.nii.gz"), vol)

        # DTI: symmetric nonneg counts with target-linked block strength
        base = srng.gamma(2.0, 50.0, (n_rois, n_rois))
        base = (base + base.T) / 2
        base[:10, :10] *= (1.6 if sex[i] else 1.0)
        base[10:20, 10:20] *= (1.6 if adhd[i] else 1.0)
        np.fill_diagonal(base, 0.0)
        np.save(os.path.join(dti_dir, f"dti_count_{key}.npy"),
                base.astype(np.float32))

        # sMRI: cortical thickness style matrix. The planted block shift is
        # class-signed with optional PER-SUBJECT strength noise: with
        # smri_strength_noise > 0 the class strength distributions overlap,
        # bounding the Bayes-optimal subject-level AUROC below 1.0
        # (~Phi(2*signal/(noise*sqrt(2)))) — used by behavioral_parity to
        # de-saturate the task so val-AUROC trajectories carry information
        # (VERDICT r4 #7). Default noise 0.0 keeps the legacy separable
        # cohort every other test trains on.
        smri = srng.normal(2.5, 0.3, (n_rois, n_rois))
        strength = smri_signal * (1 if sex[i] else -1)
        if smri_strength_noise:
            # draw only when enabled so the legacy cohorts (noise=0) keep
            # their exact per-subject RNG streams for the golden tests
            strength += smri_strength_noise * srng.normal()
        smri[:10, :10] += strength
        np.save(os.path.join(smri_dir,
                             f"smri_cortical_thickness_{key}.npy"),
                smri.astype(np.float32))

        # combined: sMRI volume on the diagonal, DTI counts off-diagonal
        # (datasets.py:548 comment)
        comb = base.copy()
        np.fill_diagonal(comb, np.abs(srng.normal(3.0, 0.5, n_rois))
                         + (0.5 if sex[i] else 0.0))
        np.save(os.path.join(
            dti_smri_dir, f"dti_count+smri_cortical_thickness_{key}.npy"),
            comb.astype(np.float32))
    return root


def generate_synthetic_hcp(root: str, n_subjects: int = 16,
                           seed: int = 55555555) -> str:
    """HCP-layout cohort: <id>_cortex.npy (22 ROIs, 900-1200 TRs) +
    HCP_1200_gender.csv / HCP_1200_precise_age.csv metadata."""
    rng = np.random.default_rng(seed)
    hcp_dir = os.path.join(root, "data", "hcp")
    meta_dir = os.path.join(root, "data", "metadata")
    os.makedirs(hcp_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)
    ids = [100000 + i for i in range(n_subjects)]
    gender = rng.integers(0, 2, n_subjects)
    age = rng.normal(28.0, 4.0, n_subjects)
    pd.DataFrame({"Subject": ids,
                  "Gender": ["M" if g else "F" for g in gender]}).to_csv(
        os.path.join(meta_dir, "HCP_1200_gender.csv"), index=False)
    pd.DataFrame({"subject": ids, "age": age}).to_csv(
        os.path.join(meta_dir, "HCP_1200_precise_age.csv"), index=False)
    for i, sid in enumerate(ids):
        srng = np.random.default_rng(seed + 50_000 + i)
        T = int(srng.integers(900, 1201))
        sig = srng.normal(0, 1, (22, T)).astype(np.float32)
        sig[:11] += (0.7 if gender[i] else 0.1) * np.sin(
            2 * np.pi * 0.01 * np.arange(T) * 0.72)[None, :]
        np.save(os.path.join(hcp_dir, f"{sid}_cortex.npy"), sig)
    return root


def synthetic_config(root: str, **overrides):
    """A Config pointed at a synthetic cohort directory."""
    from multimodal_neuroimage_tpu.config import Config
    base = dict(
        base_path=root,
        fmri_timeseries_path=os.path.join(root, "data", "fmri_timeseries"),
        dti_path=os.path.join(root, "data", "dti"),
        smri_path=os.path.join(root, "data", "smri_cortical_thickness"),
        dti_smri_path=os.path.join(root, "data", "dti+smri_cortical_thickness"),
        prs_path=os.path.join(root, "data", "prs"),
        hcp_path=os.path.join(root, "data", "hcp"),
        fmri_image_path=os.path.join(root, "data", "fmri_image"),
    )
    base.update(overrides)
    return Config(**base)
