"""Gradient-boosted-tree scientific baselines (reference baseline/ directory).

Reproduces the reference's XGBoost pipeline (reference
baseline/sex_classification/Xgboost_classification_fMRI.py and its 17
siblings): per (target, modality) —

  1. flatten subject features (fMRI functional-connectivity upper triangle,
     DTI counts, sMRI morphometry matrix, or the multimodal concat);
  2. stratified 5-fold CV grid search over max_depth / min_child_weight /
     gamma / learning_rate / colsample_bytree (Xgboost_*.py:114-187);
  3. refit with the best params and report test AUROC + balanced accuracy
     (Xgboost_*.py:189-268).

Backend: xgboost (``tree_method='hist'`` — TPU hosts have no CUDA, SURVEY
§2.1) when importable, else sklearn HistGradientBoostingClassifier with the
equivalent grid (this image ships no xgboost).

Usage:
    python -m baselines.gbt_baseline --root <cohort_root> --target sex \
        --modality fmri_fc|dti|smri|struct|multimodal
"""

from __future__ import annotations

import argparse
import itertools
import os
from typing import Dict, List, Tuple

import numpy as np
from sklearn import metrics
from sklearn.model_selection import StratifiedKFold

from multimodal_neuroimage_tpu.data.index import build_subject_index
from multimodal_neuroimage_tpu.data.synthetic import synthetic_config
from multimodal_neuroimage_tpu.data.splits import SplitManager


def fmri_fc_features(path: str) -> np.ndarray:
    """Flattened upper-triangle functional connectivity from the ROI
    timeseries (the reference's fMRI feature construction)."""
    y = np.load(path)[20:].T  # (84, T)
    fc = np.corrcoef(y)
    iu = np.triu_indices_from(fc, k=1)
    return fc[iu].astype(np.float32)


def matrix_features(path: str) -> np.ndarray:
    return np.load(path).astype(np.float32).reshape(-1)


def load_features(records, modality: str) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    rows, targets, subs = [], [], []
    for r in records:
        if modality == "fmri_fc":
            rows.append(fmri_fc_features(r.paths["fmri"]))
        elif modality == "dti":
            rows.append(matrix_features(r.paths["dti"]))
        elif modality == "smri":
            rows.append(matrix_features(r.paths["smri"]))
        elif modality == "struct":
            rows.append(matrix_features(r.paths["struct"]))
        elif modality == "multimodal":
            rows.append(np.concatenate([
                fmri_fc_features(r.paths["fmri"]),
                matrix_features(r.paths["struct"])]))
        else:
            raise ValueError(modality)
        targets.append(r.target)
        subs.append(r.subject)
    return np.stack(rows), np.asarray(targets), subs


GRID = {
    # reference Xgboost_*.py:114-123 (reduced 2-point grids)
    "max_depth": [3, 6],
    "min_child_weight": [1, 7],
    "gamma": [0.0, 0.4],
    "learning_rate": [0.05, 0.30],
    "colsample_bytree": [0.6, 0.9],
}


def _make_clf(params: Dict):
    try:
        import xgboost as xgb
        return xgb.XGBClassifier(
            objective="binary:logistic", booster="gbtree", random_state=27,
            eval_metric="auc", tree_method="hist", verbosity=0, **params)
    except ImportError:
        from sklearn.ensemble import HistGradientBoostingClassifier
        return HistGradientBoostingClassifier(
            max_depth=params["max_depth"],
            min_samples_leaf=max(params["min_child_weight"], 1),
            learning_rate=params["learning_rate"],
            l2_regularization=params["gamma"], random_state=27,
            max_features=params["colsample_bytree"])


def find_bestpar(X, y, fold: int = 5, seed: int = 27) -> Dict:
    """5-fold CV grid search maximizing mean valid AUROC
    (Xgboost_*.py:114-187)."""
    best_auc, best = 0.0, None
    skf = StratifiedKFold(n_splits=fold, shuffle=True, random_state=seed)
    for values in itertools.product(*GRID.values()):
        params = dict(zip(GRID.keys(), values))
        aucs = []
        for tr, va in skf.split(X, y):
            clf = _make_clf(params)
            clf.fit(X[tr], y[tr])
            proba = clf.predict_proba(X[va])[:, 1]
            aucs.append(metrics.roc_auc_score(y[va], proba))
        mean_auc = float(np.mean(aucs))
        if mean_auc > best_auc:
            best_auc, best = mean_auc, params
    print(f"best CV AUROC {best_auc:.4f} with {best}")
    return best


def bestpar_tuning(X_train, y_train, X_test, y_test, params: Dict) -> Dict:
    """Refit + test metrics (Xgboost_*.py:189-268)."""
    clf = _make_clf(params)
    clf.fit(X_train, y_train)
    proba = clf.predict_proba(X_test)[:, 1]
    pred = proba > 0.5
    out = {
        "test_AUROC": float(metrics.roc_auc_score(y_test, proba)),
        "test_Balanced_Accuracy": float(
            metrics.balanced_accuracy_score(y_test, pred)),
    }
    print(out)
    return out


def main(argv=None) -> Dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--target", default="sex")
    ap.add_argument("--modality", default="smri",
                    choices=["fmri_fc", "dti", "smri", "struct", "multimodal"])
    ap.add_argument("--fold", type=int, default=5)
    args = ap.parse_args(argv)

    ds = {"fmri_fc": "fMRI_timeseries", "dti": "DTI", "smri": "sMRI",
          "struct": "DTI+sMRI", "multimodal": "multimodal"}[args.modality]
    cfg = synthetic_config(args.root, dataset_name=ds, target=args.target)
    records = build_subject_index(cfg)
    X, y, subs = load_features(records, args.modality)

    train_s, val_s, test_s = SplitManager(
        cfg.base_path, cfg.dataset_name, cfg.seed).split(subs)
    train_mask = np.isin(subs, list(train_s) + list(val_s))
    test_mask = np.isin(subs, list(test_s))

    best = find_bestpar(X[train_mask], y[train_mask], args.fold)
    return bestpar_tuning(X[train_mask], y[train_mask],
                          X[test_mask], y[test_mask], best)


if __name__ == "__main__":
    main()
