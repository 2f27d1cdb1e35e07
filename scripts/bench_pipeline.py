"""Input-pipeline benchmark: host preprocess -> HBM throughput (GB/s).

Measures BASELINE.json's second metric ("NIfTI->HBM preprocess GB/s"): the
rate at which raw on-disk subject data (npy ROI timeseries, the same payload
the reference loads per item at datasets.py:218-307) can be parsed, FIR
band-split (filtfilt, 65 taps), z-scored, padded to the static (368, 84)
shape, batched, and committed to device HBM.

Compares the C++ fastpipe path (native/fastpipe.cpp, parallel across
subjects) against the numpy/scipy fallback (data/filters.py), i.e. the
reference's per-item nitime path. Prints one JSON line.

Run: python scripts/bench_pipeline.py [n_subjects]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    # the axon sitecustomize overrides platform selection at interpreter
    # start; restore the explicitly requested platform so a CPU run cannot
    # hang inside device_put against an unreachable tunnel
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_neuroimage_tpu.data import filters
from multimodal_neuroimage_tpu.data.native import (bandsplit_batch_native,
                                                   native_available)


def make_cohort(root: str, n: int, t: int = 361, r: int = 84):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = os.path.join(root, f"sub{i:04d}.npy")
        np.save(p, rng.normal(size=(t, r)).astype(np.float32))
        paths.append(p)
    return paths, n * t * r * 4


def bench_native(paths, taps, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = bandsplit_batch_native(paths, taps, skip_tr=20, t_max=368,
                                     n_rois=84, nthreads=0)
        best = min(best, time.perf_counter() - t0)
    return best, out


def bench_python(paths, reps=1):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for p in paths:
            y = np.load(p).T[:, 20:]
            bands = filters.bandsplit(y)
            for k in ("raw", "low", "ultralow"):
                arr = filters.zscore(bands[k], axis=None)
                filters.pad_time_axis(arr.T, 368)
        best = min(best, time.perf_counter() - t0)
    return best


def make_nifti_cohort(root: str, n: int, shape=(32, 38, 30, 24), gz=True):
    from multimodal_neuroimage_tpu.data.nifti import write_nifti
    rng = np.random.default_rng(1)
    paths, nbytes = [], 0
    for i in range(n):
        p = os.path.join(root, f"img{i:04d}.nii" + (".gz" if gz else ""))
        write_nifti(p, rng.normal(size=shape).astype(np.float32))
        paths.append(p)
        nbytes += int(np.prod(shape)) * 4
    return paths, nbytes


def bench_nifti(n: int):
    """NIfTI(.nii.gz) -> float32 volumes -> HBM (the literal
    'NIfTI->HBM GB/s' of BASELINE.json metric #2; 4-D fMRI_image path)."""
    from multimodal_neuroimage_tpu.data.native import nifti_batch_native
    from multimodal_neuroimage_tpu.data.nifti import (read_nifti,
                                                      read_nifti_header)
    with tempfile.TemporaryDirectory() as root:
        paths, nbytes = make_nifti_cohort(root, n)
        shape = read_nifti_header(paths[0])
        native_s = None
        out = None
        if native_available():
            native_s = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = nifti_batch_native(paths, shape, 0)
                native_s = min(native_s, time.perf_counter() - t0)
        d2h_s = 0.0
        try:
            import jax
            if out is not None:
                t0 = time.perf_counter()
                jax.block_until_ready(jax.device_put(out))
                d2h_s = time.perf_counter() - t0
        except Exception:
            pass
        n_py = min(n, max(8, n // 8))
        t0 = time.perf_counter()
        for p in paths[:n_py]:
            np.ascontiguousarray(read_nifti(p).astype(np.float32))
        py_s = (time.perf_counter() - t0) * (n / n_py)
        return {
            "nifti_native_GBps": (round(nbytes / (native_s + d2h_s) / 1e9, 3)
                                  if native_s is not None else None),
            "nifti_python_GBps": round(nbytes / py_s / 1e9, 3),
        }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    taps = filters.design_highpass_fir()
    with tempfile.TemporaryDirectory() as root:
        paths, nbytes = make_cohort(root, n)

        native_s, out = (bench_native(paths, taps)
                         if native_available() else (None, None))

        # include the host->HBM device_put in the native figure when a
        # device is reachable (the metric is disk->HBM, not disk->host)
        d2h_s = 0.0
        try:
            import jax
            if out is not None:
                batch = {k: out[k] for k in ("raw", "low", "ultralow")}
                t0 = time.perf_counter()
                dev = jax.device_put(batch)
                jax.block_until_ready(dev)
                d2h_s = time.perf_counter() - t0
        except Exception:
            pass

        n_py = min(n, max(8, n // 8))
        py_s = bench_python(paths[:n_py]) * (n / n_py)

        native_gbps = (nbytes / (native_s + d2h_s) / 1e9
                       if native_s is not None else None)
        py_gbps = nbytes / py_s / 1e9
        print(json.dumps({
            "metric": "preprocess_to_hbm_GBps",
            "value": round(native_gbps if native_gbps else py_gbps, 3),
            "unit": f"GB/s raw->FIR bandsplit->zscore->pad->HBM "
                    f"({n} subjects, incl. device_put)",
            "vs_baseline": round((native_gbps or py_gbps) / py_gbps, 2),
            "python_path_GBps": round(py_gbps, 3),
            **bench_nifti(n),
        }))


if __name__ == "__main__":
    main()
