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
