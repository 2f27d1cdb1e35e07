"""FIR band-split preprocessing: host (scipy-exact) vs fused device op.

Covers the behavioral contract of reference datasets.py:218-307 (see SURVEY
§2.4): band separation physics, zscore/pad semantics, and host<->device parity.
"""

import numpy as np
import pytest
from scipy import signal

from multimodal_neuroimage_tpu.data import filters as F


def _toy_series(rng, n_roi=84, T=353, tr=0.8):
    """Sum of a slow (<lb) and fast (>lb) sinusoid per ROI."""
    t = np.arange(T) * tr
    slow = np.sin(2 * np.pi * 0.001 * t)          # below 0.0035 Hz
    fast = np.sin(2 * np.pi * 0.05 * t)           # well above
    x = (rng.normal(size=(n_roi, 1)) * slow[None, :]
         + rng.normal(size=(n_roi, 1)) * fast[None, :])
    return x.astype(np.float64)


def test_highpass_separates_bands(rng):
    y = _toy_series(rng)
    bands = F.bandsplit(y, "FIR")
    # the "low" (highpassed) band should correlate with the fast component,
    # the ultralow residual with the slow component
    T = y.shape[1]
    t = np.arange(T) * 0.8
    fast = np.sin(2 * np.pi * 0.05 * t)
    slow = np.sin(2 * np.pi * 0.001 * t)

    def corr(a, b):
        return abs(np.corrcoef(a, b)[0, 1])

    assert corr(bands["low"][0], fast) > 0.9
    assert corr(bands["ultralow"][0], slow) > 0.9


def test_filtfilt_matches_scipy(rng):
    y = _toy_series(rng, n_roi=4)
    taps = F.design_highpass_fir()
    ours = F.filtfilt_fir(y, taps)
    ref = signal.filtfilt(taps, [1.0], y, axis=-1, padlen=3 * len(taps))
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_zscore_and_pad_layout(rng):
    y = rng.normal(size=(84, 353))
    out = F.preprocess_fmri_host(y, "timeseries", sequence_length=368)
    seq = out["fmri_sequence"]
    assert seq.shape == (368, 84)
    pad = 368 - 353
    # front pad//2 rows and back pad-pad//2 rows are zero (datasets.py:229)
    assert np.all(seq[: pad // 2] == 0)
    assert np.all(seq[-(pad - pad // 2):] == 0)
    body = seq[pad // 2: pad // 2 + 353]
    assert abs(body.mean()) < 1e-6 and abs(body.std() - 1) < 1e-4


def test_divided_frequency_keys(rng):
    y = rng.normal(size=(84, 350))
    out = F.preprocess_fmri_host(y, "divided_frequency")
    assert set(out) == {"fmri_sequence", "fmri_lowfreq_sequence",
                        "fmri_ultralowfreq_sequence"}
    for v in out.values():
        assert v.shape == (368, 84) and v.dtype == np.float32


def test_frequency_mode_shape(rng):
    y = rng.normal(size=(84, 353))
    out = F.preprocess_fmri_host(y, "frequency")
    assert out["fmri_sequence"].shape == (184, 84)


@pytest.mark.parametrize("T", [350, 353, 361])
def test_device_bandsplit_matches_host(rng, T):
    from multimodal_neuroimage_tpu.ops.fir import fir_bandsplit_batch

    y = _toy_series(rng, n_roi=84, T=T)
    host = F.preprocess_fmri_host(y, "divided_frequency")

    buf = np.zeros((1, 84, 368), np.float32)
    buf[0, :, :T] = y
    dev = fir_bandsplit_batch(buf, np.array([T], np.int32))

    np.testing.assert_allclose(np.asarray(dev["raw"][0]),
                               host["fmri_sequence"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(dev["low"][0]),
                               host["fmri_lowfreq_sequence"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(dev["ultralow"][0]),
                               host["fmri_ultralowfreq_sequence"], atol=2e-4)


def test_device_bandsplit_batched_mixed_lengths(rng):
    from multimodal_neuroimage_tpu.ops.fir import fir_bandsplit_batch

    lengths = [350, 361]
    buf = np.zeros((2, 84, 368), np.float32)
    series = []
    for i, T in enumerate(lengths):
        y = _toy_series(rng, T=T)
        series.append(y)
        buf[i, :, :T] = y
    dev = fir_bandsplit_batch(buf, np.array(lengths, np.int32))
    for i, T in enumerate(lengths):
        host = F.preprocess_fmri_host(series[i], "divided_frequency")
        np.testing.assert_allclose(np.asarray(dev["low"][i]),
                                   host["fmri_lowfreq_sequence"], atol=2e-4)
