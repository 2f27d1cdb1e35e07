from multimodal_neuroimage_tpu.data.filters import (  # noqa: F401
    design_highpass_fir,
    filtfilt_fir,
    bandsplit,
    zscore,
    pad_time_axis,
    preprocess_fmri_host,
    spectrum_magnitude,
)
