from aec_tpu.dsp import stft, erb, windows  # submodules
from aec_tpu.dsp.stft import (
    StftConfig,
    analysis_matrix,
    synthesis_matrix,
    frame_signal,
    overlap_add,
    ola_envelope,
    split_complex,
    magnitude,
    num_frames,
)
from aec_tpu.dsp.erb import erb_filterbank, freq_to_erb, erb_to_freq
from aec_tpu.dsp.windows import periodic_window

__all__ = [
    "stft",
    "erb",
    "windows",
    "StftConfig",
    "analysis_matrix",
    "synthesis_matrix",
    "frame_signal",
    "overlap_add",
    "ola_envelope",
    "split_complex",
    "magnitude",
    "num_frames",
    "erb_filterbank",
    "freq_to_erb",
    "erb_to_freq",
    "periodic_window",
]
