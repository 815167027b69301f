"""Analysis windows.

The reference obtains its window via ``scipy.signal.get_window(win_type,
win_len, fftbins=True)`` (attention_ccrn.py:12), i.e. the *periodic* variant.
We generate the same windows directly so the DSP core has no scipy dependency
on the device path (host-side float64, cast at use sites).
"""

from __future__ import annotations

import numpy as np


def periodic_window(win_type: str | None, win_len: int) -> np.ndarray:
    """Periodic (DFT-even) window of length ``win_len`` as float64.

    Supports the window families the framework uses. ``None``/``"None"``/
    ``"rect"`` give the all-ones window (attention_ccrn.py:9-10 semantics).
    """
    if win_type is None or win_type in ("None", "rect", "boxcar", "ones"):
        return np.ones(win_len, dtype=np.float64)
    n = np.arange(win_len, dtype=np.float64)
    phase = 2.0 * np.pi * n / win_len
    if win_type == "hann":
        return 0.5 - 0.5 * np.cos(phase)
    if win_type == "hamming":
        return 0.54 - 0.46 * np.cos(phase)
    if win_type == "blackman":
        return 0.42 - 0.5 * np.cos(phase) + 0.08 * np.cos(2.0 * phase)
    raise ValueError(f"unsupported window type: {win_type!r}")
