"""Synthetic AEC scene battery, incl. the speech-realistic regimes.

Round-2 review finding: every quality grade ran on white/speech-shaped noise
through LINEAR synthetic RIRs — the friendliest class. This battery adds the
regimes AEC papers actually test (AEC-Challenge data contract,
reference `generate_h5files/train_wav2h5.py:10-52` packs exactly such
far/echo/near/mic quadruples):

- ``speech_far``      — harmonic far-end with pitch drift, syllabic AM and
                        pauses (the nonstationary excitation that slows
                        adaptive-filter convergence vs white noise);
- ``nonlinear``       — memoryless loudspeaker saturation (soft-clip tanh ->
                        odd harmonics) BEFORE the echo path; the linear
                        canceller can only remove the linear component, so
                        converged ERLE saturates low and precision effects
                        show on a realistic floor;
- ``bulk_delay``      — 30 ms of pure delay in the echo path (far-end
                        buffering), inside the 10x256-tap partition span;
- ``speech_dtalk``    — speech-like far AND near simultaneously (double
                        talk in the hardest regime);
- plus the four round-2 scenes (white echo-only, long RIR, sine double
  talk, mid-utterance path change) kept verbatim for comparability.

All scenes are (far, mic, near) float32 triples at 16 kHz; ``near`` is zeros
where no near-end source exists (so ERLE numerators are honest).
"""

from __future__ import annotations

import numpy as np

SR = 16000


def _rir(rng, length, decay):
    h = np.exp(-np.arange(length) / decay) * rng.standard_normal(length)
    return (0.5 * h / np.abs(h).max()).astype(np.float32)


def speech_like(rng, n, *, f0=120.0, gain=1.0):
    """Speech-like test signal: drifting-pitch harmonic stack * syllabic
    envelope with silent gaps + a small noise floor. Deterministic given rng.
    Peak-normalized to ``gain``."""
    t = np.arange(n) / SR
    f0_t = f0 * (1.0 + 0.08 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 6.28)))
    phase = 2 * np.pi * np.cumsum(f0_t) / SR
    sig = np.zeros(n)
    for k, a in ((1, 1.0), (2, 0.6), (3, 0.45), (4, 0.3), (5, 0.2), (6, 0.12)):
        sig += a * np.sin(k * phase + rng.uniform(0, 6.28))
    # syllabic (~3-4 Hz) amplitude modulation with real pauses
    env = np.sin(2 * np.pi * 3.3 * t + rng.uniform(0, 6.28)) + 0.25
    env = np.clip(env, 0.0, None) ** 1.5
    sig = sig * env + 0.02 * rng.standard_normal(n)
    sig = sig / (np.abs(sig).max() + 1e-9)
    return (gain * sig).astype(np.float32)


def loudspeaker(x, drive=2.5):
    """Memoryless loudspeaker saturation: tanh soft clip (odd harmonics)."""
    return (np.tanh(drive * x) / drive).astype(np.float32)


def make_scenes(rng, n=8 * 16384, kinds=None) -> dict:
    """Return {name: (far, mic, near)}; all arrays [n] float32."""
    out = {}
    t = np.arange(n)
    zeros = np.zeros(n, np.float32)

    def conv(x, h):
        return np.convolve(x, h)[:n].astype(np.float32)

    # --- round-2 comparability scenes (identical construction) ---
    far = rng.standard_normal(n).astype(np.float32)
    out["echo_only"] = (far, conv(far, _rir(rng, 512, 100)), zeros)

    far2 = rng.standard_normal(n).astype(np.float32)
    out["long_rir"] = (far2, conv(far2, _rir(rng, 2048, 400)), zeros)

    far3 = rng.standard_normal(n).astype(np.float32)
    near3 = (0.3 * np.sin(2 * np.pi * 440 * t / SR)).astype(np.float32)
    out["double_talk"] = (far3, conv(far3, _rir(rng, 512, 100)) + near3, near3)

    far4 = rng.standard_normal(n).astype(np.float32)
    e1 = conv(far4, _rir(rng, 512, 100))
    e2 = conv(far4, _rir(rng, 512, 80))
    half = n // 2
    out["path_change"] = (
        far4, np.concatenate([e1[:half], e2[half:]]).astype(np.float32), zeros,
    )

    # --- round-3 speech-realistic battery ---
    far5 = speech_like(rng, n, f0=118.0)
    out["speech_far"] = (far5, conv(far5, _rir(rng, 512, 100)), zeros)

    far6 = speech_like(rng, n, f0=132.0)
    out["nonlinear"] = (
        far6, conv(loudspeaker(far6, drive=2.5), _rir(rng, 512, 100)), zeros,
    )

    far7 = rng.standard_normal(n).astype(np.float32)
    delay = int(0.030 * SR)  # 30 ms bulk delay
    echo7 = np.concatenate(
        [np.zeros(delay, np.float32), conv(far7, _rir(rng, 512, 100))[:-delay]]
    )
    out["bulk_delay"] = (far7, echo7.astype(np.float32), zeros)

    far8 = speech_like(rng, n, f0=112.0)
    near8 = speech_like(rng, n, f0=205.0, gain=0.4)
    out["speech_dtalk"] = (
        far8, (conv(far8, _rir(rng, 512, 100)) + near8).astype(np.float32),
        near8.astype(np.float32),
    )

    if kinds is not None:
        out = {k: out[k] for k in kinds}
    return out


def erle_tail(mic, e, frac=0.25):
    """Converged-tail ERLE in dB (last ``frac`` of the utterance)."""
    lo = int(len(mic) * (1 - frac))
    num = float(np.sum(np.asarray(mic[lo:]) ** 2))
    den = float(np.sum(np.asarray(e[lo:]) ** 2)) + 1e-12
    return 10.0 * np.log10(num / den + 1e-12)
