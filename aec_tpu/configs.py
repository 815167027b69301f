"""Typed configuration system.

Replaces the reference's module-level config dicts
(Stage2_lhm/scripts/configs.py:1-57) with frozen dataclasses carrying the
same default values, so runs are reproducible and configs hashable (usable as
static args under ``jax.jit``).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SpeechConfig:
    """Front-end / signal configuration (reference configs.py:1-8)."""

    in_norm: bool = True
    sample_rate: int = 16000
    win_size: int = 512
    hop_size: int = 256
    win_type: str = "hann"

    @property
    def n_freqs(self) -> int:
        return self.win_size // 2 + 1


@dataclasses.dataclass(frozen=True)
class ErbConfig:
    """ERB filterbank configuration (reference configs.py:21-27)."""

    n_freqs: int = 257
    sample_rate: int = 16000
    total_erb_bands: int = 32
    low_freq: float = 0.0
    max_freq: float = 8000.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer / loop configuration (reference configs.py:10-19).

    ``zero_grad`` notes a deliberate divergence: the reference training loop
    never calls ``optimizer.zero_grad()`` (train1.py:204-218), accumulating
    gradients forever — a genuine bug we do not reproduce.
    """

    lr: float = 1e-5
    lr_decay_factor: float = 0.5
    lr_decay_period: int = 5  # epochs between stepwise lr decays
    clip_norm: float = -1.0  # < 0 disables clipping (reference semantics)
    max_n_epochs: int = 50
    batch_size: int = 16
    logging_period: int = 0  # 0 -> once per epoch (train1.py:105)
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class NlmsConfig:
    """Stage-1 frequency-domain (multidelay) NLMS.

    New component (no reference implementation exists; BASELINE.json config
    #1: 512-pt STFT, hop 256, single far-end/mic pair).
    """

    n_blocks: int = 10  # far-end history partitions (filter taps per bin)
    mu: float = 0.5  # step size
    eps: float = 1e-6  # absolute regularizer in the normalized update
    power_smooth: float = 0.9  # smoothing of the per-bin far-end power
    # Robustness terms (round-3; measured on the 8-scene battery in
    # benchmarks/scenes.py at 8 s, tail ERLE vs the classic eps-only update):
    #   den = power + eps + eps_rel*mean_k(power) + beta*psi(|E|^2)
    # - eps_rel protects near-silent bins of HARMONIC far-ends (between
    #   partials / syllabic pauses the classic update divides by ~0 power and
    #   injects energy: speech_far -36 dB, nonlinear -14 dB tail ERLE);
    # - beta (error-power step control, the same psi term the Kalman carries)
    #   freezes adaptation under near-end activity: speech double-talk
    #   +3.3 -> +10.6 dB, speech_far -> +33 dB, and white-noise scenes
    #   IMPROVE too (echo_only 73 -> 88 dB); path-change reconvergence pays
    #   ~5 dB. Set eps_rel=0, beta=0 for the classic textbook NLMS.
    eps_rel: float = 0.1  # regularization relative to broadband far power
    beta: float = 1.0  # error-power (double-talk) step control
    err_smooth: float = 0.5  # smoothing of the residual psd estimate psi


@dataclasses.dataclass(frozen=True)
class KalmanConfig:
    """Stage-1 partitioned-block frequency-domain Kalman filter.

    New component (BASELINE.json config #2: 10-block partition).
    Diagonal state covariance per (block, bin); transition factor ``a``
    models echo-path drift (Enzner & Vary 2006 style state-space FDAF).
    """

    n_blocks: int = 10
    # state transition factor: (1-a^2)|W|^2 is the process noise keeping the
    # filter adaptive. 0.999 re-converges after abrupt echo-path changes
    # (24 dB within 4 s, tested) with equal steady-state ERLE; 0.9999 nearly
    # freezes after convergence.
    a: float = 0.999
    psi_floor: float = 1e-10  # floor for covariance / psd estimates
    obs_smooth: float = 0.5  # smoothing for observation-noise psd estimate
    # ABSOLUTE process-noise floor added to the covariance prediction
    # (p_pred += q_min). The default multiplicative process noise
    # (1-a^2)|W|^2 vanishes at W=0, which admits a measured cold-start
    # DEADLOCK: a far-end onset whose echo has not arrived yet makes the
    # filter confidently learn W=0 (covariance -> floor), the uncancelled
    # echo then inflates the observation-noise psd, and the frozen filter
    # never escapes (1.2 dB ERLE after 8 s; triggered by sub-block-aligned
    # silent far prefixes with ~0.5-block residual delay — see
    # dsp/delay.py, tests/test_delay.py). q_min=1e-3 restores 33 dB there
    # at ~5 dB steady-state cost on deep-convergence scenes (47.8 -> 43.0),
    # so it is OFF by default; block-quantized pre-alignment (dsp/delay)
    # avoids the trigger instead.
    q_min: float = 0.0
    init_p: float = 10.0  # initial state covariance (fast initial adaptation)


@dataclasses.dataclass(frozen=True)
class LittleNetConfig:
    """Production model hyperparameters (reference ERB.py:203-229)."""

    erb_bands: int = 32
    gru_hidden: int = 32  # == erb_bands (ERB.py:213)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Data pipeline configuration."""

    sample_rate: int = 16000
    bucket_quantum: int = 4096  # pad lengths up to a multiple (static shapes)


DEFAULT_SPEECH = SpeechConfig()
DEFAULT_ERB = ErbConfig()
DEFAULT_TRAIN = TrainConfig()
DEFAULT_NLMS = NlmsConfig()
DEFAULT_KALMAN = KalmanConfig()
