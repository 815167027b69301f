"""aec_tpu — TPU-native two-stage acoustic echo cancellation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
SZU-Speech/Acoustic-Echo-Cancellation (reference mounted at /root/reference):

- ``aec_tpu.dsp``      — STFT/iSTFT front-end and ERB filterbank (reference:
  Stage2_lhm/scripts/network/attention_ccrn.py:8-101, ERB.py:10-71), built as
  windowed-framing + DFT-basis matmuls that map straight onto the TPU MXU.
- ``aec_tpu.linear``   — stage-1 linear adaptive echo cancellers (freq-domain
  NLMS and partitioned-block frequency-domain Kalman), new components mandated
  by the north star; expressed as per-frame updates inside ``lax.scan`` with
  all frequency bins updated in parallel.
- ``aec_tpu.models``   — stage-2 neural post-filters (LittleNet, TwoLayerGRU,
  DCCRN family) as pure-functional param pytrees.
- ``aec_tpu.pipeline`` — wav -> feature pipeline with the reference h5 ``.ex``
  schema (Stage2_lhm/generate_h5files/*), batched/vmapped on-device variants,
  and a streaming frame-in/frame-out runtime.
- ``aec_tpu.train``    — pjit training loop, checkpoints, metrics.
- ``aec_tpu.parallel`` — device-mesh construction and shardings.
"""

__version__ = "0.1.0"

from aec_tpu import configs  # noqa: F401
