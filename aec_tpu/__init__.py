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
  DCCRN family, ATT-CCRN, FullSubNet, DCT nets) as pure-functional pytrees.
- ``aec_tpu.pipeline`` — wav -> feature pipeline with the reference h5 ``.ex``
  schema (Stage2_lhm/generate_h5files/*), batched/vmapped on-device variants,
  two-stage composition, and a streaming frame-in/frame-out runtime.
- ``aec_tpu.train``    — pjit training loop, checkpoints, metrics.
- ``aec_tpu.parallel`` — device-mesh construction, shardings, pipelined
  sequence-parallel scan.
- ``aec_tpu.kernels``  — Pallas TPU kernels.

Convenience top-level API below; see README.md for the tour.
"""

__version__ = "0.1.0"

from aec_tpu import configs  # noqa: F401


def __getattr__(name):
    """Lazy top-level conveniences (avoid importing jax at package import)."""
    lazy = {
        "two_stage_cancel": ("aec_tpu.pipeline.two_stage", "two_stage_cancel"),
        "kalman_cancel": ("aec_tpu.linear.kalman", "kalman_cancel"),
        "nlms_cancel": ("aec_tpu.linear.nlms", "nlms_cancel"),
        "little_net_init": ("aec_tpu.models.little_net", "little_net_init"),
        "little_net_apply": ("aec_tpu.models.little_net", "little_net_apply"),
        "erb_filterbank": ("aec_tpu.dsp.erb", "erb_filterbank"),
        "get_model": ("aec_tpu.models.registry", "get_model"),
        "list_models": ("aec_tpu.models.registry", "list_models"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'aec_tpu' has no attribute {name!r}")
