from aec_tpu.train import metrics

__all__ = ["metrics"]
