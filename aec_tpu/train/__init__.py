from aec_tpu.train import metrics, checkpoints, loop

__all__ = ["metrics", "checkpoints", "loop"]
