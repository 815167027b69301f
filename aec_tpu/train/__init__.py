from aec_tpu.train import metrics, checkpoints, loop, generic, stoi

__all__ = ["metrics", "checkpoints", "loop", "generic", "stoi"]
