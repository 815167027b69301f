from aec_tpu.pipeline import audio_io, h5io, features, datasets, two_stage, streaming

__all__ = ["audio_io", "h5io", "features", "datasets", "two_stage", "streaming"]
