from aec_tpu.utils import tools, torch_compat

__all__ = ["tools", "torch_compat"]
