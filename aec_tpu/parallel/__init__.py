from aec_tpu.parallel import mesh
from aec_tpu.parallel.mesh import make_mesh, data_sharding, replicated

__all__ = ["mesh", "make_mesh", "data_sharding", "replicated"]
