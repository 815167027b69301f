from aec_tpu.ops import gru
from aec_tpu.ops.gru import GruParams, gru_init, gru_cell, gru_scan

__all__ = ["gru", "GruParams", "gru_init", "gru_cell", "gru_scan"]
