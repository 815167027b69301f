from aec_tpu.linear import nlms, kalman
from aec_tpu.linear.nlms import nlms_init, nlms_step, nlms_filter, nlms_cancel
from aec_tpu.linear.kalman import (
    kalman_init,
    kalman_step,
    kalman_filter,
    kalman_cancel,
)

__all__ = [
    "nlms",
    "kalman",
    "nlms_init",
    "nlms_step",
    "nlms_filter",
    "nlms_cancel",
    "kalman_init",
    "kalman_step",
    "kalman_filter",
    "kalman_cancel",
]
