from aec_tpu.models import little_net, two_layer_gru
from aec_tpu.models.little_net import (
    LittleNetParams,
    little_net_init,
    little_net_apply,
    little_net_loss,
)
from aec_tpu.models.two_layer_gru import two_layer_gru_init, two_layer_gru_apply

__all__ = [
    "little_net",
    "two_layer_gru",
    "LittleNetParams",
    "little_net_init",
    "little_net_apply",
    "little_net_loss",
    "two_layer_gru_init",
    "two_layer_gru_apply",
]
