"""Interop with reference torch checkpoints.

The reference pickles its whole ``CheckPoint`` object with ``torch.save``
(tools.py:71-74), so unpickling requires the class importable under the
module names the pickle recorded (``utils.tools`` / ``tools`` /
``__main__``). We register stub modules, load, and convert the state dict
into the aec_tpu LittleNet param pytree — enabling weight-level parity runs
against reference-trained models.
"""

from __future__ import annotations

import sys
import types

import numpy as np


class _CheckPointStub:
    """Shape-compatible stand-in for the reference CheckPoint class."""

    def __init__(self, ckpt_info=None, net_state_dict=None, optim_state_dict=None):
        self.ckpt_info = ckpt_info
        self.net_state_dict = net_state_dict
        self.optim_state_dict = optim_state_dict


def _register_stubs() -> None:
    for mod_name in ("utils.tools", "tools", "utils"):
        if mod_name not in sys.modules:
            mod = types.ModuleType(mod_name)
            sys.modules[mod_name] = mod
        setattr(sys.modules[mod_name], "CheckPoint", _CheckPointStub)


def load_reference_checkpoint(path: str) -> tuple[dict, dict[str, np.ndarray]]:
    """Load a reference ``.pt`` checkpoint -> (ckpt_info, numpy state dict)."""
    import torch

    _register_stubs()
    obj = torch.load(path, map_location="cpu", weights_only=False)
    state = {k: v.detach().cpu().numpy() for k, v in obj.net_state_dict.items()}
    return dict(obj.ckpt_info or {}), state


def little_net_params_from_state_dict(state: dict[str, np.ndarray]) -> dict:
    """Map the reference ``Little_net`` state dict (ERB.py:213-217 modules:
    gru1/linear1/linear2; ConvSTFT buffers ignored — our DSP is analytic)
    onto the aec_tpu pytree layout."""
    import jax.numpy as jnp

    def arr(key):
        return jnp.asarray(state[key])

    return {
        "gru": {
            "w_ih": arr("gru1.weight_ih_l0"),
            "w_hh": arr("gru1.weight_hh_l0"),
            "b_ih": arr("gru1.bias_ih_l0"),
            "b_hh": arr("gru1.bias_hh_l0"),
        },
        "lin1": {"w": arr("linear1.weight"), "b": arr("linear1.bias")},
        "lin2": {"w": arr("linear2.weight"), "b": arr("linear2.bias")},
    }


def state_dict_from_little_net_params(params) -> dict[str, np.ndarray]:
    """Inverse mapping, for exporting our weights to reference tooling."""
    return {
        "gru1.weight_ih_l0": np.asarray(params["gru"]["w_ih"]),
        "gru1.weight_hh_l0": np.asarray(params["gru"]["w_hh"]),
        "gru1.bias_ih_l0": np.asarray(params["gru"]["b_ih"]),
        "gru1.bias_hh_l0": np.asarray(params["gru"]["b_hh"]),
        "linear1.weight": np.asarray(params["lin1"]["w"]),
        "linear1.bias": np.asarray(params["lin1"]["b"]),
        "linear2.weight": np.asarray(params["lin2"]["w"]),
        "linear2.bias": np.asarray(params["lin2"]["b"]),
    }
