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


def save_reference_checkpoint(path: str, ckpt_info: dict, net_state_dict) -> None:
    """Write a ``.pt`` the reference loads WITHOUT this package installed.

    The pickle records the class as ``utils.tools.CheckPoint`` — exactly what
    the reference's own ``torch.save(self, filename)`` produces
    (tools.py:71-74) — so its unpickler resolves to ITS class in ITS
    environment. ``net_state_dict`` values must be torch tensors.
    """
    import torch

    cls = type("CheckPoint", (), {"__init__": _CheckPointStub.__init__})
    cls.__module__ = "utils.tools"
    cls.__qualname__ = "CheckPoint"
    _register_stubs()
    sys.modules["utils.tools"].CheckPoint = cls  # pickle's lookup target
    torch.save(cls(dict(ckpt_info), net_state_dict, None), path)


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


def state_dict_from_little_net_params(
    params, include_dsp_buffers: bool = True
) -> dict[str, np.ndarray]:
    """Inverse mapping, for exporting our weights to reference tooling.

    Also valid for TwoLayerGRUNet params (same module names gru1/linear1/
    linear2, ERB.py:84-88).

    ``include_dsp_buffers`` additionally emits the fixed ConvSTFT/ConviSTFT
    buffers (cpx_stft.weight, istft.weight/window/enframe) the reference
    registers (attention_ccrn.py:39,72-80), built from the same DFT/pinv
    equations — a reference-trained checkpoint carries them, and the
    reference Tester loads state dicts strictly (test.py:124), so full
    interop needs them present.
    """
    sd = {
        "gru1.weight_ih_l0": np.asarray(params["gru"]["w_ih"]),
        "gru1.weight_hh_l0": np.asarray(params["gru"]["w_hh"]),
        "gru1.bias_ih_l0": np.asarray(params["gru"]["b_ih"]),
        "gru1.bias_hh_l0": np.asarray(params["gru"]["b_hh"]),
        "linear1.weight": np.asarray(params["lin1"]["w"]),
        "linear1.bias": np.asarray(params["lin1"]["b"]),
        "linear2.weight": np.asarray(params["lin2"]["w"]),
        "linear2.bias": np.asarray(params["lin2"]["b"]),
    }
    if include_dsp_buffers:
        from aec_tpu.dsp.stft import StftConfig, _bases
        from aec_tpu.dsp.windows import periodic_window

        cfg = StftConfig()
        analysis, synthesis = _bases(cfg)  # (win, 2K), (2K, win) float64
        window = periodic_window(cfg.win_type, cfg.win_len)
        sd["cpx_stft.weight"] = analysis.T.astype(np.float32)[:, None, :]
        sd["istft.weight"] = synthesis.astype(np.float32)[:, None, :]
        sd["istft.window"] = window.astype(np.float32)[None, :, None]
        sd["istft.enframe"] = np.eye(cfg.win_len, dtype=np.float32)[:, None, :]
    return sd


def state_dict_from_dccrn_params(params, state) -> dict[str, np.ndarray]:
    """Export our DCCRN pytree to the reference module layout, enabling
    reference-in-the-loop forward parity with shared weights. Two reference
    targets, auto-detected from the pytree structure:

    - v1 (dccrn.py:453-521): ``encoder.{i}.0`` ComplexConv2d / ``.1``
      BatchNorm2d / ``.2`` PReLU, mirrored ``decoder.{i}`` (Tanh head),
      plain ``lstm`` — requires DccrnConfig(use_clstm=False, use_cbn=False,
      rnn_layers=1);
    - v2 (dccrn2.py): ComplexBatchNorm (Wrr/Wri/Wii/Br/Bi + RM*/RV*
      buffers) when use_cbn, ``enhance.{i}.{real,imag}_lstm`` complex-LSTM
      stack when use_clstm, and a bare-conv final decoder stage (v2_head).
    """
    rnn = params.get("rnn")
    is_clstm = isinstance(rnn, (list, tuple))
    if not is_clstm and ("w_ih" not in rnn):
        raise ValueError(
            "state_dict_from_dccrn_params: unrecognized rnn pytree (expected "
            "a plain-LSTM dict for v1 or a complex-LSTM list for v2)"
        )

    def bn_entries(prefix, layer, lstate):
        if "bn" not in layer:  # v2 bare-conv head
            return {}
        bn = layer["bn"]
        if "scale" in bn:  # real nn.BatchNorm2d
            return {
                f"{prefix}.weight": np.asarray(bn["scale"]),
                f"{prefix}.bias": np.asarray(bn["bias"]),
                f"{prefix}.running_mean": np.asarray(lstate["bn"]["mean"]),
                f"{prefix}.running_var": np.asarray(lstate["bn"]["var"]),
            }
        s = lstate["bn"]  # ComplexBatchNorm (dccrn.py:222-248 names)
        return {
            f"{prefix}.Wrr": np.asarray(bn["w_rr"]),
            f"{prefix}.Wri": np.asarray(bn["w_ri"]),
            f"{prefix}.Wii": np.asarray(bn["w_ii"]),
            f"{prefix}.Br": np.asarray(bn["b_r"]),
            f"{prefix}.Bi": np.asarray(bn["b_i"]),
            f"{prefix}.RMr": np.asarray(s["m_r"]),
            f"{prefix}.RMi": np.asarray(s["m_i"]),
            f"{prefix}.RVrr": np.asarray(s["v_rr"]),
            f"{prefix}.RVri": np.asarray(s["v_ri"]),
            f"{prefix}.RVii": np.asarray(s["v_ii"]),
        }

    def conv_block(prefix, layer, lstate, *, transpose: bool):
        # ours: HWIO (kh, kw, Cin/2, Cout/2); torch Conv2d wants OIHW,
        # torch ConvTranspose2d wants IOHW.
        perm = (2, 3, 0, 1) if transpose else (3, 2, 0, 1)
        out = {
            f"{prefix}.0.real_conv.weight": np.transpose(np.asarray(layer["conv"]["w_r"]), perm),
            f"{prefix}.0.real_conv.bias": np.asarray(layer["conv"]["b_r"]),
            f"{prefix}.0.imag_conv.weight": np.transpose(np.asarray(layer["conv"]["w_i"]), perm),
            f"{prefix}.0.imag_conv.bias": np.asarray(layer["conv"]["b_i"]),
        }
        out.update(bn_entries(f"{prefix}.1", layer, lstate))
        if "prelu" in layer and "bn" in layer:
            out[f"{prefix}.2.weight"] = np.asarray(layer["prelu"]).reshape(1)
        return out

    sd: dict[str, np.ndarray] = {}
    n_dec = len(params["decoder"])
    for i, (layer, lstate) in enumerate(zip(params["encoder"], state["encoder"])):
        sd.update(conv_block(f"encoder.{i}", layer, lstate, transpose=False))
    for i, (layer, lstate) in enumerate(zip(params["decoder"], state["decoder"])):
        block = conv_block(f"decoder.{i}", layer, lstate, transpose=True)
        if i == n_dec - 1:  # v1 head ends in Tanh: no PReLU entry
            block.pop(f"decoder.{i}.2.weight", None)
        sd.update(block)
    if is_clstm:
        for i, lp in enumerate(rnn):
            for part in ("real", "imag"):
                p = lp[part]
                sd.update(
                    {
                        f"enhance.{i}.{part}_lstm.weight_ih_l0": np.asarray(p["w_ih"]),
                        f"enhance.{i}.{part}_lstm.weight_hh_l0": np.asarray(p["w_hh"]),
                        f"enhance.{i}.{part}_lstm.bias_ih_l0": np.asarray(p["b_ih"]),
                        f"enhance.{i}.{part}_lstm.bias_hh_l0": np.asarray(p["b_hh"]),
                    }
                )
    else:
        sd.update(
            {
                "lstm.weight_ih_l0": np.asarray(rnn["w_ih"]),
                "lstm.weight_hh_l0": np.asarray(rnn["w_hh"]),
                "lstm.bias_ih_l0": np.asarray(rnn["b_ih"]),
                "lstm.bias_hh_l0": np.asarray(rnn["b_hh"]),
            }
        )
    return sd
