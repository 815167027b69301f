"""Export a framework checkpoint to the reference's ``.pt`` format.

Closes the interop loop: ``torch_compat.load_reference_checkpoint`` imports
reference-trained models; this CLI exports OUR trained LittleNet /
TwoLayerGRU checkpoints so the reference's own tooling (test.py Tester,
tools.py CheckPoint.load — strict state-dict load) runs them unchanged.
The pickle layout matches tools.py:65-82 (whole CheckPoint object via
torch.save), including the fixed ConvSTFT/ConviSTFT buffers the reference
registers (attention_ccrn.py:39,72-80).

  python -m aec_tpu.cli.export_pt --model_file exp/models/best_loss.npz \
      --out best_loss.pt [--model little_net]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from aec_tpu.train import checkpoints
from aec_tpu.utils.tools import get_logger

logger = get_logger(__name__)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Export .npz checkpoint to reference .pt")
    p.add_argument("--model_file", required=True, help="framework .npz checkpoint")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--model", default="little_net",
                   choices=("little_net", "two_layer_gru"),
                   help="family (both use the reference gru1/linear1/linear2 "
                        "module names, ERB.py:84-88/213-217)")
    args = p.parse_args(argv)

    import torch

    from aec_tpu.utils.torch_compat import (
        save_reference_checkpoint,
        state_dict_from_little_net_params,
    )

    if args.model == "little_net":
        from aec_tpu.models.little_net import little_net_init as init_fn
    else:
        from aec_tpu.models.two_layer_gru import two_layer_gru_init as init_fn

    params = checkpoints.restore(
        args.model_file, {"params": init_fn(jax.random.PRNGKey(0))}
    )["params"]
    info = checkpoints.load_info(args.model_file)
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in state_dict_from_little_net_params(params).items()
    }
    save_reference_checkpoint(
        args.out, info or {"cur_epoch": 0, "cur_iter": 0}, sd
    )
    logger.info("wrote %s (%d tensors)", args.out, len(sd))
    print(args.out)


if __name__ == "__main__":
    main()
