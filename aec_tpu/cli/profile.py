"""Model profiling CLI — params + FLOPs for every registered model family.

Working replacement for the reference's standalone thop script
(scripts/network/testModel.py:105-113), using XLA's compiled-HLO cost
analysis instead of module hooks.

  python -m aec_tpu.cli.profile [--models little_net,dccrn] [--n 16384]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.models.registry import get_model, list_models
from aec_tpu.utils.profiling import flops
from aec_tpu.utils.tools import num_params


def profile_model(name: str, n: int = 16384, batch: int = 1) -> dict:
    spec = get_model(name)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    mic = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    far = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))

    if spec.stateful:
        params, state = spec.init(key)
        fn = lambda p, m, f: spec.apply(p, state, m, f)[0]["wav"]
        cost = flops(fn, params, mic, far)
        count = num_params(params)
    elif name in ("dct_dnn", "dct_cnn"):
        params = spec.init(key)
        fn = lambda p, m: spec.apply(p, m)["wav"]
        cost = flops(fn, params, mic)
        count = num_params(params)
    elif name == "fullsubnet":
        params = spec.init(key)
        fn = lambda p, m, f: spec.apply(p, m, f)["wav"]
        cost = flops(fn, params, mic, far)
        count = num_params(params)
    else:
        params = spec.init(key)
        erb = jnp.asarray(erb_filterbank())
        fn = lambda p, m, f: spec.apply(p, m, f, erb)["wav"]
        cost = flops(fn, params, mic, far)
        count = num_params(params)
    return {
        "model": name,
        "params": count,
        "param_mb": round(count * 4 / 2**20, 3),
        "flops_per_call": cost["flops"],
        "flops_per_sample": cost["flops"] / (batch * n),
        "reference": spec.reference,
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Profile model families")
    p.add_argument("--models", type=str, default=",".join(list_models()))
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args(argv)
    rows = [
        profile_model(name.strip(), args.n, args.batch)
        for name in args.models.split(",")
    ]
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
