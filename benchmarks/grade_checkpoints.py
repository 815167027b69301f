"""Grade the shipped stage-2 checkpoints over the full 8-scene battery.

For every scene in benchmarks/scenes.py and every shipped checkpoint,
runs the complete two-stage pipeline (quality="parity" defaults) and
reports:

- tail ERLE of stage-1 alone and of the two-stage output (echo suppression);
- STOI and from-spec PESQ of the two-stage output against the near-end
  signal on scenes that have one (double talk) — the speech-preservation
  axis the reference's broken measure.py intended (measure.py:5).

Prints one JSON line; the artifact (benchmarks/results/
checkpoint_quality_r5[_gn].json; earlier rounds preserved under their own
names) is MERGED, not overwritten: existing rows for other checkpoints
survive a re-grade of one candidate (round-4 verdict item 7). Round-4
added an SI-SNR column on scenes with an active near end (the
speech-preservation axis). Runs fine on CPU (quality grading, not a
benchmark).
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    from aec_tpu.configs import KalmanConfig
    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.models.little_net import little_net_init
    from aec_tpu.pipeline.two_stage import two_stage_cancel
    from aec_tpu.train import checkpoints
    from aec_tpu.train.pesq import pesq
    from aec_tpu.train.stoi import stoi
    from benchmarks.scenes import erle_tail, make_scenes

    ckpt_dir = os.path.join(os.path.dirname(__file__), "..", "checkpoints")
    ckpts = {
        "specialist": os.path.join(ckpt_dir, "little_net_synthetic.npz"),
        "robust": os.path.join(ckpt_dir, "little_net_robust.npz"),
        "general": os.path.join(ckpt_dir, "little_net_general.npz"),
    }
    # extra candidates from argv: name=path pairs
    import sys

    gain_norm = "--gain-norm" in sys.argv
    for arg in sys.argv[1:]:
        if arg.startswith("--"):
            continue
        name, _, path = arg.partition("=")
        ckpts[name] = path
    erb = jnp.asarray(erb_filterbank())
    scenes = make_scenes(np.random.default_rng(0), n=4 * 16384)

    results = {}
    for name, path in ckpts.items():
        if not os.path.isfile(path):
            continue
        # template width inferred from the stored GRU recurrent matrix
        # (3H, H) so widened round-5 checkpoints restore cleanly
        with np.load(path) as z:
            h = z["['params']['gru']['w_hh']"].shape[-1]
        params = checkpoints.restore(
            path,
            {"params": little_net_init(jax.random.PRNGKey(0), width=h // 32)},
        )["params"]
        rows = {}
        for scene, (far, mic, near) in scenes.items():
            out = two_stage_cancel(
                params, jnp.asarray(far), jnp.asarray(mic), erb,
                stage1="kalman", lin_cfg=KalmanConfig(),
                gain_norm=gain_norm,
            )
            wav = np.asarray(out["wav"])
            row = {
                "stage1_erle_db": round(
                    erle_tail(mic, np.asarray(out["linear_wav"])), 2
                ),
                "two_stage_erle_db": round(erle_tail(mic, wav), 2),
            }
            if near.any():
                from aec_tpu.train.metrics import si_snr

                row["stoi"] = round(float(stoi(near, wav)), 4)
                row["sisnr_db"] = round(
                    float(si_snr(jnp.asarray(wav)[None], jnp.asarray(near)[None])), 2
                )
                try:
                    row["pesq_from_spec"] = round(
                        pesq(near.astype(np.float64), wav.astype(np.float64)), 3
                    )
                except ValueError:
                    pass
            rows[scene] = row
            print(name, scene, row, flush=True)
        results[name] = rows
    print(json.dumps(results))
    path = os.path.join(
        os.path.dirname(__file__), "results",
        "checkpoint_quality_r5_gn.json" if gain_norm
        else "checkpoint_quality_r5.json",
    )
    # merge-update + atomic replace: re-grading one candidate must not
    # drop the other checkpoints' graded rows (round-4 verdict item 7)
    merged = {}
    if os.path.isfile(path):
        with open(path) as fh:
            merged = json.load(fh)
    merged.update(results)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(merged, fh, indent=1)
    os.replace(tmp, path)


if __name__ == "__main__":
    main()
