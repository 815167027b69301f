"""Training CLI (reference: scripts/train1.py:349-391 arg surface).

  python -m aec_tpu.cli.train --tr_list lists/tr_list.txt --cv_file cv.ex \
      --ckpt_dir exp [--resume_model exp/models/latest.npz] [--mesh]
"""

from __future__ import annotations

import argparse
import pprint

from aec_tpu.configs import TrainConfig
from aec_tpu.pipeline.h5io import read_filelist
from aec_tpu.train.loop import Trainer
from aec_tpu.utils.tools import get_logger

logger = get_logger(__name__)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Train the stage-2 post-filter",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--tr_list", type=str, required=True, help="training .ex filelist")
    p.add_argument("--cv_file", type=str, required=True, help="grouped cv .ex file")
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--time_log", type=str, default="")
    p.add_argument("--loss_log", type=str, default="loss.txt")
    p.add_argument("--resume_model", type=str, default="")
    p.add_argument("--mesh", action="store_true", help="shard batches over all chips")
    p.add_argument("--model", type=str, default="little_net",
                   choices=("little_net", "two_layer_gru", "fullsubnet",
                            "dccrn", "att_ccrn"),
                   help="model family; little_net/two_layer_gru use the "
                        "reference-cadence Trainer, the rest the generic "
                        "stateful trainer")
    p.add_argument("--lr", type=float, default=TrainConfig.lr)
    p.add_argument("--batch_size", type=int, default=TrainConfig.batch_size)
    p.add_argument("--max_n_epochs", type=int, default=TrainConfig.max_n_epochs)
    p.add_argument("--validate_metrics", type=str, default="",
                   help="comma list of extra cv metrics (stoi,sisdr); each "
                        "gets a best_<metric>.npz slot — the working version "
                        "of the reference's dead validate_conf "
                        "(configs.py:49-57). Supported by every family.")
    p.add_argument("--device_cache", type=str, default="",
                   choices=("", "int16", "bfloat16", "float32"),
                   help="cache the WHOLE corpus in device memory and scan "
                        "each epoch in one dispatch (little_net/"
                        "two_layer_gru families; pipeline/device_cache.py). "
                        "int16 is the native precision of recorded corpora; "
                        "use when the host->device link, not the chip, "
                        "bounds the step (reference scale on this image: "
                        "~2 s/step host loader vs ~3 ms cached)")
    args = p.parse_args(argv)
    logger.info("Arguments:\n%s", pprint.pformat(vars(args)))

    if args.mesh:
        # multi-host bring-up when a coordinator is configured
        # (AEC_COORDINATOR / AEC_NUM_PROCESSES / AEC_PROCESS_ID); no-op
        # single-host. Must run before anything initializes the backend.
        from aec_tpu.parallel.mesh import distributed_init_if_needed

        if distributed_init_if_needed():
            import jax

            logger.info(
                "jax.distributed up: process %d/%d, %d global devices",
                jax.process_index(), jax.process_count(), jax.device_count(),
            )

    cfg = TrainConfig(
        lr=args.lr, batch_size=args.batch_size, max_n_epochs=args.max_n_epochs
    )
    if args.model not in ("little_net", "two_layer_gru"):
        if args.device_cache:
            p.error(
                "--device_cache supports the reference-cadence families "
                "(little_net, two_layer_gru); the stateful trainer keeps "
                "the host loader"
            )
        from aec_tpu.train.generic import GenericTrainer

        GenericTrainer(
            model=args.model,
            tr_list=read_filelist(args.tr_list),
            cv_file=args.cv_file,
            ckpt_dir=args.ckpt_dir,
            cfg=cfg,
            use_mesh=args.mesh,
            resume_model=args.resume_model,
            time_log=args.time_log,
            validate_metrics=tuple(
                m for m in args.validate_metrics.split(",") if m
            ),
        ).train()
        return

    from aec_tpu.models.registry import get_model

    spec = get_model(args.model)
    trainer = Trainer(
        tr_list=read_filelist(args.tr_list),
        cv_file=args.cv_file,
        ckpt_dir=args.ckpt_dir,
        cfg=cfg,
        resume_model=args.resume_model,
        time_log=args.time_log,
        loss_log_name=args.loss_log,
        use_mesh=args.mesh,
        loss_fn=spec.loss,
        init_fn=spec.init,
        validate_metrics=tuple(
            m for m in args.validate_metrics.split(",") if m
        ),
        device_cache=args.device_cache,
    )
    trainer.train()


if __name__ == "__main__":
    main()
