#!/usr/bin/env python
"""Export a trained run as a serving artifact (StableHLO via jax.export).

Composes the run's config, rebuilds the model, restores its checkpoint,
and exports the eval forward — optionally fused with the device-side
preprocessing (raw uint8 frames in) — for the given batch geometry:

  python tools/export_model.py -c expts/01_ek100_avt.txt \
      --ckpt-dir OUTPUTS/01_ek100_avt/0 -o avt.stablehlo \
      -B 16 -T 10 --raw-hw 256 454

  python tools/export_model.py ... --no-preproc --feat-dim 1024  # feature path

The artifact loads anywhere with:
  from avt_tpu.serve import load_exported, batch_predict
  ex = load_exported('avt.stablehlo'); probs = batch_predict(ex, frames)
"""
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", default=None,
                    help="expts txt of overrides (as train_net takes)")
    ap.add_argument("overrides", nargs="*",
                    help="extra key=value overrides (train_net grammar)")
    ap.add_argument("--ckpt-dir", default=None,
                    help="run dir holding the orbax checkpoint (omit to "
                         "export with random init, e.g. for benchmarks)")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-B", type=int, default=16, help="serving batch size")
    ap.add_argument("-T", type=int, default=10, help="frames per clip")
    ap.add_argument("--raw-hw", type=int, nargs=2, default=(256, 454),
                    metavar=("H", "W"),
                    help="raw frame size fed to the fused preprocessing")
    ap.add_argument("--no-preproc", action="store_true",
                    help="export the model-only forward on preprocessed "
                         "(B,1,C,T,crop,crop) video instead of raw frames")
    ap.add_argument("--outputs", nargs="+", default=["logits/action"])
    ap.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    ap.add_argument("--separate-params", action="store_true",
                    help="keep params as a runtime argument instead of "
                         "baking them into the artifact")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from avt_tpu.config import Composer, parse_override
    from avt_tpu.config.overrides import parse_overrides_file
    from avt_tpu.config.build import build_all_datasets, build_model
    from avt_tpu.serve import export_eval_forward, save_exported
    from avt_tpu.train_net import CONF_DIR

    overrides = parse_overrides_file(args.config) if args.config else []
    overrides += [parse_override(o) for o in args.overrides]
    cfg = Composer(str(CONF_DIR)).compose("config", overrides)
    train_datasets, _ = build_all_datasets(cfg)
    if len(train_datasets) == 1:
        train_dataset = train_datasets[0]
    else:
        from avt_tpu.data.dataset import ConcatDataset

        train_dataset = ConcatDataset(train_datasets)
    num_classes = {k: len(v) for k, v in train_dataset.classes.items()}
    model = build_model(cfg, num_classes, train_dataset.class_mappings)

    from avt_tpu.config.build import build_preprocessor

    dcfg = cfg.get("data_eval") or cfg["data"]
    pp = None
    if args.no_preproc:
        crop = int(dcfg.get("crop_size") or 224)
        in_shape = (args.B, 1, 3, args.T, crop, crop)
    else:
        pp = build_preprocessor(dcfg)
        H, W = args.raw_hw
        in_shape = (args.B, args.T, H, W, 3)

    init_in = (
        np.zeros(in_shape, np.uint8) if pp is not None
        else np.zeros(in_shape, np.float32)
    )
    video0 = pp.eval_fn(init_in)[:, None] if pp is not None else init_in
    params = model.init(jax.random.PRNGKey(0), video0, (args.B,))
    if args.ckpt_dir:
        from avt_tpu.train import TrainState, build_optimizer
        from avt_tpu.train.checkpoint import restore_checkpoint

        tx, _ = build_optimizer(
            params, lr_wd=[["__all__", 0.0, 0.0]],
            iters_per_epoch=1, num_epochs=1,
        )
        template = TrainState.create(params, tx)
        restored = restore_checkpoint(args.ckpt_dir, template)
        if restored is None:
            raise FileNotFoundError(
                f"no checkpoint under {args.ckpt_dir}"
            )
        params = restored[0].params
        print(f"# restored epoch {restored[1]:.2f} checkpoint",
              file=sys.stderr)

    exported = export_eval_forward(
        model, params, in_shape,
        preprocessor=pp,
        outputs=tuple(args.outputs),
        platforms=tuple(args.platforms),
        bake_params=not args.separate_params,
    )
    save_exported(exported, args.output)
    print(
        f"# wrote {args.output}: platforms={exported.platforms} "
        f"in={in_shape} outputs={args.outputs}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
