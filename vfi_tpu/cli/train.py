"""`python train.py` — train EMAVFI (reference: train.py CLI, upgraded with
--config + arbitrary `--key value` overrides; see vfi_tpu.utils.config)."""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Train EMAVFI (TPU-native). Unlisted --key value pairs "
                    "override any TrainConfig field.")
    parser.add_argument("--config", default=None,
                        help="YAML config (reference train_config.yaml compatible)")
    parser.add_argument("--num-epochs", type=int, default=None, dest="num_epochs_cli")
    args, overrides = parser.parse_known_args(argv)

    from vfi_tpu.cli.common import setup
    setup()

    from vfi_tpu.utils.config import load_train_config
    cfg = load_train_config(args.config, overrides)
    if args.num_epochs_cli is not None:
        import dataclasses
        cfg = dataclasses.replace(cfg, num_epochs=args.num_epochs_cli)

    from vfi_tpu.train.loop import Trainer
    trainer = Trainer(cfg)
    history = trainer.run()
    if history["val_loss"]:
        print(f"done: best val loss {min(history['val_loss']):.4f}, "
              f"best PSNR {max(history['psnr']):.2f} dB, "
              f"final PSNR {history['psnr'][-1]:.2f} dB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
