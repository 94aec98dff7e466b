"""FG instance-colorization module CLI (reference
``Foreground_Instance_Colorization/obj_colorization_main.py``): timestamped
run dirs, per-run params JSON, NaN auto-restart training, plus val and
single-image inference modes.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax

from .config import FGGanConfig


def make_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "val", "test", "inference"])
    p.add_argument("--data_base_dir", type=str, default="data")
    p.add_argument("--output_base_dir", type=str, default="outputs")
    p.add_argument("--resume_from", type=str, default="",
                   help="existing run dir to resume")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--max_iter_step", type=int, default=100000)
    p.add_argument("--lr_G", type=float, default=2e-4)
    p.add_argument("--lr_D", type=float, default=1e-4)
    p.add_argument("--block_type", type=str, default="MRU",
                   choices=["MRU", "Pix2Pix", "Residual"])
    p.add_argument("--vocab_size", type=int, default=58)
    p.add_argument("--small_img", type=int, default=0)
    p.add_argument("--distance_map", type=int, default=0)
    p.add_argument("--ld", type=float, default=10.0)
    p.add_argument("--image_name", type=str, default="")
    p.add_argument("--instruction", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    return p


def build_config(args) -> FGGanConfig:
    return FGGanConfig(
        batch_size=args.batch_size, image_size=64 if args.small_img else 192,
        small=bool(args.small_img), vocab_size=args.vocab_size,
        block_type=args.block_type, lr_g=args.lr_G, lr_d=args.lr_D,
        max_iters=args.max_iter_step, ld=args.ld,
        distance_map=bool(args.distance_map))


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    from .utils.compile_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    cfg = build_config(args)

    if args.mode == "train":
        from .data import FGPairedDataset
        from .train import run_with_nan_restart, train_fg_gan

        run_dir = args.resume_from or os.path.join(
            args.output_base_dir, time.strftime("%Y-%m-%d-%H-%M-%S"))
        os.makedirs(run_dir, exist_ok=True)
        # per-run params JSON (reference obj_colorization_main.py:36-72)
        with open(os.path.join(run_dir, "params.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2)

        shard_dir = os.path.join(args.data_base_dir, "records", "train")
        shards = [os.path.join(shard_dir, n) for n in sorted(os.listdir(shard_dir))]
        dataset = FGPairedDataset(shards, cfg.batch_size, cfg.image_size,
                                  cfg.distance_map, seed=args.seed)

        status = run_with_nan_restart(
            lambda: train_fg_gan(cfg, dataset, run_dir, seed=args.seed))
        return status

    # val / inference need a restored generator
    from .train.fg_gan import create_fg_gan_state
    from .utils.checkpoint import latest_checkpoint, restore_checkpoint
    run_dir = args.resume_from
    assert run_dir, "--resume_from <run_dir> required for val/inference"
    state = create_fg_gan_state(jax.random.PRNGKey(0), cfg)
    found = latest_checkpoint(os.path.join(run_dir, "snapshot"))
    if found:
        state = restore_checkpoint(found[1], state)
        print(f"restored step {found[0]}")

    if args.mode == "val":
        from .train.eval_procedures import fg_validation
        shard_dir = os.path.join(args.data_base_dir, "records", "val")
        shards = [os.path.join(shard_dir, n) for n in sorted(os.listdir(shard_dir))]
        n = fg_validation(cfg, state.g_params, shards,
                          os.path.join(run_dir, "results"))
        print(f"wrote {n} triplets")
        return 0

    if args.mode == "test":
        from .text import load_vocab
        from .train.eval_procedures import fg_test
        vocab = load_vocab(os.path.join(args.data_base_dir, "vocab.txt"))
        n = fg_test(cfg, state.g_params, args.data_base_dir,
                    os.path.join(run_dir, "test_results"), vocab,
                    seed=args.seed)
        print(f"wrote {n} outputs")
        return 0

    assert args.image_name and args.instruction
    from .text import load_vocab
    from .train.eval_procedures import fg_inference
    cap_base = os.path.join(args.data_base_dir, "captions")
    categories = sorted(d for d in os.listdir(cap_base)
                        if os.path.isdir(os.path.join(cap_base, d)))
    vocab = load_vocab(os.path.join(args.data_base_dir, "vocab.txt"))
    out = fg_inference(cfg, state.g_params,
                       os.path.join("examples", args.image_name),
                       args.image_name[:args.image_name.find(".png")],
                       categories, args.instruction, vocab,
                       os.path.join(run_dir, "results"), seed=args.seed)
    print("saved:", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
