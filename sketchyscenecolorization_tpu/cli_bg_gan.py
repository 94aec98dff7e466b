"""BG colorization module CLI (reference
``Background_Colorization/bg_colorization_main.py:703-1032``): train on the
composited background dataset or dump test triplets.
"""
from __future__ import annotations

import argparse
import os

import jax

from .config import BGGanConfig


def make_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", type=str, default="train", choices=["train", "test"])
    p.add_argument("--data_base_dir", type=str, default="data")
    p.add_argument("--run_dir", type=str, default="outputs/bg_gan")
    p.add_argument("--vocab_path", type=str, default="data/bg_vocab.txt")
    p.add_argument("--image_size", type=int, default=768)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=100000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--vocab_size", type=int, default=18)
    p.add_argument("--max_len", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    from .utils.compile_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    cfg = BGGanConfig(batch_size=args.batch_size, image_size=args.image_size,
                      vocab_size=args.vocab_size, max_len=args.max_len,
                      lr=args.lr, max_steps=args.max_steps)

    from .data import BGDataset
    from .text import load_vocab
    vocab = load_vocab(args.vocab_path)

    split = "train" if args.mode == "train" else "test"
    dataset = BGDataset(
        os.path.join(args.data_base_dir, "captions", f"{split}.json"),
        os.path.join(args.data_base_dir, "foreground", split),
        os.path.join(args.data_base_dir, "background", split),
        os.path.join(args.data_base_dir, "segment", split),
        vocab, image_size=cfg.image_size, max_len=cfg.max_len,
        seed=args.seed)

    if args.mode == "train":
        from .train import train_bg_gan
        train_bg_gan(cfg, dataset, args.run_dir, seed=args.seed)
        return 0

    from .pipeline.engines import BGColorizeEngine
    from .train.bg_gan import create_bg_gan_state
    from .train.eval_procedures import bg_test
    from .utils.checkpoint import latest_checkpoint, restore_checkpoint
    state = create_bg_gan_state(jax.random.PRNGKey(0), cfg)
    found = latest_checkpoint(os.path.join(args.run_dir, "snapshot"))
    if found:
        state = restore_checkpoint(found[1], state)
        print(f"restored step {found[0]}")
    engine = BGColorizeEngine(cfg, state.g_params, vocab)
    n = bg_test(cfg, engine, dataset, os.path.join(args.run_dir, "test_results"))
    print(f"wrote {n} triplets")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
