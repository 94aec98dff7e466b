"""Top-level interactive CLI (reference ``sketchyscene_colorization_main.py``).

Usage:
    python -m sketchyscenecolorization_tpu.cli \
        --command color --image_id 9996 --instruction "the bus is yellow"
    python -m sketchyscenecolorization_tpu.cli --command withdraw --image_id 9996
"""
from __future__ import annotations

import argparse
import dataclasses

from .config import FrameworkConfig, PipelineConfig
from .pipeline.factory import build_session


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Language-based scene-sketch colorization (TPU)")
    p.add_argument("--command", "-c", type=str, choices=["color", "withdraw"],
                   default="color")
    p.add_argument("--image_id", "-id", type=int, default=-1)
    p.add_argument("--instruction", "-it", type=str, default="")
    p.add_argument("--instructions", type=str, default="",
                   help="';'-separated queue served via colorize_stream: "
                        "consecutive FG instructions share one matching and "
                        "one GAN dispatch (same outputs/records as issuing "
                        "them one by one)")
    p.add_argument("--data_base_dir", "-dbd", type=str, default="examples")
    p.add_argument("--results_base_dir", "-rbd", type=str, default="outputs")
    p.add_argument("--match_ckpt_dir", type=str, default="checkpoints/matching")
    p.add_argument("--match_vocab_path", type=str, default="data/match_vocab.txt")
    p.add_argument("--fg_ckpt_dir", type=str, default="checkpoints/fg_gan")
    p.add_argument("--fg_vocab_path", type=str, default="data/fg_vocab.txt")
    p.add_argument("--bg_ckpt_dir", type=str, default="checkpoints/bg_gan")
    p.add_argument("--bg_vocab_path", type=str, default="data/bg_vocab.txt")
    p.add_argument("--no_color_gradient", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_compile_cache", action="store_true",
                   help="skip the persistent XLA compilation cache (by "
                        "default repeat invocations reuse compiled "
                        "executables from ~/.cache/sketchyscene_tpu_jax)")
    return p


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    if args.image_id == -1:
        raise SystemExit("--image_id is required")
    if not args.no_compile_cache:
        from .utils.compile_cache import enable_persistent_compilation_cache
        enable_persistent_compilation_cache()

    cfg = FrameworkConfig()
    cfg = dataclasses.replace(cfg, pipeline=PipelineConfig(
        data_base_dir=args.data_base_dir,
        results_base_dir=args.results_base_dir,
        match_vocab_path=args.match_vocab_path,
        fg_vocab_path=args.fg_vocab_path,
        bg_vocab_path=args.bg_vocab_path,
        match_ckpt_dir=args.match_ckpt_dir,
        fg_ckpt_dir=args.fg_ckpt_dir,
        bg_ckpt_dir=args.bg_ckpt_dir,
        color_gradient=not args.no_color_gradient,
    ))

    if args.command == "withdraw":
        from .data.records import withdraw_records
        withdraw_records(args.image_id, args.results_base_dir)
        print("withdrew last record for image", args.image_id)
        return 0

    if not args.instruction and not args.instructions:
        raise SystemExit(
            "--instruction (or --instructions) is required for the color command")
    session = build_session(cfg, seed=args.seed)
    if args.instructions:
        texts = [t.strip() for t in args.instructions.split(";") if t.strip()]
        for out_path in session.colorize_stream(args.image_id, texts):
            print("saved:", out_path)
        session.flush()
        return 0
    out_path = session.colorize(args.image_id, args.instruction)
    session.flush()     # the record already points at this PNG; make it durable
    print("saved:", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
