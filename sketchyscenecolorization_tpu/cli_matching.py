"""Instance-matching module CLI (reference ``Instance_Matching/matching_main.py``):

    python -m sketchyscenecolorization_tpu.cli_matching --mode train \
        --data_base_dir data --captions_base_dir data --vocab_path data/vocab.txt
    python -m sketchyscenecolorization_tpu.cli_matching --mode eval --dataset val
    python -m sketchyscenecolorization_tpu.cli_matching --mode inference \
        --image_id 9996 --instruction "the bus"
"""
from __future__ import annotations

import argparse
import os

import jax

from .config import MatchingConfig


def make_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "eval", "inference"])
    p.add_argument("--backbone", type=str, default="deeplab",
                   choices=["deeplab", "fcn_8s", "segnet", "deeplab_v3plus"])
    p.add_argument("--dataset", type=str, default="val", choices=["val", "test"])
    p.add_argument("--data_base_dir", type=str, default="data")
    p.add_argument("--captions_base_dir", type=str, default="data")
    p.add_argument("--seg_data_base_dir", type=str, default="data")
    p.add_argument("--vocab_path", type=str, default="data/match_vocab.txt")
    p.add_argument("--vocab_size", type=int, default=76)
    p.add_argument("--max_len", type=int, default=15)
    p.add_argument("--run_dir", type=str, default="outputs/matching")
    p.add_argument("--pretrained_npz", type=str, default="",
                   help="TF-var npz for the pretrained backbone restore")
    p.add_argument("--max_iteration", type=int, default=100000)
    p.add_argument("--no_mask_ap", action="store_true")
    p.add_argument("--image_id", type=int, default=-1)
    p.add_argument("--instruction", type=str, default="")
    p.add_argument("--image_size", type=int, default=768)
    p.add_argument("--model_scale", type=float, default=1.0,
                   help="shrink factor for the text-head dims (debug runs)")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    from .utils.compile_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    s = args.model_scale
    cfg = MatchingConfig(backbone=args.backbone, vocab_size=args.vocab_size,
                         max_len=args.max_len, max_iters=args.max_iteration,
                         H=args.image_size, W=args.image_size,
                         vf_h=args.image_size // 8, vf_w=args.image_size // 8,
                         w_emb_dim=int(1000 * s), v_emb_dim=int(1000 * s),
                         m_rnn_size=int(500 * s), w_rnn_size=int(1000 * s))
    if args.image_size != 768:
        import sketchyscenecolorization_tpu.data.matching_dataset as md
        md.IMAGE_SIZE = args.image_size

    from .text import load_vocab
    from .models import rmi
    vocab = load_vocab(args.vocab_path)

    if args.mode == "train":
        from .data import MatchingTrainDataset
        from .train import train_matching
        params = jax.jit(lambda k: rmi.init_params(k, cfg))(
            jax.random.PRNGKey(args.seed))
        if args.pretrained_npz:
            from .utils.tf1_converter import (
                convert_matching, load_tf_vars_npz, merge_converted)
            params = merge_converted(params, convert_matching(
                load_tf_vars_npz(args.pretrained_npz), cfg))
            print("restored pretrained backbone from", args.pretrained_npz)
        ds = MatchingTrainDataset(
            os.path.join(args.data_base_dir, "train"),
            os.path.join(args.captions_base_dir, "sentence_instance_train.json"),
            vocab, max_len=cfg.max_len, seed=args.seed)
        train_matching(cfg, ds, params, args.run_dir)
        return 0

    # eval / inference share a restored engine
    from .pipeline.engines import MatchingEngine
    from .utils.checkpoint import latest_checkpoint, restore_checkpoint
    params = jax.jit(lambda k: rmi.init_params(k, cfg))(jax.random.PRNGKey(0))
    found = latest_checkpoint(os.path.join(args.run_dir, "snapshots"))
    if found:
        state = restore_checkpoint(found[1])
        params = state["params"] if "params" in state else state
        print(f"restored step {found[0]}")
    engine = MatchingEngine(cfg, params, vocab)

    if args.mode == "eval":
        from .train import eval_matching
        result = eval_matching(
            engine.predict_mask,
            predict_batch_fn=engine.predict_masks,
            dataset_base_dir=os.path.join(args.data_base_dir, args.dataset),
            caption_json_path=os.path.join(
                args.captions_base_dir,
                f"sentence_instance_{args.dataset}.json"),
            seg_data_base_dir=os.path.join(args.seg_data_base_dir, args.dataset)
            if not args.no_mask_ap else None,
            compute_mask_ap=not args.no_mask_ap,
            result_path=os.path.join(args.run_dir, "eval_results",
                                     f"{args.backbone}_{args.dataset}_result.txt"))
        return 0

    assert args.image_id != -1 and args.instruction
    from .train.eval_procedures import matching_inference
    sketch_path = os.path.join(args.data_base_dir, args.dataset, "DRAWING_GT",
                               f"L0_sample{args.image_id}.png")
    out = matching_inference(engine, sketch_path, args.instruction,
                             os.path.join(args.run_dir, "visualize"))
    print("saved:", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
