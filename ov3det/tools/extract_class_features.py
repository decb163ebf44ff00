"""Extract prompt-ensembled CLIP text embeddings for a concept list.

Counterpart of reference 3DOVDet_tools/extract_class_features.py:14-36:
for each concept, encode all prompt templates with the CLIP text tower,
L2-normalize, average, re-normalize, and save the (num_concepts, 640)
matrix used as the detector's frozen classification head.

Usage:
  python -m ov3det.tools.extract_class_features \
      --concepts concepts_sunrgbd.txt \
      --clip_ckpt regionclip_pretrained-cc_rn50x4.pth \
      --bpe_vocab bpe_simple_vocab_16e6.txt.gz \
      --out concepts_sunrgbd.npy
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--concepts", required=True, help="one concept per line")
    p.add_argument("--clip_ckpt", required=True, help="CLIP/RegionCLIP torch ckpt")
    p.add_argument("--bpe_vocab", required=True, help="bpe_simple_vocab_16e6.txt.gz")
    p.add_argument("--out", required=True, help="output .npy path")
    p.add_argument("--width", type=int, default=640, help="text width (RN50x4: 640)")
    p.add_argument("--heads", type=int, default=10)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--embed_dim", type=int, default=640)
    args = p.parse_args(argv)

    from ov3det.models.clip_text import (
        CLIPTextEncoder,
        SimpleBPETokenizer,
        convert_text_checkpoint,
        extract_class_embeddings,
        tokenize_prompts,
    )

    concepts = [
        ln.strip() for ln in open(args.concepts).read().splitlines() if ln.strip()
    ]
    tokenizer = SimpleBPETokenizer(args.bpe_vocab)
    prompts = tokenize_prompts(concepts, tokenizer)

    encoder = CLIPTextEncoder(
        width=args.width, heads=args.heads, layers=args.layers,
        embed_dim=args.embed_dim,
    )
    variables = convert_text_checkpoint(args.clip_ckpt, layers=args.layers)
    emb = extract_class_embeddings(encoder, variables, prompts)
    np.save(args.out, emb)
    print(f"saved {emb.shape} class embeddings to {args.out}")


if __name__ == "__main__":
    main()
