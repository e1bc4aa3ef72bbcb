"""CLI: text embedding extraction (reference: pecos/xmc/xtransformer/encode.py)."""

import argparse

import numpy as np

from .model import XTransformer


def parse_arguments(args=None):
    p = argparse.ArgumentParser(description="pecos_tpu XR-Transformer encoding")
    p.add_argument("-t", "--txt-path", required=True)
    p.add_argument("-m", "--model-folder", required=True)
    p.add_argument("-o", "--save-emb-path", required=True)
    return p.parse_args(args)


def main(args=None):
    args = parse_arguments(args)
    with open(args.txt_path, encoding="utf-8") as f:
        corpus = [line.rstrip("\n") for line in f]
    model = XTransformer.load(args.model_folder)
    emb = model.encode(corpus)
    np.save(args.save_emb_path if args.save_emb_path.endswith(".npy") else args.save_emb_path + ".npy", emb)


if __name__ == "__main__":
    main()
