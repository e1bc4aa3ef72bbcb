"""CLI: XR-Transformer prediction (reference: pecos/xmc/xtransformer/predict.py)."""

import argparse

from pecos_tpu.utils import smat_util
from .model import XTransformer


def parse_arguments(args=None):
    p = argparse.ArgumentParser(description="pecos_tpu XR-Transformer prediction")
    p.add_argument("-t", "--txt-path", required=True)
    p.add_argument("-x", "--feat-path", default=None)
    p.add_argument("-m", "--model-folder", required=True)
    p.add_argument("-o", "--save-pred-path", required=True)
    p.add_argument("-k", "--only-topk", type=int, default=None)
    p.add_argument("-b", "--beam-size", type=int, default=None)
    return p.parse_args(args)


def main(args=None):
    args = parse_arguments(args)
    with open(args.txt_path, encoding="utf-8") as f:
        corpus = [line.rstrip("\n") for line in f]
    X_feat = smat_util.load_feature_matrix(args.feat_path) if args.feat_path else None
    model = XTransformer.load(args.model_folder)
    kwargs = {}
    if args.only_topk:
        kwargs["only_topk"] = args.only_topk
    if args.beam_size:
        kwargs["beam_size"] = args.beam_size
    P = model.predict(corpus, X_feat=X_feat, **kwargs)
    smat_util.save_matrix(args.save_pred_path, P)


if __name__ == "__main__":
    main()
