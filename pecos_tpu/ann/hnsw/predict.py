"""HNSW predict CLI: python -m pecos_tpu.ann.hnsw.predict -x Xt.npz -m model_dir

Flag surface mirrors the reference (pecos/ann/hnsw/predict.py:20-139):
optionally saves the prediction CSR and prints Recall@k against a ground-truth
label matrix.
"""

import argparse

import numpy as np

from pecos_tpu.utils import smat_util
from pecos_tpu.utils.logging_util import setup_logging_config

from .model import HNSW


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-x",
        "--inst-path",
        type=str,
        required=True,
        metavar="PATH",
        help="path to the CSR npz or row-major npy query matrix (nr_queries x nr_feats)",
    )
    parser.add_argument(
        "-m",
        "--model-folder",
        type=str,
        required=True,
        metavar="DIR",
        help="model folder holding the HNSW index",
    )
    parser.add_argument(
        "-efS",
        "--efSearch",
        type=int,
        default=100,
        metavar="INT",
        help="search beam width (default 100)",
    )
    parser.add_argument(
        "-k",
        "--only-topk",
        type=int,
        default=10,
        metavar="INT",
        help="number of nearest items to return (default 10)",
    )
    parser.add_argument(
        "-n",
        "--threads",
        type=int,
        default=-1,
        metavar="INT",
        help="CPU threads (accepted for reference-CLI parity; compute runs on device)",
    )
    parser.add_argument(
        "-y",
        "--label-path",
        type=str,
        default=None,
        metavar="PATH",
        help="ground-truth label matrix (CSR npz, nr_queries x nr_items) for Recall@k",
    )
    parser.add_argument(
        "-o",
        "--save-pred-path",
        type=str,
        default=None,
        metavar="PATH",
        help="where to save the prediction CSR (sorted by distance)",
    )
    parser.add_argument(
        "--verbose-level",
        type=int,
        default=1,
        metavar="INT",
        help="logging verbosity 0-3",
    )
    return parser


def do_predict(args):
    setup_logging_config(level=args.verbose_level)
    Xt = smat_util.load_matrix(args.inst_path).astype(np.float32)
    model = HNSW.load(args.model_folder)
    pred_params = HNSW.PredParams(
        efS=args.efSearch, topk=args.only_topk, threads=args.threads
    )
    Yt_pred = model.predict(Xt, pred_params=pred_params, ret_csr=True)

    if args.save_pred_path:
        smat_util.save_matrix(args.save_pred_path, Yt_pred)

    if args.label_path:
        Yt = smat_util.load_matrix(args.label_path)
        Yt_topk = smat_util.sorted_csr(Yt.tocsr(), only_topk=args.only_topk)
        metric = smat_util.Metrics.generate(Yt_topk, Yt_pred, topk=args.only_topk)
        print(
            "Recall{}@{} {:.6f}%".format(
                args.only_topk, args.only_topk, 100.0 * metric.recall[-1]
            )
        )


if __name__ == "__main__":
    do_predict(parse_arguments().parse_args())
