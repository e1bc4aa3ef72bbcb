"""HNSW train CLI: python -m pecos_tpu.ann.hnsw.train -x X.npz -m model_dir

Flag surface mirrors the reference (pecos/ann/hnsw/train.py:20-147).
"""

import argparse
import logging
import os

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
        help="path to the CSR npz or row-major npy item matrix (nr_items x nr_feats) to index",
    )
    parser.add_argument(
        "-m",
        "--model-folder",
        type=str,
        required=True,
        metavar="DIR",
        help="model folder to save the HNSW index into",
    )
    parser.add_argument(
        "--metric-type",
        type=str,
        default="ip",
        metavar="STR",
        help="distance metric: ip (inner product) or l2 (default ip)",
    )
    parser.add_argument(
        "-M",
        "--max-edge-per-node",
        type=int,
        default=32,
        metavar="INT",
        help="max edges per node for layers l>=1; level 0 gets 2*M (default 32)",
    )
    parser.add_argument(
        "-efC",
        "--efConstruction",
        type=int,
        default=100,
        metavar="INT",
        help="beam width during construction (default 100)",
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
        "-L",
        "--max-level-upper-bound",
        type=int,
        default=-1,
        metavar="INT",
        help="max number of graph levels (-1: default bound)",
    )
    parser.add_argument(
        "--refine-iters",
        type=int,
        default=1,
        metavar="INT",
        help="graph-repair passes after batched insertion (default 1)",
    )
    parser.add_argument(
        "-efS",
        "--efSearch",
        type=int,
        default=100,
        metavar="INT",
        help="default search beam width stored in the model (default 100)",
    )
    parser.add_argument(
        "-k",
        "--only-topk",
        type=int,
        default=10,
        metavar="INT",
        help="default top-k stored in the model (default 10)",
    )
    parser.add_argument(
        "--verbose-level",
        type=int,
        default=1,
        metavar="INT",
        help="logging verbosity 0-3",
    )
    return parser


def do_train(args):
    setup_logging_config(level=args.verbose_level)
    os.makedirs(args.model_folder, exist_ok=True)
    X = smat_util.load_matrix(args.inst_path).astype(np.float32)

    train_params = HNSW.TrainParams(
        M=args.max_edge_per_node,
        efC=args.efConstruction,
        metric_type=args.metric_type,
        threads=args.threads,
        refine_iters=args.refine_iters,
    )
    if args.max_level_upper_bound >= 0:
        train_params.max_level_upper_bound = args.max_level_upper_bound
    pred_params = HNSW.PredParams(
        efS=args.efSearch,
        topk=args.only_topk,
        threads=args.threads,
    )
    model = HNSW.train(X, train_params=train_params, pred_params=pred_params)
    model.save(args.model_folder)
    logging.getLogger(__name__).info("saved HNSW model to %s", args.model_folder)


if __name__ == "__main__":
    do_train(parse_arguments().parse_args())
