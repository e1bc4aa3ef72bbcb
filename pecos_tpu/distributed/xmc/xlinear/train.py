"""CLI: distributed XR-Linear training (reference: distributed/xmc/xlinear/train.py).

Single-host form (DummyComm):
    python -m pecos_tpu.distributed.xmc.xlinear.train -x X.npz -y Y.npz -m out_dir
Multi-host: launch one process per host with jax distributed initialized; the
comm layer rides jax multihost collectives instead of MPI.
"""

import argparse

from pecos_tpu.parallel.comm import DummyComm, MultihostComm
from pecos_tpu.utils import smat_util
from pecos_tpu.utils.logging_util import setup_logging_config
from .model import DistributedXLinearModel


def parse_arguments(args=None):
    p = argparse.ArgumentParser(description="pecos_tpu distributed XR-Linear training")
    p.add_argument("-x", "--inst-path", required=True)
    p.add_argument("-y", "--label-path", required=True)
    p.add_argument("-m", "--model-folder", required=True)
    p.add_argument("--nr-splits", type=int, default=16)
    p.add_argument("--max-leaf-size", type=int, default=100)
    p.add_argument("--min-n-sub-tree", type=int, default=None)
    p.add_argument("--main-workload-factor", type=float, default=0.3)
    p.add_argument("--multihost", action="store_true", help="use jax multihost comm")
    p.add_argument("--verbose-level", type=int, default=1)
    return p.parse_args(args)


def main(args=None):
    args = parse_arguments(args)
    setup_logging_config(args.verbose_level)
    comm = MultihostComm() if args.multihost else DummyComm()
    X = smat_util.load_feature_matrix(args.inst_path)
    Y = smat_util.load_label_matrix(args.label_path)
    model = DistributedXLinearModel.train(
        X,
        Y,
        comm,
        cluster_params={
            "indexer_params": {
                "nr_splits": args.nr_splits,
                "max_leaf_size": args.max_leaf_size,
            }
        },
        train_params={
            "main_workload_factor": args.main_workload_factor,
            "min_n_sub_tree": args.min_n_sub_tree,
        },
    )
    if model is not None:
        model.save(args.model_folder)


if __name__ == "__main__":
    main()
