"""Profile warm XLinearModel.train at the 20K matched-recall geometry.

Runs train twice (cold compile + warm) and cProfiles the warm run to show
where the ~40 s warm wall-clock goes (host assembly vs device solve vs
transfers).  VERDICT r4 item 3; reference 1-core trains this in 13.2 s.
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from xmc_bench import ensure_data  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/xmcbench")
    ap.add_argument("--n-trn", type=int, default=20000)
    ap.add_argument("--n-tst", type=int, default=4000)
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--L", type=int, default=8192)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    X, Y, Xt, Yt, chain_dir = ensure_data(args.out, args)
    from pecos_tpu.utils.cluster_util import ClusterChain
    from pecos_tpu.xmc.xlinear import XLinearModel

    chain = ClusterChain.load(chain_dir)

    t0 = time.time()
    XLinearModel.train(X, Y, C=chain, shallow=True)
    print(f"cold train: {time.time()-t0:.1f}s")

    t0 = time.time()
    XLinearModel.train(X, Y, C=chain, shallow=True)
    print(f"warm train: {time.time()-t0:.1f}s")

    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    XLinearModel.train(X, Y, C=chain, shallow=True)
    pr.disable()
    print(f"profiled warm train: {time.time()-t0:.1f}s")
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(40)
    print(s.getvalue())


if __name__ == "__main__":
    main()
