"""Distributed XR-Transformer fine-tuning.

The reference launches DeepSpeed subprocesses over NCCL with a hostfile
(pecos/distributed/xmc/xtransformer/module.py:99-160, dist_trainer.py:163).
On TPU the same scale-out is sharding annotations: batches are placed across
the mesh's data-parallel axis (XLA emits the gradient all-reduces over
ICI/DCN) and the AdamW moments are sharded over the FULL mesh — the ZeRO
stage-1 analog of the reference's deepspeed_config (dist_trainer.py:163) —
via `pecos_tpu.parallel.mesh.shard_opt_state`, cutting per-device optimizer
memory ~n_devices x with float-identical updates
(tests/test_distributed.py::test_zero_analog_opt_state_sharding).
"""

from __future__ import annotations

from typing import Optional

from pecos_tpu.parallel.mesh import make_mesh
from pecos_tpu.xmc.xtransformer.matcher import TransformerMatcher
from pecos_tpu.xmc.xtransformer.module import MLProblemWithText


def dist_fine_tune(
    prob: MLProblemWithText,
    csr_codes=None,
    C=None,
    train_params=None,
    pred_params=None,
    parent_matcher: Optional[TransformerMatcher] = None,
    n_devices: Optional[int] = None,
):
    """Data-parallel TransformerMatcher.train over all local devices."""
    mesh = make_mesh(n_devices)
    return TransformerMatcher.train(
        prob,
        csr_codes=csr_codes,
        C=C,
        train_params=train_params,
        pred_params=pred_params,
        parent_matcher=parent_matcher,
        mesh=mesh,
    )
