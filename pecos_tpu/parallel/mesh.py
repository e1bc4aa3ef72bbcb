"""Mesh construction and sharded training/inference steps.

XR-Linear's scale axes (SURVEY.md §2.3):
- ``dp``: instances (rows of X) — data parallel; gradient contractions
  (X^T g) psum over this axis, inserted automatically by XLA from shardings.
- ``lp``: labels (columns of Y/W) — the label-model-parallel axis, the analog
  of the reference's sub-tree model parallelism
  (pecos/distributed/xmc/xlinear/model.py:259-617). Label blocks are
  embarrassingly parallel in training; beams all-gather over it at predict.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pecos_tpu.xmc import solvers


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None) -> Mesh:
    """Build a (dp, lp) mesh over the first n_devices.

    dp defaults to the largest power-of-two <= sqrt(n) so both axes scale.
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if dp is None:
        dp = 1
        while dp * dp * 2 <= n:
            dp *= 2
    lp = n // dp
    mesh_devices = np.asarray(devices[: dp * lp]).reshape(dp, lp)
    return Mesh(mesh_devices, axis_names=("dp", "lp"))


def shard_solve_block(
    mesh: Mesh,
    X: np.ndarray,  # (N, D) — N divisible by dp
    y: np.ndarray,  # (N, Lb) — Lb divisible by lp
    c: np.ndarray,  # (N, Lb)
    *,
    loss: str = "sqhinge",
    eps: float = 0.01,
    max_newton: int = 20,
    cg_max: int = 10,
) -> jax.Array:
    """One full sharded training step: the batched Newton-CG solve with X
    sharded over dp, labels sharded over lp, W replicated over dp and sharded
    over lp.  XLA inserts the psum for the X^T contractions across dp."""
    x_sh = NamedSharding(mesh, P("dp", None))
    yl_sh = NamedSharding(mesh, P("dp", "lp"))
    w_sh = NamedSharding(mesh, P(None, "lp"))

    Xd = jax.device_put(jnp.asarray(X, jnp.float32), x_sh)
    yd = jax.device_put(jnp.asarray(y, jnp.float32), yl_sh)
    cd = jax.device_put(jnp.asarray(c, jnp.float32), yl_sh)

    fn = jax.jit(
        lambda X_, y_, c_: solvers.solve_block(
            X_, y_, c_, loss=loss, eps=eps, max_newton=max_newton, cg_max=cg_max
        ),
        out_shardings=w_sh,
    )
    return fn(Xd, yd, cd)


def shard_chain_predict(mesh: Mesh, compiled, X: np.ndarray, **kwargs):
    """Data-parallel beam-search predict: queries sharded over every mesh axis.

    The model (weights + children tables) is replicated; each device walks the
    tree for its query shard — the TPU analog of the reference's
    thread-per-query OMP fan-out (libpecos.cpp:526-553).
    """
    from pecos_tpu.xmc.inference import chain_predict, prepare_queries

    q_sh = NamedSharding(mesh, P(("dp", "lp"), None))
    Xd = jax.device_put(jnp.asarray(prepare_queries(X, compiled.bias)), q_sh)
    beam = kwargs.get("beam_size", 10)
    topk = kwargs.get("only_topk", 20)
    pps = tuple([kwargs.get("post_processor", "l3-hinge")] * compiled.depth)
    fn = jax.jit(lambda X_, layers: chain_predict(X_, layers, beam, topk, pps))
    return fn(Xd, compiled.layers)
