"""Sharded (multi-chip) train/eval steps.

GSPMD-style data parallelism: params/optimizer state replicated, batch
sharded over the mesh 'data' axis, one jitted program — XLA partitions the
computation and inserts the gradient all-reduce over ICI itself.  This
replaces the reference's ``torch.nn.DataParallel`` scatter/gather
(/root/reference/utils/tools.py:129-148) with compiled collectives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from upflow_pytorch_tpu.models.upflow import UPFlowNet, forward
from upflow_pytorch_tpu.train.step import make_train_step


def make_sharded_train_step(model: UPFlowNet, tx, mesh: Mesh, **step_kwargs):
    """Jitted train step: state replicated, batch sharded over 'data'.

    Pallas fast paths are force-disabled at trace time whenever the mesh
    spans more than one device (mirroring the eval-side spatial gate
    below): a batch-sharded ``pallas_call`` under GSPMD is unproven on a
    real multi-chip mesh, and the XLA formulations partition exactly.
    Single-device meshes keep the fused kernels.
    """
    from upflow_pytorch_tpu.ops.pallas_gate import disable_pallas

    base_step = make_train_step(model, tx, **step_kwargs)
    if mesh.size > 1:
        def step(state, batch):
            with disable_pallas():
                return base_step(state, batch)
    else:
        step = base_step
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step,
                   in_shardings=(repl, data),
                   out_shardings=(repl, repl))


def make_sharded_eval_step(model: UPFlowNet, mesh: Mesh,
                           spatial: bool = False):
    """Jitted bidirectional inference with the batch sharded over 'data'.

    ``spatial=True`` additionally shards the image WIDTH over the mesh's
    'spatial' axis (SURVEY §5's large-frame plan): GSPMD inserts the halo
    exchanges for the convolutions and the collectives for the warp
    gathers automatically.  Intended for frames too large for one chip's
    HBM; for KITTI-scale frames plain data parallelism is faster.  Every
    Pallas fast path is force-disabled at trace time under spatial
    sharding (the kernels assume full-width arrays; the XLA formulations
    partition exactly) — no env knob needed.
    """
    from upflow_pytorch_tpu.ops.pallas_gate import disable_pallas

    repl = NamedSharding(mesh, P())
    img = NamedSharding(mesh, P("data", None, "spatial") if spatial
                        else P("data"))

    def eval_step(params, im1, im2):
        if spatial:
            with disable_pallas():
                out = forward(model, params, im1, im2)
        else:
            out = forward(model, params, im1, im2)
        return out["flow_f_out"], out["flow_b_out"], out["occ_fw"], out["occ_bw"]

    return jax.jit(eval_step,
                   in_shardings=(repl, img, img),
                   out_shardings=(img, img, img, img))
