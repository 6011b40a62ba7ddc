"""Device mesh construction and sharding rules.

The TPU-native replacement for the reference's torch.distributed stack
(reference: NCCL DDP at wespeaker/bin/train.py:54,170-171, torchrun
rendezvous at examples/voxceleb/v2/run.sh:66-68): a single SPMD program
over a 2-D ('data', 'model') mesh.

  * 'data'  — batch axis: utterances are sharded across it; gradient
    averaging happens automatically through pjit's partitioning of the
    loss reduction (the GSPMD analogue of DDP allreduce).
  * 'model' — tensor-parallel axis for the margin-softmax classifier
    head: its (emb_dim, num_class*K) weight is column-sharded so each
    chip scores a class shard; softmax normalizers reduce over 'model'
    (the reference has no TP at all — SURVEY §2.10).

Multi-host: `jax.distributed.initialize()` + the same code; the mesh is
built from the global device list so DP spans hosts over DCN while the
head shard stays intra-host on ICI by making 'model' the minor axis.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "head_weight_spec",
    "param_shardings",
    "sequence_parallel_constraint",
    "shard_batch",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"  # pipeline-stage axis (parallel.pipeline)


def make_mesh(
    model_parallel: int = 1,
    devices: Optional[list] = None,
    pipeline_parallel: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh — or ('data', 'pipe', 'model')
    when `pipeline_parallel` > 1.  'model' is the MINOR (fastest-
    varying) axis so head-shard/TP collectives ride the tightest
    interconnect ring; 'pipe' sits next (stage ppermutes fire once per
    microbatch tick, far rarer than the per-layer TP psums); 'data'
    spans the rest."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % (model_parallel * pipeline_parallel) == 0, (
        n, model_parallel, pipeline_parallel,
    )
    if pipeline_parallel > 1:
        dev_array = np.asarray(devices).reshape(
            n // (model_parallel * pipeline_parallel),
            pipeline_parallel,
            model_parallel,
        )
        return Mesh(dev_array, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))
    dev_array = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def head_weight_spec() -> P:
    """Classifier weight (emb_dim, num_class*K): classes column-sharded."""
    return P(None, MODEL_AXIS)


# Transformer-frontend tensor parallelism (Megatron-style, via GSPMD
# annotations — XLA inserts the all-reduces): attention QKV and the FFN
# input projection are COLUMN-sharded over 'model' (heads / hidden units
# split across chips), their successors (attention out-proj, FFN output
# projection) are ROW-sharded, so each layer needs exactly two psums.
_TP_COL = frozenset({"q_proj", "k_proj", "v_proj", "intermediate_dense",
                     "query", "key", "value", "mlp_0"})
_TP_ROW = frozenset({"out_proj", "output_dense", "out", "mlp_2"})


def param_shardings(
    tree, mesh: Mesh, head_path: str = "projection", fsdp: bool = False
):
    """NamedSharding tree for ANY state pytree (params, optimizer moments,
    batch stats): replicated except

      * 2-D 'weight' leaves under `head_path` — the margin-softmax head
        and its optimizer moments — class-sharded over 'model',
      * SSL/whisper frontend transformer kernels (under a 'frontend'
        node): QKV + FFN-in column-sharded, out-proj + FFN-out
        row-sharded over 'model' (kernel only; the column-sharded
        Dense's bias is sharded with its output features), and
      * with `fsdp=True`, frontend kernels ADDITIONALLY shard a
        remaining dimension over 'data' (ZeRO-3 role: params + their
        optimizer moments live in 1/N-th of HBM per chip; XLA inserts
        the per-layer all-gathers).  Composed with TP this is the full
        fsdp x tp 2-D layout — 2-D Dense kernels become
        P('data','model') / P('model','data'), other 2-D frontend
        kernels P('data', None), conv kernels shard their output
        channels.  A dim is only sharded when divisible by the axis.
      * STACKED pipeline layouts ('layer_stack' / 'block_stack' nodes,
        parallel.pipeline.stack_frontend_tree): the leading (L,) layer
        axis is sharded over 'pipe' (each stage owns its contiguous
        L/S layers — 1/S-th of the frontend in HBM), with the TP/fsdp
        rules applied to the per-layer dims behind it; composed, a
        stacked qkv kernel is P('pipe', 'data', 'model').

    Optimizer states (optax namedtuples) embed params-structured
    subtrees, so the same path predicates cover them."""
    data_n = mesh.shape[DATA_AXIS]
    pipe_n = mesh.shape.get(PIPE_AXIS, 1)

    def fdim(leaf, dim):
        """DATA_AXIS if leaf's dim is FSDP-shardable, else None."""
        if not fsdp or data_n <= 1:
            return None
        shape = getattr(leaf, "shape", ())
        if len(shape) > dim and shape[dim] % data_n == 0 and shape[dim] > 1:
            return DATA_AXIS
        return None

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        ndim = getattr(leaf, "ndim", 0)
        if (
            head_path in keys
            and keys
            and keys[-1] == "weight"
            and ndim == 2
        ):
            return NamedSharding(mesh, head_weight_spec())
        if "frontend" in keys and (
            "layer_stack" in keys or "block_stack" in keys
        ):
            # pipeline-stacked layer params: dim 0 is the (L,) layer
            # axis -> 'pipe'; TP column/row + fsdp rules shift one dim
            shape = getattr(leaf, "shape", ())
            pipe = (
                PIPE_AXIS
                if pipe_n > 1 and shape and shape[0] % pipe_n == 0
                else None
            )
            owner, name = keys[-2], keys[-1]
            if owner in _TP_COL:
                if name == "kernel" and ndim == 3:
                    return NamedSharding(
                        mesh, P(pipe, fdim(leaf, 1), MODEL_AXIS)
                    )
                if name == "bias" and ndim == 2:
                    return NamedSharding(mesh, P(pipe, MODEL_AXIS))
            if owner in _TP_ROW and name == "kernel" and ndim == 3:
                return NamedSharding(mesh, P(pipe, MODEL_AXIS, fdim(leaf, 2)))
            if fsdp and name == "kernel" and ndim == 3:
                return NamedSharding(mesh, P(pipe, fdim(leaf, 1), None))
            return NamedSharding(mesh, P(*([pipe] + [None] * (ndim - 1))))
        if "frontend" in keys and len(keys) >= 2:
            owner, name = keys[-2], keys[-1]
            if owner in _TP_COL:
                if name == "kernel" and ndim == 2:
                    return NamedSharding(mesh, P(fdim(leaf, 0), MODEL_AXIS))
                if name == "bias" and ndim == 1:
                    return NamedSharding(mesh, P(MODEL_AXIS))
            if owner in _TP_ROW and name == "kernel" and ndim == 2:
                return NamedSharding(mesh, P(MODEL_AXIS, fdim(leaf, 1)))
            if fsdp and name == "kernel":
                if ndim == 2:  # feat projection / gate etc.
                    return NamedSharding(mesh, P(fdim(leaf, 0), None))
                if ndim == 3:  # conv extractor / pos-conv (k, in, out)
                    return NamedSharding(
                        mesh, P(None, None, fdim(leaf, 2))
                    )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def sequence_parallel_constraint(mesh: Mesh, bare: bool = False):
    """Megatron-style sequence parallelism as a GSPMD annotation.

    Returns a callable for SSLEncoderConfig.act_constraint: it pins the
    (B, T, H) residual stream at the transformer layer boundaries to
    P('data', 'model', None) — tokens sharded over the tensor-parallel
    axis.  Between the row-sharded matmul that ends a TP region and the
    column-sharded one that starts the next, XLA then lowers the TP
    all-reduce into reduce-scatter + all-gather (same bytes on the wire)
    while every LayerNorm / GELU / residual / dropout in between runs on
    1/TP-th of the tokens per chip — the reference stack has no
    equivalent (its parallelism is DDP only, wespeaker/bin/train.py:54).
    Identity when the mesh has no tensor-parallel degree.

    `bare=True` emits the constraint as a mesh-free PartitionSpec so it
    canonicalizes against the CONTEXT mesh — required inside the
    partial-manual pipeline body (parallel.pipeline), where the concrete
    mesh's all-Auto axis types no longer match the trace context."""
    tp = mesh.shape[MODEL_AXIS] if MODEL_AXIS in mesh.shape else 1
    if tp <= 1:
        return lambda x: x
    spec = P(DATA_AXIS, MODEL_AXIS, None)
    sh = spec if bare else NamedSharding(mesh, spec)
    warned = []

    def constrain(x):
        # static trace-time guard: a token count not divisible by the
        # TP degree cannot be evenly sharded (pjit rejects it) — leave
        # those shapes replicated rather than fail the whole step, but
        # say so ONCE (a silently-skipped constraint would otherwise
        # look like working SP while running fully replicated)
        if x.ndim != 3 or x.shape[1] % tp:
            if not warned:
                warned.append(True)
                logging.getLogger("parallel.mesh").warning(
                    "sequence-parallel constraint SKIPPED for shape %s "
                    "(needs ndim==3 and T %% tp_degree(%d) == 0); these "
                    "activations stay replicated over the TP axis",
                    tuple(getattr(x, "shape", ())), tp,
                )
            return x
        if bare:
            # bare specs canonicalize against the trace-context mesh
            # (set by the pipeline body); outside one — e.g. module
            # init / the sequential forward / eager — fall back to the
            # concrete NamedSharding so the same callable works anywhere
            ctx = jax.sharding.get_abstract_mesh()
            if not ctx.axis_names:
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec)
                )
        return jax.lax.with_sharding_constraint(x, sh)

    return constrain


def shard_tree(
    tree, mesh: Mesh, head_path: str = "projection", fsdp: bool = False
):
    """device_put a state pytree onto the mesh per `param_shardings`."""
    sh = param_shardings(tree, mesh, head_path, fsdp=fsdp)
    return jax.tree.map(jax.device_put, tree, sh)


def shard_batch(batch, mesh: Mesh, stacked: bool = False):
    """Place a host-resident batch pytree onto the mesh, sharded on the
    batch axis over 'data'.  stacked=True marks multi-step batches with
    a leading (num_steps,) scan axis — the batch axis is then dim 1.

    Multi-controller (jax.process_count() > 1): every host holds only
    ITS rows of the global batch (the rank-striped pipeline), so the
    global array is assembled from process-local data — the global
    batch is process_count x local rows.  A plain device_put would
    wrongly treat each host's local batch as the whole global value."""
    bdim = 1 if stacked else 0
    if stacked:
        sh = NamedSharding(mesh, P(None, DATA_AXIS))
    else:
        sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        w = jax.process_count()

        def put(x):
            x = np.asarray(x)
            gshape = list(x.shape)
            gshape[bdim] *= w
            return jax.make_array_from_process_local_data(
                sh, x, tuple(gshape)
            )

        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
