"""DINO self-supervised training (student/teacher self-distillation).

Rebuild of the reference DINO stack (reference:
wespeaker/ssl/models/dino_wrapper.py — DINOHead:78 (MLP + weight-normed
last layer), DINOLoss:132 (teacher centering + temperature sharpening,
crop-pair CE, distributed center EMA via all_reduce :211-216), EMA teacher
update :270; schedules/utilities in ssl/utils/dino_utils.py —
cosine_scheduler:105, clip_gradients:26, cancel_gradients_last_layer:38;
executor in ssl/utils/dino_executor.py) as ONE jitted SPMD step:

  * student/teacher are the same flax module with two param trees inside
    DINOState; the teacher EMA and the center EMA are in-graph;
  * the center's cross-replica reduction is just jnp.mean under pjit's
    data sharding (GSPMD inserts the psum the reference does by hand);
  * per-parameter gradient norm clipping and last-layer freeze are pure
    gradient transforms of (grads, step);
  * lr / weight-decay / teacher-momentum cosine schedules are functions of
    step evaluated in-graph.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.registry import embedding_from_outputs

__all__ = [
    "DINOHead",
    "DINONet",
    "DINOState",
    "cosine_schedule",
    "make_dino_train_step",
    "create_dino_state",
]


def cosine_schedule(
    base_value: float,
    final_value: float,
    total_steps: int,
    warmup_steps: int = 0,
    start_warmup_value: float = 0.0,
) -> Callable:
    """Warmup + cosine decay as a pure fn of step (reference
    dino_utils.py:105-124)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start_warmup_value + (base_value - start_warmup_value) * (
            step / max(warmup_steps, 1)
        )
        t = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        cos = final_value + 0.5 * (base_value - final_value) * (
            1 + jnp.cos(jnp.pi * jnp.clip(t, 0.0, 1.0))
        )
        return jnp.where(step < warmup_steps, warm, cos).astype(jnp.float32)

    return fn


class DINOHead(nn.Module):
    """MLP -> L2 normalize -> weight-normed linear (reference
    dino_wrapper.py:78-130).  With norm_last_layer=True the weight-norm
    magnitude g is fixed at 1 (requires_grad=False in the reference); here
    g simply isn't a parameter in that case."""

    in_dim: int
    out_dim: int
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    nlayers: int = 3
    use_bn: bool = False
    norm_last_layer: bool = True
    normalize_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.normalize_input:
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
            )
        if self.nlayers == 1:
            x = nn.Dense(self.bottleneck_dim, name="mlp_0")(x)
        elif self.nlayers > 1:
            x = nn.Dense(self.hidden_dim, name="mlp_0")(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, name="bn_0"
                )(x)
            x = nn.gelu(x, approximate=False)
            for i in range(self.nlayers - 2):
                x = nn.Dense(self.hidden_dim, name=f"mlp_{i + 1}")(x)
                if self.use_bn:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9,
                        name=f"bn_{i + 1}",
                    )(x)
                x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.bottleneck_dim, name=f"mlp_{self.nlayers - 1}")(x)

        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        # weight-normed last layer: w = g * v / ||v||_rows (per output col)
        v = self.param(
            "last_layer_v",
            nn.initializers.normal(0.02),
            (self.bottleneck_dim, self.out_dim),
        )
        v_normed = v / jnp.maximum(
            jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12
        )
        if self.norm_last_layer:
            w = v_normed
        else:
            g = self.param("last_layer_g", nn.initializers.ones, (self.out_dim,))
            w = v_normed * g[None, :]
        return jnp.dot(x, w, preferred_element_type=jnp.float32)


class DINONet(nn.Module):
    """backbone -> embedding -> DINOHead, operating on (N, T, F) crops."""

    backbone: nn.Module
    head: nn.Module

    def __call__(self, feats, train: bool = False):
        emb = embedding_from_outputs(self.backbone(feats, train=train))
        return self.head(emb, train=train)

    def embed(self, feats, mask=None, train: bool = False):
        return embedding_from_outputs(
            self.backbone(feats, mask=mask, train=train)
        )


class DINOState(flax.struct.PyTreeNode):
    step: jax.Array
    student_params: Any
    teacher_params: Any
    batch_stats: Any          # student BN stats
    teacher_batch_stats: Any
    center: jax.Array
    opt_state: Any


def create_dino_state(
    net: DINONet,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    example_crops: jax.Array,
    out_dim: int,
) -> DINOState:
    variables = net.init(rng, example_crops, train=True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return DINOState(
        step=jnp.zeros((), jnp.int32),
        student_params=params,
        teacher_params=jax.tree.map(jnp.copy, params),
        batch_stats=stats,
        teacher_batch_stats=jax.tree.map(jnp.copy, stats),
        center=jnp.zeros((1, out_dim)),
        opt_state=tx.init(params),
    )


def _dino_loss(student_out, teacher_out, center, n_s, n_t, s_temp, t_temp):
    """Crop-pair cross-entropy (reference DINOLoss.forward:163-204,
    mode 0: skip same-index pairs)."""
    s_chunks = jnp.stack(jnp.split(student_out, n_s, axis=0))  # (n_s, B, K)
    t_logits = (teacher_out - center) / t_temp
    t_probs = jax.lax.stop_gradient(jax.nn.softmax(t_logits, axis=-1))
    t_chunks = jnp.stack(jnp.split(t_probs, n_t, axis=0))

    s_logp = jax.nn.log_softmax(s_chunks / s_temp, axis=-1)
    total, n_terms = 0.0, 0
    for iq in range(n_t):
        for v in range(n_s):
            if v == iq:
                continue
            ce = -jnp.sum(t_chunks[iq] * s_logp[v], axis=-1)
            total = total + jnp.mean(ce)
            n_terms += 1
    return total / n_terms


def _clip_grads_per_param(grads, clip: float):
    """Per-parameter L2 norm clip (reference dino_utils.clip_gradients:26)."""

    def clip_one(g):
        norm = jnp.linalg.norm(g)
        coef = jnp.minimum(clip / (norm + 1e-6), 1.0)
        return g * coef

    return jax.tree.map(clip_one, grads)


def _zero_last_layer(grads, freeze: jax.Array):
    """Zero DINOHead last-layer grads while freeze is true (reference
    cancel_gradients_last_layer:38)."""

    def maybe_zero(path, g):
        keys = [getattr(p, "key", None) for p in path]
        if any(k is not None and str(k).startswith("last_layer") for k in keys):
            return jnp.where(freeze, jnp.zeros_like(g), g)
        return g

    return jax.tree_util.tree_map_with_path(maybe_zero, grads)


def make_dino_train_step(
    net: DINONet,
    tx: optax.GradientTransformation,
    lr_schedule: Callable,
    wd_schedule: Callable,
    momentum_schedule: Callable,
    teacher_temp_schedule: Callable,
    n_global: int = 2,
    n_local: int = 4,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
    clip_grad: float = 3.0,
    freeze_last_layer_steps: int = 0,
    preprocess_fn: Optional[Callable] = None,
    mesh=None,
    compute_dtype=None,
    trace_decay: Optional[float] = None,
):
    """Build the jitted DINO step.

    Batch: {'global_feat': (B, n_global, Tg, F),
            'local_feat':  (B, n_local,  Tl, F)}, or raw-crop fields that
    `preprocess_fn(batch, rng) -> (global_feat, local_feat|None)` maps to
    features in-graph (device aug + fbank).
    The optimizer `tx` must be built WITHOUT weight decay and without lr
    (e.g. plain optax.trace / scale_by_adam): wd is applied coupled-style
    here and -lr afterwards so both cosine schedules stay in-graph.
    `compute_dtype=jnp.bfloat16` is the reference's enable_amp role
    (ssl/utils/dino_executor.py:71 autocast): bf16 backbone fwd/bwd with
    f32 master weights; the DINO loss (softmax sharpening, centering)
    and the EMA/center updates stay f32.
    """

    def step_fn(state: DINOState, batch, rng):
        lr = lr_schedule(state.step)
        wd = wd_schedule(state.step)
        m = momentum_schedule(state.step)
        t_temp = teacher_temp_schedule(state.step)
        freeze = state.step < freeze_last_layer_steps
        rng = jax.random.fold_in(rng, state.step)

        if preprocess_fn is not None:
            g, l = preprocess_fn(batch, rng)
        else:
            g, l = batch["global_feat"], batch.get("local_feat")
        # (B, n, T, F) -> crops-major (n*B, T, F) so chunking by crop works
        g_flat = g.transpose(1, 0, 2, 3).reshape((-1,) + g.shape[2:])

        def forward(params, stats, feats, train):
            if compute_dtype is not None:
                cast = lambda x: (
                    x.astype(compute_dtype)
                    if x.dtype == jnp.float32
                    else x
                )
                params = jax.tree.map(cast, params)
                feats = feats.astype(compute_dtype)
            variables = {"params": params}
            if stats:
                variables["batch_stats"] = stats
            out, updates = net.apply(
                variables, feats, train=train, mutable=["batch_stats"]
            )
            # head outputs feed the f32 softmax/centering loss
            return out.astype(jnp.float32), updates.get("batch_stats", {})

        def loss_fn(params):
            s_g, new_stats = forward(params, state.batch_stats, g_flat, True)
            outs = [s_g]
            if l is not None:
                l_flat = l.transpose(1, 0, 2, 3).reshape((-1,) + l.shape[2:])
                s_l, new_stats2 = forward(params, new_stats, l_flat, True)
                outs.append(s_l)
                new_stats = new_stats2
            student_out = jnp.concatenate(outs, axis=0)

            t_out, new_t_stats = forward(
                state.teacher_params, state.teacher_batch_stats, g_flat, True
            )
            t_out = jax.lax.stop_gradient(t_out)

            n_s = n_global + (n_local if l is not None else 0)
            loss = _dino_loss(
                student_out, t_out, state.center, n_s, n_global,
                student_temp, t_temp,
            )
            return loss, (new_stats, new_t_stats, t_out)

        (loss, (new_stats, new_t_stats, t_out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.student_params)

        grads = _clip_grads_per_param(grads, clip_grad)
        grads = _zero_last_layer(grads, freeze)

        # Optimizer + teacher-EMA glue, fused (round-5, VERDICT r4 #4):
        # the stage-by-stage path (wd add -> tx.update -> -lr scale ->
        # apply -> teacher EMA) runs 5 elementwise passes with several
        # kernels per leaf; for the common plain-momentum tx
        # (optax.trace) the closed form below computes new_momentum,
        # new_params and the teacher EMA in three tree.maps with
        # identical numerics and the same TraceState structure.
        use_fused = trace_decay is not None and isinstance(
            state.opt_state, optax.TraceState
        )
        if use_fused:
            decay = trace_decay
            trace_state = state.opt_state
            new_m = jax.tree.map(
                lambda g, p, mo: (g + wd * p) + decay * mo,
                grads, state.student_params, trace_state.trace,
            )
            new_params = jax.tree.map(
                lambda p, m2: p - lr * m2, state.student_params, new_m
            )
            new_opt_state = optax.TraceState(trace=new_m)
        else:
            grads = jax.tree.map(
                lambda gr, p: gr + wd * p, grads, state.student_params
            )
            updates, new_opt_state = tx.update(
                grads, state.opt_state, state.student_params
            )
            updates = jax.tree.map(lambda u: u * (-lr), updates)
            new_params = optax.apply_updates(state.student_params, updates)

        # teacher EMA (reference dino_wrapper.ema_update:270)
        new_teacher = jax.tree.map(
            lambda t, s: t * m + s * (1.0 - m),
            state.teacher_params,
            new_params,
        )
        # center EMA; jnp.mean over the (sharded) batch axis is global
        batch_center = jnp.mean(t_out, axis=0, keepdims=True)
        new_center = state.center * center_momentum + batch_center * (
            1 - center_momentum
        )

        new_state = state.replace(
            step=state.step + 1,
            student_params=new_params,
            teacher_params=new_teacher,
            batch_stats=new_stats,
            teacher_batch_stats=new_t_stats,
            center=new_center,
            opt_state=new_opt_state,
        )
        metrics = {"loss": loss, "lr": lr, "wd": wd, "teacher_momentum": m}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn, donate_argnums=(0,), in_shardings=(None, batch_sh, repl)
    )
