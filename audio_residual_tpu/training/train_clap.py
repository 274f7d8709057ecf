"""Contrastive CLAP pretraining/finetuning — the TPU-native `training/main.py`
+ `training/train.py` train loop.

Distribution model (replaces DDP/Horovod + NCCL, `distributed.py:63-139`):
a 1-D data mesh; params replicated, batch sharded. The train step is a single
jitted program over the mesh — XLA inserts the feature all-gathers for the
global-batch contrastive loss and the gradient reductions that DDP did by
hand (`loss.py:15-91`, implicit allreduce). ``local_loss`` semantics are
available through :func:`audio_residual_tpu.training.losses.clip_loss` under
``shard_map`` if ever needed; the default global formulation is numerically
identical.

Optimizer grouping matches `main.py:283-309`: no weight decay for params with
ndim < 2 (biases, LN/BN scales, logit scales) — implemented as an optax mask.
Per-step logit-scale clamp to ln(100) mirrors `train.py:124-159`.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_residual_tpu.models import clap as clap_mod
from audio_residual_tpu.training.losses import clip_loss
from audio_residual_tpu.training.scheduler import cosine_lr

__all__ = ["make_optimizer", "make_train_step", "TrainState", "init_train_state"]

MAX_LOGIT_SCALE = float(np.log(100.0))


def TrainState(**kw) -> dict:
    """Plain-dict train state pytree: {params, opt_state, step}."""
    return dict(**kw)


def decay_mask(params) -> Any:
    """True where weight decay applies (`main.py:283-309` exclusion of
    ndim<2 / bn / ln / bias / logit_scale)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def make_optimizer(
    lr: float = 1e-4,
    *,
    beta1: float = 0.99,
    beta2: float = 0.9,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    warmup: int = 3200,
    total_steps: int = 100000,
    name: str = "adamw",
    momentum: float = 0.9,
    skip_scheduler: bool = False,
) -> optax.GradientTransformation:
    """``--optimizer`` mux (`clap_module/utils.py:374-389`) with
    cosine-warmup schedule and the reference's decay mask.

    adamw: decoupled decay on ndim>=2 params (AdamW default). adam: the
    reference FORCES wd to 0 when adam is selected (`main.py:312-314`), so
    adam == the same chain with no decay term. sgd: torch ``optim.SGD(lr,
    momentum)`` — heavy-ball momentum buffer, no decay, no eps/betas.
    AdamW beta defaults mirror ``get_default_params`` for HTSAT
    (`params.py:4-10`); these are config, override freely.
    ``skip_scheduler`` holds lr at the base value (no warmup/decay) — the
    `--skip-scheduler` semantics, which the reference parses
    (`params.py:233-237`) but never wires up; here the flag works.
    """
    sched = (lambda s: lr) if skip_scheduler else cosine_lr(lr, warmup, total_steps)
    scale = optax.scale_by_schedule(lambda s: -sched(s))
    if name == "sgd":
        return optax.chain(optax.trace(decay=momentum), scale)
    if name == "adam":
        weight_decay = 0.0  # `main.py:312-314`
    elif name != "adamw":
        raise ValueError("optimizer name is not correct")  # `utils.py:388`
    return optax.chain(
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps),
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        scale,
    )


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(
    cfg: clap_mod.CLAPConfig,
    optimizer: optax.GradientTransformation,
    *,
    mlp_loss: bool = False,
    compute_dtype: Any = None,
    freeze_text: bool = False,
    mixup_alpha: float = 0.0,
    remat: bool = False,
    fsdp_mesh: Any = None,
    fsdp_axis: str = "data",
    weight_loss_kappa: float = 0.0,
) -> Callable:
    """Jitted ``(state, batch, rng) -> (state, metrics)``.

    ``batch``: {"waveform" [B, T], "input_ids" [B, L], "attention_mask"
    [B, L]}. Shard the batch leading axis over a data mesh and the same step
    runs 1-chip or N-chip unchanged.

    ``remat=True`` wraps the dual-tower forward in ``jax.checkpoint``: the
    backward rematerialises activations instead of keeping every layer's
    intermediates live between forward and backward — the TPU-native
    memory-for-FLOPs trade (HBM is the usual per-chip batch-size limiter;
    the reference has no equivalent because torch keeps the graph anyway).
    Gradients are EXACT — same values as ``remat=False``.

    ``fsdp_mesh``: a :class:`jax.sharding.Mesh` enables FSDP/ZeRO-3-style
    state sharding (see :mod:`audio_residual_tpu.parallel.fsdp`, a scaling
    extension beyond the reference's replicated DDP): grads, updated params
    and optimizer state are sharding-constrained to the shape-based FSDP
    rule, so GSPMD emits just-in-time param all-gathers in the forward and
    a gradient ``reduce_scatter`` instead of DP's ``psum`` — per-chip state
    memory drops by the mesh size. Pass state through
    ``parallel.fsdp.shard_train_state`` first; the math is unchanged.
    """

    def apply_towers(params, audio, input_ids, attention_mask, rng):
        return clap_mod.clap_apply(
            params, audio, input_ids, attention_mask, cfg,
            train=True, rng=rng, compute_dtype=compute_dtype,
        )

    if remat:
        apply_towers = jax.checkpoint(apply_towers)

    def loss_fn(params, batch, rng):
        audio = {"waveform": batch["waveform"]}
        if mixup_alpha and "mixup_lambda" in batch:
            # waveform-level mixup (`utils.py:196-208`, --mixup flag)
            from audio_residual_tpu.utils.misc import do_mixup

            audio = {"waveform": do_mixup(batch["waveform"], batch["mixup_lambda"])}
        out = apply_towers(
            params, audio, batch["input_ids"], batch.get("attention_mask"), rng
        )
        return clip_loss(
            out, mlp_loss=mlp_loss, weight_loss_kappa=weight_loss_kappa
        ), out

    if fsdp_mesh is not None:
        from audio_residual_tpu.parallel.fsdp import constrain_tree

    @jax.jit
    def step(state, batch, rng):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, rng
        )
        if fsdp_mesh is not None:
            # grads land on the param shards: backward of the just-in-time
            # param all-gather lowers to reduce_scatter instead of DP's psum
            grads = constrain_tree(grads, fsdp_mesh, fsdp_axis)
        if freeze_text:
            # `main.py` --freeze-text: zero text-branch grads
            grads = dict(grads)
            grads["text_branch"] = jax.tree.map(jnp.zeros_like, grads["text_branch"])
        updates, opt_state = optimizer.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        # clamp logit scales to ln(100) (`train.py:154-159`)
        params = dict(params)
        params["logit_scale_a"] = jnp.clip(params["logit_scale_a"], None, MAX_LOGIT_SCALE)
        params["logit_scale_t"] = jnp.clip(params["logit_scale_t"], None, MAX_LOGIT_SCALE)
        if "bn0_state" in out:
            # merge updated BatchNorm running stats (train-mode bn0;
            # global-batch stats under pjit subsume --use-bn-sync)
            ab = dict(params["audio_branch"])
            ab["bn0"] = {**ab["bn0"], **out["bn0_state"]}
            params["audio_branch"] = ab
        new_state = TrainState(params=params, opt_state=opt_state, step=state["step"] + 1)
        if fsdp_mesh is not None:
            # keep the updated state on its shards across steps (the clamp /
            # bn-merge edits above would otherwise let propagation drift)
            new_state = constrain_tree(new_state, fsdp_mesh, fsdp_axis)
        metrics = {
            "loss": loss,
            "logit_scale_a": params["logit_scale_a"],
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return step


def make_split_optimizer(
    *,
    lr_pretrained: float = 1e-5,
    lr_new: float = 1e-4,
    weight_decay_pretrained: float = 0.2,
    weight_decay_new: float = 0.2,
    warmup: int = 3200,
    total_steps: int = 100000,
    is_pretrained=None,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    betas_pretrained=None,
    betas_new=None,
    eps_pretrained: float | None = None,
    eps_new: float | None = None,
    name: str = "adamw",
    momentum_pretrained: float = 0.9,
    momentum_new: float = 0.9,
    skip_scheduler: bool = False,
) -> optax.GradientTransformation:
    """Separate optimizer groups for pretrained vs newly-initialised params —
    the ``--split-opt`` regime (`main.py:323-404`).

    ``is_pretrained(path_tuple) -> bool`` labels each leaf; the default marks
    the encoder towers (loaded from a checkpoint) as pretrained and the
    projections/transforms/logit scales as new, matching
    ``is_pretrained_params`` (`main.py:109`). Per-group betas/eps/momentum
    default to the shared values (the reference's None-fallback,
    `main.py:323-326`); ``name`` muxes adamw/sgd/adam like
    :func:`make_optimizer`.
    """
    if is_pretrained is None:
        def is_pretrained(path):
            top = path[0] if path else ""
            return str(top) in ("audio_branch", "text_branch")

    def label_tree(params):
        def walk(tree, path):
            if isinstance(tree, dict):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            if isinstance(tree, (list, tuple)):
                return type(tree)(walk(v, path + (i,)) for i, v in enumerate(tree))
            return "pretrained" if is_pretrained(path) else "new"

        return walk(params, ())

    def group(lr, wd, bg, eg, mom):
        bg = bg or betas
        return make_optimizer(
            lr, beta1=bg[0], beta2=bg[1], eps=eg if eg is not None else eps,
            weight_decay=wd, warmup=warmup, total_steps=total_steps,
            name=name, momentum=mom, skip_scheduler=skip_scheduler,
        )

    return optax.multi_transform(
        {
            "pretrained": group(lr_pretrained, weight_decay_pretrained,
                                betas_pretrained, eps_pretrained,
                                momentum_pretrained),
            "new": group(lr_new, weight_decay_new, betas_new, eps_new,
                         momentum_new),
        },
        label_tree,
    )
