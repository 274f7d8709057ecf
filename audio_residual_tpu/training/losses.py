"""Contrastive and linear-probe losses.

Reference: `CLAP/src/laion_clap/clap_module/loss.py`.

  * ``gather_features`` (`loss.py:15-91`): NCCL/Horovod all_gather of audio &
    text features across ranks. TPU-native equivalent: ``jax.lax.all_gather``
    over the data-parallel mesh axis inside the jitted/shard_mapped train
    step — differentiable by construction, so the reference's three gather
    modes (horovod / torch.distributed.nn / grad-splice) collapse into one.
  * ``ClipLoss`` (`loss.py:93-221`): symmetric InfoNCE over the global batch;
    2-term (audio@text) or 4-term "mlp_loss" (audio@text_mlp + text@audio_mlp);
    optional ``local_loss`` (local x global logits with rank-offset labels).
  * ``LPLoss`` / ``LPMetrics`` (`loss.py:246-306`): bce/ce/mse heads and
    mAP/acc/mAUC metrics for the linear probe.

All pure functions of arrays; distribution enters only through ``axis_name``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gather_features", "clip_loss", "contrastive_weights", "lp_loss", "lp_metrics",
]


def gather_features(
    audio_features: jnp.ndarray,
    text_features: jnp.ndarray,
    audio_features_mlp: jnp.ndarray | None = None,
    text_features_mlp: jnp.ndarray | None = None,
    *,
    axis_name: str | None = None,
    local_loss: bool = False,
    mlp_loss: bool = False,
):
    """All-gather features over the mesh axis (`loss.py:15-91`).

    Returns ``(all_audio, all_text[, all_audio_mlp, all_text_mlp])``. With
    ``local_loss=False`` the gathered tensors carry gradient from every shard
    (the `gather_with_grad` semantics) — on TPU this is just how
    ``all_gather`` differentiates; there is no non-differentiable mode to
    emulate.
    """
    if axis_name is None:
        outs = (audio_features, text_features, audio_features_mlp, text_features_mlp)
        return outs if mlp_loss else outs[:2]

    ag = lambda x: jax.lax.all_gather(x, axis_name, tiled=True)  # noqa: E731
    outs = (
        ag(audio_features),
        ag(text_features),
        ag(audio_features_mlp) if audio_features_mlp is not None else None,
        ag(text_features_mlp) if text_features_mlp is not None else None,
    )
    return outs if mlp_loss else outs[:2]


def _ce_rows(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def contrastive_weights(features: jnp.ndarray, kappa: float) -> jnp.ndarray:
    """Per-sample weights of the weighted contrastive loss
    (`loss.py:166-170,213-216`): ``exp(rowsum(F @ F.T) / (kappa * N))``,
    detached. Rows similar to many others get up-weighted as loss targets."""
    sims = features @ features.T
    w = jnp.exp(jnp.sum(sims, axis=1) / (kappa * features.shape[0]))
    return jax.lax.stop_gradient(w)


def _weighted_ce(logits: jnp.ndarray, labels: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """torch ``F.cross_entropy(..., weight=w)`` semantics: ``w`` is a
    per-CLASS vector; with contrastive ``labels = arange(N)`` class i IS
    sample i, so this is the w-weighted mean of per-row CE — including
    torch's normalisation by ``sum(w[labels])``, not by N."""
    ce = _ce_rows(logits, labels)
    wl = w[labels]
    return jnp.sum(wl * ce) / jnp.sum(wl)


def clip_loss(
    outputs: dict,
    *,
    axis_name: str | None = None,
    local_loss: bool = False,
    mlp_loss: bool = False,
    weight_loss_kappa: float = 0.0,
) -> jnp.ndarray:
    """Symmetric InfoNCE over the (global) batch (`loss.py:131-221`).

    ``outputs`` is the dict from
    :func:`audio_residual_tpu.models.clap.clap_apply`. Labels are
    ``arange(global_batch)`` — or rank-offset local labels when
    ``local_loss=True`` (`loss.py:151-152`).

    ``weight_loss_kappa != 0`` enables the weighted contrastive loss
    (``--kappa``, `loss.py:104-115`): per-sample weights from
    :func:`contrastive_weights`, applied with torch class-weight CE
    semantics. Term assignment follows the reference exactly — the 2-term
    loss CROSSES them (audio logits weighted by TEXT weights,
    `loss.py:218-220`) and computes weights on the gathered features, while
    the 4-term loss pairs same-modality (`loss.py:171-176`) and computes
    weights on the LOCAL features — which under multi-rank training is a
    reference crash (length-N_local weight vector vs N_global classes at
    `loss.py:166`), so that combination raises here.
    """
    a = outputs["audio_features"]
    t = outputs["text_features"]
    n_local = a.shape[0]

    if mlp_loss:
        am, tm = outputs["audio_features_mlp"], outputs["text_features_mlp"]
        all_a, all_t, all_am, all_tm = gather_features(
            a, t, am, tm, axis_name=axis_name, local_loss=local_loss, mlp_loss=True
        )
        sa, st = outputs["logit_scale_a"], outputs["logit_scale_t"]
        if local_loss and axis_name is not None:
            # local x global logits with rank-offset labels (`loss.py:131-137`):
            # scale_a pairs with the *_mlp-on-text products, scale_t with the
            # *_mlp-on-audio ones — NOT symmetric per tower, match exactly
            a_logits = sa * a @ all_tm.T       # a_logits_per_audio
            a_logits_r = sa * tm @ all_a.T     # a_logits_per_text
            t_logits = st * am @ all_t.T       # t_logits_per_audio
            t_logits_r = st * t @ all_am.T     # t_logits_per_text
            rank = jax.lax.axis_index(axis_name)
            labels = jnp.arange(n_local) + rank * n_local
        else:
            # `loss.py:138-146`: the transposed terms keep the SAME scale as
            # their partner (a_logits_per_text = a_logits_per_audio.T) — a
            # scale swap here is invisible while sa == st (both init to
            # ln(1/0.07)) but diverges as the scales train apart
            a_logits = sa * all_a @ all_tm.T   # a_logits_per_audio
            a_logits_r = a_logits.T            # a_logits_per_text
            t_logits = st * all_am @ all_t.T   # t_logits_per_audio
            t_logits_r = t_logits.T            # t_logits_per_text
            labels = jnp.arange(a_logits.shape[0])
        if weight_loss_kappa:
            if axis_name is not None:
                raise NotImplementedError(
                    "weighted 4-term loss under data sharding: the reference "
                    "computes weights on LOCAL features (loss.py:166-170), "
                    "which crashes multi-rank torch (N_local weights vs "
                    "N_global classes) — no semantics to match"
                )
            aw = contrastive_weights(a, weight_loss_kappa)
            tw = contrastive_weights(t, weight_loss_kappa)
            loss = (
                _weighted_ce(a_logits, labels, aw)
                + _weighted_ce(a_logits_r, labels, aw)
                + _weighted_ce(t_logits, labels, tw)
                + _weighted_ce(t_logits_r, labels, tw)
            ) / 4.0
        else:
            loss = (
                jnp.mean(_ce_rows(a_logits, labels))
                + jnp.mean(_ce_rows(a_logits_r, labels))
                + jnp.mean(_ce_rows(t_logits, labels))
                + jnp.mean(_ce_rows(t_logits_r, labels))
            ) / 4.0
    else:
        all_a, all_t = gather_features(a, t, axis_name=axis_name, local_loss=local_loss)
        scale = outputs["logit_scale_a"]
        if local_loss and axis_name is not None:
            logits_a = scale * a @ all_t.T  # [n_local, n_global]
            logits_t = scale * t @ all_a.T
            rank = jax.lax.axis_index(axis_name)
            labels = jnp.arange(n_local) + rank * n_local
        else:
            logits_a = scale * all_a @ all_t.T
            logits_t = logits_a.T
            labels = jnp.arange(logits_a.shape[0])
        if weight_loss_kappa:
            # weights on the GATHERED features, cross-assigned: audio logits
            # weighted by text weights and vice versa (`loss.py:213-220`)
            aw = contrastive_weights(all_a, weight_loss_kappa)
            tw = contrastive_weights(all_t, weight_loss_kappa)
            loss = 0.5 * (
                _weighted_ce(logits_a, labels, tw) + _weighted_ce(logits_t, labels, aw)
            )
        else:
            loss = 0.5 * (
                jnp.mean(_ce_rows(logits_a, labels)) + jnp.mean(_ce_rows(logits_t, labels))
            )

    if axis_name is not None:
        # every shard computed the same global loss (or its local share);
        # average so grads match the reference's DDP mean semantics
        loss = jax.lax.pmean(loss, axis_name)
    return loss


def lp_loss(pred: jnp.ndarray, target: jnp.ndarray, kind: str = "ce") -> jnp.ndarray:
    """Linear-probe losses (`loss.py:291-306`): bce (multi-label, expects
    logits), ce (single-label int targets), mse."""
    if kind == "ce":
        if target.ndim == 1:
            return jnp.mean(_ce_rows(pred, target))
        return jnp.mean(-jnp.sum(target * jax.nn.log_softmax(pred, -1), axis=-1))
    if kind == "bce":
        z = pred
        t = target.astype(pred.dtype)
        return jnp.mean(jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z))))
    if kind == "mse":
        return jnp.mean((pred - target.astype(pred.dtype)) ** 2)
    raise ValueError(kind)


def lp_metrics(pred: np.ndarray, target: np.ndarray, metrics=("acc", "map", "mauc")) -> dict:
    """mAP / acc / mAUC via sklearn on host (`loss.py:246-283`)."""
    from sklearn import metrics as skm

    pred = np.asarray(pred)
    target = np.asarray(target)
    onehot = target
    if target.ndim == 1:
        onehot = np.eye(pred.shape[-1])[target]
    out = {}
    if "acc" in metrics:
        out["acc"] = float((pred.argmax(-1) == onehot.argmax(-1)).mean())
    if "map" in metrics:
        out["map"] = float(skm.average_precision_score(onehot, pred, average="macro"))
    if "mauc" in metrics:
        out["mauc"] = float(skm.roc_auc_score(onehot, pred, average="macro"))
    return out
