"""CLIP-legacy vision towers, TPU-native (NHWC, functional pytrees).

The reference carries three vision towers from its open_clip ancestry —
`clap_module/model.py:153-241` (ModifiedResNet), `model.py:305-372`
(VisualTransformer) and `clap_module/timm_model.py:20-106` (the timm
adapter) — although its CLAP class never instantiates them (`model.py:
422-520` builds audio + text branches only). They are rebuilt here so the
framework's component inventory is complete and a vision branch can be
attached the day one is needed:

- NHWC layouts end-to-end (the TPU-preferred conv layout; torch is NCHW).
- The ViT patch embed is a reshape + one big matmul (exactly equal to a
  stride=patch conv, and it lands straight on the MXU).
- `create_vision_tower` stands in for timm: a small registry of JAX trunks
  keyed by the familiar timm names, with the adapter's pool ('avg', '',
  'abs_attn') and proj ('linear', 'mlp', '') head semantics. `rot_attn`
  (timm's rotary attention pool) is not carried — it raises with a clear
  message.
- `lock()` (`model.py:214-221,339-344`, `timm_model.py:71-101`) becomes
  :func:`vision_freeze_mask` — a boolean pytree for optax masking, the JAX
  way to freeze parameters.

BatchNorm in the ResNet runs in inference mode against stored moving
statistics (these towers exist for checkpoint compatibility and zero-shot
eval; the reference never trains them inside CLAP).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from audio_residual_tpu.data.transforms import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)

__all__ = [
    "VisionCfg",
    "init_vit_params",
    "vit_apply",
    "init_resnet_params",
    "resnet_apply",
    "attention_pool_2d",
    "create_vision_tower",
    "vision_freeze_mask",
    # normalization constants re-exported from data.transforms
    "OPENAI_DATASET_MEAN",
    "OPENAI_DATASET_STD",
]


@dataclass(frozen=True)
class VisionCfg:
    """Mirror of the reference `CLAPVisionCfg` (`model.py:375-392`)."""

    layers: tuple | int = 12  # tuple -> ModifiedResNet stage depths, int -> ViT
    width: int = 768
    patch_size: int = 16
    image_size: int = 224
    timm_model_name: str | None = None
    timm_pool: str = "avg"
    timm_proj: str = "linear"
    quick_gelu: bool = False


def _ln(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _apply_ln(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _gelu(x, quick):
    return x * jax.nn.sigmoid(1.702 * x) if quick else jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# VisualTransformer (`model.py:305-372`)
# ---------------------------------------------------------------------------


def _init_blocks(keys, width, layers):
    """CLIP residual-block init (`model.py:551-560`) — shared with the text
    tower: attn std w^-0.5, out/proj std (w^-0.5)(2L)^-0.5, fc std (2w)^-0.5."""
    proj_std = (width**-0.5) * ((2 * layers) ** -0.5)
    attn_std = width**-0.5
    fc_std = (2 * width) ** -0.5
    blocks = []
    for _ in range(layers):
        blocks.append(
            {
                "ln1": _ln(width),
                "attn": {
                    "in_proj": {
                        "kernel": attn_std * jax.random.normal(next(keys), (width, 3 * width)),
                        "bias": jnp.zeros((3 * width,)),
                    },
                    "out_proj": {
                        "kernel": proj_std * jax.random.normal(next(keys), (width, width)),
                        "bias": jnp.zeros((width,)),
                    },
                },
                "ln2": _ln(width),
                "mlp": {
                    "c_fc": {
                        "kernel": fc_std * jax.random.normal(next(keys), (width, 4 * width)),
                        "bias": jnp.zeros((4 * width,)),
                    },
                    "c_proj": {
                        "kernel": proj_std * jax.random.normal(next(keys), (4 * width, width)),
                        "bias": jnp.zeros((width,)),
                    },
                },
            }
        )
    return blocks


def _blocks_apply(blocks, x, quick_gelu):
    """Pre-LN residual attention stack (`model.py:259-302`), no mask."""
    b, l, w = x.shape
    nh = _heads_for(w)
    hd = w // nh
    for blk in blocks:
        y = _apply_ln(blk["ln1"], x)
        qkv = y @ blk["attn"]["in_proj"]["kernel"] + blk["attn"]["in_proj"]["bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, nh, hd).transpose(0, 2, 1, 3) / np.sqrt(hd)
        k = k.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(b, l, w)
        x = x + (ctx @ blk["attn"]["out_proj"]["kernel"] + blk["attn"]["out_proj"]["bias"])
        y = _apply_ln(blk["ln2"], x)
        h = _gelu(y @ blk["mlp"]["c_fc"]["kernel"] + blk["mlp"]["c_fc"]["bias"], quick_gelu)
        x = x + (h @ blk["mlp"]["c_proj"]["kernel"] + blk["mlp"]["c_proj"]["bias"])
    return x


def _heads_for(width: int) -> int:
    # reference wiring: vision_heads = vision_cfg.width // 64 (`model.py:466`
    # in open_clip; CLAP keeps the convention)
    return max(width // 64, 1)


def init_vit_params(key: jax.Array, cfg: VisionCfg, embed_dim: int) -> dict:
    assert isinstance(cfg.layers, int)
    grid = cfg.image_size // cfg.patch_size
    w = cfg.width
    keys = iter(jax.random.split(key, 6 + 4 * cfg.layers))
    scale = w**-0.5
    return {
        # stride=patch conv stored as a [p*p*3, width] matmul kernel (NHWC
        # patch-major flattening); no bias, like the reference conv1
        "patch_embed": {"kernel": scale * jax.random.normal(next(keys), (cfg.patch_size * cfg.patch_size * 3, w))},
        "class_embedding": scale * jax.random.normal(next(keys), (w,)),
        "positional_embedding": scale * jax.random.normal(next(keys), (grid * grid + 1, w)),
        "ln_pre": _ln(w),
        "blocks": _init_blocks(keys, w, cfg.layers),
        "ln_post": _ln(w),
        "proj": scale * jax.random.normal(next(keys), (w, embed_dim)),
    }


def _patchify(images: jnp.ndarray, p: int) -> jnp.ndarray:
    """``[B, H, W, 3] -> [B, (H/p)*(W/p), p*p*3]`` with the channel-fastest
    ordering that matches a torch ``Conv2d(3, w, p, stride=p)`` kernel
    flattened as ``weight.permute(2, 3, 1, 0).reshape(p*p*3, w)``."""
    b, h, wd, c = images.shape
    gh, gw = h // p, wd // p
    x = images.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, p, p, 3]
    return x.reshape(b, gh * gw, p * p * c)


def vit_apply(params: dict, images: jnp.ndarray, cfg: VisionCfg) -> jnp.ndarray:
    """``images [B, H, W, 3] (NHWC, normalized) -> [B, embed_dim]``
    (`model.py:346-372`)."""
    x = _patchify(images, cfg.patch_size) @ params["patch_embed"]["kernel"]
    b = x.shape[0]
    cls = jnp.broadcast_to(params["class_embedding"], (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1) + params["positional_embedding"]
    x = _apply_ln(params["ln_pre"], x)
    x = _blocks_apply(params["blocks"], x, cfg.quick_gelu)
    x = _apply_ln(params["ln_post"], x[:, 0, :])
    return x @ params["proj"]


# ---------------------------------------------------------------------------
# ModifiedResNet (`model.py:47-241`)
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout):
    # torch Conv2d default: kaiming-uniform(a=sqrt(5)) == U(±sqrt(1/fan_in))
    fan_in = kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    return jax.random.uniform(key, (kh, kw, cin, cout), minval=-bound, maxval=bound)


def _bn_init(c):
    return {
        "scale": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)),
        "var": jnp.ones((c,)),
    }


def _conv(x, kernel, stride=1):
    # explicit symmetric (k-1)//2 padding: XLA's SAME pads asymmetrically for
    # stride 2 / even input, which samples different positions than torch's
    # symmetric padding=1 — explicit padding keeps the towers weight-portable
    kh, kw = kernel.shape[:2]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


_EXPANSION = 4  # Bottleneck.expansion (`model.py:48`)


def _init_bottleneck(keys, inplanes, planes, stride):
    p = {
        "conv1": {"kernel": _conv_init(next(keys), 1, 1, inplanes, planes)},
        "bn1": _bn_init(planes),
        "conv2": {"kernel": _conv_init(next(keys), 3, 3, planes, planes)},
        "bn2": _bn_init(planes),
        "conv3": {"kernel": _conv_init(next(keys), 1, 1, planes, planes * _EXPANSION)},
        "bn3": _bn_init(planes * _EXPANSION),
    }
    # zero-init the last BN scale per `model.py:209-212`
    p["bn3"]["scale"] = jnp.zeros((planes * _EXPANSION,))
    if stride > 1 or inplanes != planes * _EXPANSION:
        p["downsample"] = {
            "conv": {"kernel": _conv_init(next(keys), 1, 1, inplanes, planes * _EXPANSION)},
            "bn": _bn_init(planes * _EXPANSION),
        }
    return p


def _bottleneck_apply(p, x, stride):
    """Anti-aliased bottleneck (`model.py:90-103`): all convs stride 1, an
    avgpool after conv2 when stride > 1, and the downsample branch prepends
    the same avgpool."""
    out = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"]["kernel"])))
    out = jax.nn.relu(_bn(p["bn2"], _conv(out, p["conv2"]["kernel"])))
    if stride > 1:
        out = _avgpool(out, stride)
    out = _bn(p["bn3"], _conv(out, p["conv3"]["kernel"]))
    if "downsample" in p:
        idn = x if stride == 1 else _avgpool(x, stride)
        idn = _bn(p["downsample"]["bn"], _conv(idn, p["downsample"]["conv"]["kernel"]))
    else:
        idn = x
    return jax.nn.relu(out + idn)


def init_resnet_params(key: jax.Array, cfg: VisionCfg, embed_dim: int) -> dict:
    assert isinstance(cfg.layers, (tuple, list))
    width = cfg.width
    keys = iter(jax.random.split(key, 8 + 3 * sum(cfg.layers) + len(cfg.layers) + 8))
    params = {
        "conv1": {"kernel": _conv_init(next(keys), 3, 3, 3, width // 2)},
        "bn1": _bn_init(width // 2),
        "conv2": {"kernel": _conv_init(next(keys), 3, 3, width // 2, width // 2)},
        "bn2": _bn_init(width // 2),
        "conv3": {"kernel": _conv_init(next(keys), 3, 3, width // 2, width)},
        "bn3": _bn_init(width),
    }
    inplanes = width
    for i, (blocks, planes) in enumerate(
        zip(cfg.layers, (width, width * 2, width * 4, width * 8))
    ):
        stage = []
        for j in range(blocks):
            stride = (2 if i > 0 else 1) if j == 0 else 1
            stage.append(_init_bottleneck(keys, inplanes, planes, stride))
            inplanes = planes * _EXPANSION
        params[f"layer{i + 1}"] = stage
    feat = width * 32
    spacial = cfg.image_size // 32
    std = feat**-0.5
    params["attnpool"] = {
        "positional_embedding": std * jax.random.normal(next(keys), (spacial * spacial + 1, feat)),
        # CLIP re-inits q/k/v/c to normal(std=feat^-0.5) (`model.py:201-207`)
        "q_proj": {"kernel": std * jax.random.normal(next(keys), (feat, feat)), "bias": jnp.zeros((feat,))},
        "k_proj": {"kernel": std * jax.random.normal(next(keys), (feat, feat)), "bias": jnp.zeros((feat,))},
        "v_proj": {"kernel": std * jax.random.normal(next(keys), (feat, feat)), "bias": jnp.zeros((feat,))},
        "c_proj": {"kernel": std * jax.random.normal(next(keys), (feat, embed_dim)), "bias": jnp.zeros((embed_dim,))},
    }
    return params


def attention_pool_2d(p: dict, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """QKV attention pool (`model.py:106-150`): ``x [B, H, W, C] -> [B, out]``.
    The mean token queries; the output is taken at that token."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    tokens = jnp.concatenate([jnp.mean(tokens, axis=1, keepdims=True), tokens], axis=1)
    tokens = tokens + p["positional_embedding"]
    l = h * w + 1
    hd = c // num_heads

    def proj(name, t):
        return t @ p[name]["kernel"] + p[name]["bias"]

    # only the mean token's output is used -> query just that row
    q = proj("q_proj", tokens[:, :1]).reshape(b, 1, num_heads, hd).transpose(0, 2, 1, 3)
    k = proj("k_proj", tokens).reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
    v = proj("v_proj", tokens).reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q / np.sqrt(hd), k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, 1, c)
    return proj("c_proj", ctx)[:, 0]


def resnet_apply(params: dict, images: jnp.ndarray, cfg: VisionCfg,
                 *, pool: bool = True) -> jnp.ndarray:
    """``images [B, H, W, 3] -> [B, embed_dim]`` (`model.py:223-241`), or the
    final ``[B, H/32, W/32, width*32]`` feature map with ``pool=False`` (the
    timm-adapter 'abs_attn' path needs the unpooled map)."""
    x = images
    x = jax.nn.relu(_bn(params["bn1"], _conv(x, params["conv1"]["kernel"], stride=2)))
    x = jax.nn.relu(_bn(params["bn2"], _conv(x, params["conv2"]["kernel"])))
    x = jax.nn.relu(_bn(params["bn3"], _conv(x, params["conv3"]["kernel"])))
    x = _avgpool(x, 2)
    for i, blocks in enumerate(cfg.layers):
        for j in range(blocks):
            stride = (2 if i > 0 else 1) if j == 0 else 1
            x = _bottleneck_apply(params[f"layer{i + 1}"][j], x, stride)
    if not pool:
        return x
    heads = cfg.width * 32 // 64  # `model.py:470` convention
    return attention_pool_2d(params["attnpool"], x, heads)


# ---------------------------------------------------------------------------
# timm-adapter equivalent (`timm_model.py:20-106`)
# ---------------------------------------------------------------------------

# trunk registry standing in for `timm.create_model`: name -> (cfg overrides,
# kind, num_features). Covers the families the adapter was written for; any
# other name raises like the reference does when timm is absent.
_TRUNKS: dict[str, tuple[dict, str, int]] = {
    "vit_base_patch16_224": ({"layers": 12, "width": 768, "patch_size": 16}, "vit", 768),
    "vit_base_patch32_224": ({"layers": 12, "width": 768, "patch_size": 32}, "vit", 768),
    "vit_large_patch14_224": ({"layers": 24, "width": 1024, "patch_size": 14}, "vit", 1024),
    "resnet50": ({"layers": (3, 4, 6, 3), "width": 64}, "resnet", 2048),
}


def _init_linear(key, din, dout):
    k1, k2 = jax.random.split(key)
    bound = float(np.sqrt(1.0 / din))
    return {
        "kernel": jax.random.uniform(k1, (din, dout), minval=-bound, maxval=bound),
        "bias": jax.random.uniform(k2, (dout,), minval=-bound, maxval=bound),
    }


def create_vision_tower(
    embed_dim: int, cfg: VisionCfg
) -> tuple[Callable[[jax.Array], dict], Callable[[dict, jnp.ndarray], jnp.ndarray]]:
    """Vision-tower factory mirroring the reference dispatch: a set
    ``timm_model_name`` routes through the adapter (`timm_model.py:25-69`),
    a tuple ``layers`` builds ModifiedResNet, an int builds the
    VisualTransformer (open_clip `model.py` wiring). Returns
    ``(init_fn, apply_fn)``."""
    if cfg.timm_model_name:
        return _create_timm_adapter(embed_dim, cfg)
    if isinstance(cfg.layers, (tuple, list)):
        return (
            lambda key: init_resnet_params(key, cfg, embed_dim),
            lambda p, img: resnet_apply(p, img, cfg),
        )
    return (
        lambda key: init_vit_params(key, cfg, embed_dim),
        lambda p, img: vit_apply(p, img, cfg),
    )


def _create_timm_adapter(embed_dim: int, cfg: VisionCfg):
    name = cfg.timm_model_name
    if name not in _TRUNKS:
        raise RuntimeError(
            f"unknown vision trunk {name!r}: the TPU build replaces timm with "
            f"a JAX trunk registry ({sorted(_TRUNKS)}); add the trunk there "
            "(reference raises when timm is missing, timm_model.py:35-36)"
        )
    overrides, kind, num_features = _TRUNKS[name]
    trunk_cfg = VisionCfg(image_size=cfg.image_size, **overrides)
    pool, proj = cfg.timm_pool, cfg.timm_proj
    if pool == "rot_attn":
        raise NotImplementedError(
            "rot_attn (timm rotary attention pool) is not carried to the TPU "
            "build; use 'abs_attn' or 'avg' (timm_model.py:56-57)"
        )
    if pool == "abs_attn" and kind != "resnet":
        raise ValueError("abs_attn needs a 2d feature map trunk (timm_model.py:42-43)")
    if pool not in ("abs_attn", "avg", ""):
        raise ValueError(f"unknown timm_pool {pool!r}")
    if pool != "abs_attn" and proj not in ("linear", "mlp"):
        raise ValueError("projection layer needed if non-attention pooling is used")

    def init_fn(key: jax.Array) -> dict:
        k_trunk, k_pool, k_h1, k_h2 = jax.random.split(key, 4)
        if kind == "vit":
            trunk = init_vit_params(k_trunk, trunk_cfg, num_features)
            # adapter uses the trunk's pooled features, not a CLIP projection
            trunk.pop("proj")
        else:
            trunk = init_resnet_params(k_trunk, trunk_cfg, num_features)
            trunk.pop("attnpool")
        params: dict[str, Any] = {"trunk": trunk}
        prev = num_features
        if pool == "abs_attn":
            feat = trunk_cfg.width * 32
            spacial = cfg.image_size // 32
            std = feat**-0.5
            params["pool"] = {
                "positional_embedding": std * jax.random.normal(k_pool, (spacial * spacial + 1, feat)),
                "q_proj": {"kernel": std * jax.random.normal(jax.random.fold_in(k_pool, 1), (feat, feat)), "bias": jnp.zeros((feat,))},
                "k_proj": {"kernel": std * jax.random.normal(jax.random.fold_in(k_pool, 2), (feat, feat)), "bias": jnp.zeros((feat,))},
                "v_proj": {"kernel": std * jax.random.normal(jax.random.fold_in(k_pool, 3), (feat, feat)), "bias": jnp.zeros((feat,))},
                "c_proj": {"kernel": std * jax.random.normal(jax.random.fold_in(k_pool, 4), (feat, embed_dim)), "bias": jnp.zeros((embed_dim,))},
            }
            prev = embed_dim
        # the reference builds the proj head even after abs_attn when
        # timm_proj is set (`timm_model.py:62-67` — its NOTE says proj
        # "should usually be ''" with attention pooling, but the code adds it)
        if proj == "linear":
            params["head"] = {"proj": _init_linear(k_h1, prev, embed_dim)}
        elif proj == "mlp":  # fc1 -> 2*embed, fc2 -> embed (`timm_model.py:66-67`)
            params["head"] = {
                "fc1": _init_linear(k_h1, prev, 2 * embed_dim),
                "fc2": _init_linear(k_h2, 2 * embed_dim, embed_dim),
            }
        return params

    def apply_fn(params: dict, images: jnp.ndarray) -> jnp.ndarray:
        if kind == "vit":
            p = dict(params["trunk"])
            x = _patchify(images, trunk_cfg.patch_size) @ p["patch_embed"]["kernel"]
            b = x.shape[0]
            cls = jnp.broadcast_to(p["class_embedding"], (b, 1, trunk_cfg.width))
            x = jnp.concatenate([cls, x], axis=1) + p["positional_embedding"]
            x = _apply_ln(p["ln_pre"], x)
            x = _blocks_apply(p["blocks"], x, trunk_cfg.quick_gelu)
            x = _apply_ln(p["ln_post"], x)
            feats = jnp.mean(x[:, 1:], axis=1) if pool == "avg" else x[:, 0]
        else:
            fmap = resnet_apply(params["trunk"], images, trunk_cfg, pool=False)
            if pool == "abs_attn":
                heads = trunk_cfg.width * 32 // 64
                feats = attention_pool_2d(params["pool"], fmap, heads)
            else:
                feats = jnp.mean(fmap, axis=(1, 2))
        head = params.get("head")
        if head is None:  # abs_attn with proj='' ends at the pool projection
            return feats
        if proj == "linear":
            return feats @ head["proj"]["kernel"] + head["proj"]["bias"]
        h = _gelu(feats @ head["fc1"]["kernel"] + head["fc1"]["bias"], False)
        return h @ head["fc2"]["kernel"] + head["fc2"]["bias"]

    return init_fn, apply_fn


def vision_freeze_mask(params: dict, unlocked_groups: int = 0) -> dict:
    """``lock()`` the JAX way: a boolean pytree (True = frozen) for
    ``optax.masked`` / zeroing grads. ``unlocked_groups`` leaves the last n
    transformer blocks (or ResNet stages) trainable, the adapter's
    group-unlock semantics (`timm_model.py:82-101`)."""
    tree = params.get("trunk", params)
    frozen = jax.tree.map(lambda _: True, params)
    if unlocked_groups:
        f_tree = frozen.get("trunk", frozen)
        if "blocks" in tree:
            for blk in f_tree["blocks"][-unlocked_groups:]:
                _set_tree(blk, False)
            _maybe_unfreeze(f_tree, ("ln_post", "proj"))
        else:
            stages = [k for k in sorted(tree) if k.startswith("layer")]
            for k in stages[-unlocked_groups:]:
                _set_tree(f_tree[k], False)
        if "head" in frozen:
            _set_tree(frozen["head"], False)
        if "pool" in frozen:
            _set_tree(frozen["pool"], False)
    return frozen


def _set_tree(tree, value):
    if isinstance(tree, dict):
        for k in tree:
            tree[k] = _set_tree(tree[k], value)
        return tree
    if isinstance(tree, list):
        for i in range(len(tree)):
            tree[i] = _set_tree(tree[i], value)
        return tree
    return value


def _maybe_unfreeze(tree, keys):
    for k in keys:
        if k in tree:
            # assign back: _set_tree mutates containers but RETURNS leaves
            tree[k] = _set_tree(tree[k], False)


