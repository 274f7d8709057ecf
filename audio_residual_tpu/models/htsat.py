"""HTSAT (Hierarchical Token-Semantic Audio Transformer) — TPU-native JAX.

Functional re-design of the reference encoder
(`CLAP/src/laion_clap/clap_module/htsat.py:604-994`, itself a fork of
HTS-AT/Swin). Same behaviour, different architecture:

  * pure functions over a params pytree — no modules, no hooks, no
    monkey-patching; the whole forward jits into one XLA program;
  * representation taps (per-layer attention maps / post-attention residual
    streams) are *first-class outputs* selected by a static ``taps`` tuple —
    this replaces the fork's modified return signatures (`htsat.py:357,482,
    596,830-831`) and the ``patch_block_with_residual`` monkey-patch
    (`src/residual.py:45-100`);
  * ResiDual spectral reweighting is a functional epilogue on the
    post-attention residual, enabled per layer by passing ``residual`` params
    (see :mod:`audio_residual_tpu.residual.module`);
  * the DSP frontend (STFT/mel/dB) is matmul-formulated for the MXU
    (:mod:`audio_residual_tpu.ops.frontend`), all masks / bias indices /
    resize matrices are static constants.

Shapes for HTSAT-tiny on a 10 s / 48 kHz clip: wav [B, 480000] -> logmel
[B, 1001, 64] -> image [B, 256, 256, 1] -> tokens 4096@96 -> 1024@192 ->
256@384 -> 64@768 -> embedding [B, 768].
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from audio_residual_tpu.ops import frontend, fusion as fusion_ops, interpolate, windows
from audio_residual_tpu.ops.spec_augment import spec_augment

__all__ = ["HTSATConfig", "init_htsat_params", "htsat_apply", "HTSAT_VARIANTS"]


@dataclass(frozen=True)
class HTSATConfig:
    """Static architecture + DSP config (HTSAT-tiny defaults, matching
    `model_configs/HTSAT-tiny.json` + `create_htsat_model` `htsat.py:996-1013`)."""

    spec_size: int = 256
    patch_size: int = 4
    patch_stride: tuple[int, int] = (4, 4)
    in_chans: int = 1
    num_classes: int = 527
    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    # audio cfg (`HTSAT-tiny.json`)
    sample_rate: int = 48000
    clip_samples: int = 480000
    mel_bins: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    n_fft: int = 1024
    hop_size: int = 480
    enable_fusion: bool = False
    fusion_type: str = "None"
    # numerics
    dtype: Any = jnp.float32
    # fused Pallas W-MSA kernel (TPU only; auto-falls back when attention
    # taps are requested or the per-image block exceeds VMEM)
    use_pallas_attention: bool = True
    # fully-fused block kernel (attention + MLP + optional ResiDual epilogue
    # in one VMEM-resident program); needs no taps and eval-mode drop_path
    use_pallas_block: bool = True
    # fused DFT+power+mel+log frontend kernel (never materialises the
    # [frames, 513] power spectrogram in HBM)
    use_pallas_frontend: bool = True
    # DFT matmul precision override (None = auto: "bf16x3" under bf16 AMP,
    # f32-exact otherwise; "bf16" = single-pass, ~3x fewer frontend MXU
    # passes at ~0.4% relative Re/Im error — gate behind an accuracy check)
    dft_mode: str | None = None

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.mel_bins  # 4 for tiny

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    @property
    def patches_resolution(self) -> tuple[int, int]:
        g = self.spec_size // self.patch_stride[0]
        return (g, g)

    def layer_resolution(self, i: int) -> tuple[int, int]:
        g = self.patches_resolution
        return (g[0] // (2**i), g[1] // (2**i))

    def layer_dim(self, i: int) -> int:
        return int(self.embed_dim * 2**i)

    @property
    def frontend_config(self) -> frontend.FrontendConfig:
        return frontend.FrontendConfig(
            sample_rate=self.sample_rate,
            n_fft=self.n_fft,
            hop_length=self.hop_size,
            win_length=self.n_fft,
            n_mels=self.mel_bins,
            fmin=self.fmin,
            fmax=self.fmax,
        )

    @property
    def tscam_sf(self) -> int:
        return (
            self.spec_size // (2 ** (self.num_layers - 1)) // self.patch_stride[0] // self.freq_ratio
        )


HTSAT_VARIANTS = {
    # `create_htsat_model` htsat.py:996-1045
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(4, 8, 16, 32)),
    "base": dict(embed_dim=128, depths=(2, 2, 12, 2), num_heads=(4, 8, 16, 32)),
    "large": dict(embed_dim=256, depths=(2, 2, 12, 2), num_heads=(4, 8, 16, 32)),
}


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def _linear(key, d_in, d_out, std=0.02, bias=True):
    p = {"kernel": _trunc_normal(key, (d_in, d_out), std)}
    if bias:
        p["bias"] = jnp.zeros((d_out,))
    return p


def _layer_norm(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_htsat_params(key: jax.Array, cfg: HTSATConfig) -> dict:
    """Fresh parameter pytree (trunc-normal linears, unit LN — `htsat.py:761-768`).

    Jitted: eager per-tensor RNG dispatch costs ~0.5 s/op through a remote
    device tunnel; one fused program initialises everything."""
    keys = iter(jax.random.split(key, 512))
    params: dict = {}

    params["bn0"] = {
        "scale": jnp.ones((cfg.mel_bins,)),
        "bias": jnp.zeros((cfg.mel_bins,)),
        "mean": jnp.zeros((cfg.mel_bins,)),
        "var": jnp.ones((cfg.mel_bins,)),
    }

    # patch embed: conv K=4 S=4; kernel layout HWIO
    # channel_map fusion stacks the 4 mel channels into the conv input
    # (`htsat.py:94-97`)
    in_ch = cfg.in_chans * (
        4 if cfg.enable_fusion and cfg.fusion_type == "channel_map" else 1
    )
    fan_in = in_ch * cfg.patch_size * cfg.patch_size
    params["patch_embed"] = {
        "proj": {
            "kernel": jax.random.uniform(
                next(keys),
                (cfg.patch_size, cfg.patch_size, in_ch, cfg.embed_dim),
                minval=-1.0, maxval=1.0,
            ) * math.sqrt(1.0 / fan_in),
            "bias": jnp.zeros((cfg.embed_dim,)),
        },
        "norm": _layer_norm(cfg.embed_dim) if cfg.patch_norm else None,
    }

    layers = []
    for i in range(cfg.num_layers):
        dim = cfg.layer_dim(i)
        nh = cfg.num_heads[i]
        blocks = []
        for _ in range(cfg.depths[i]):
            hidden = int(dim * cfg.mlp_ratio)
            blocks.append(
                {
                    "norm1": _layer_norm(dim),
                    "attn": {
                        "qkv": _linear(next(keys), dim, 3 * dim, bias=cfg.qkv_bias),
                        "proj": _linear(next(keys), dim, dim),
                        "rel_bias_table": _trunc_normal(
                            next(keys), ((2 * cfg.window_size - 1) ** 2, nh), std=0.02
                        ),
                    },
                    "norm2": _layer_norm(dim),
                    "mlp": {
                        "fc1": _linear(next(keys), dim, hidden),
                        "fc2": _linear(next(keys), hidden, dim),
                    },
                }
            )
        layer = {"blocks": blocks}
        if i < cfg.num_layers - 1:
            layer["downsample"] = {
                "norm": _layer_norm(4 * dim),
                "reduction": _linear(next(keys), 4 * dim, 2 * dim, bias=False),
            }
        layers.append(layer)
    params["layers"] = layers

    params["norm"] = _layer_norm(cfg.num_features)
    # tscam conv: kernel (SF, 3) over [B, SF, T, C]; layout HWIO
    fan_in = cfg.num_features * cfg.tscam_sf * 3
    params["tscam_conv"] = {
        "kernel": jax.random.uniform(
            next(keys), (cfg.tscam_sf, 3, cfg.num_features, cfg.num_classes),
            minval=-1.0, maxval=1.0,
        ) * math.sqrt(1.0 / fan_in),
        "bias": jnp.zeros((cfg.num_classes,)),
    }
    params["head"] = _linear(next(keys), cfg.num_classes, cfg.num_classes)

    if cfg.enable_fusion and cfg.fusion_type in ("daf_1d", "aff_1d", "iaff_1d"):
        # mel_conv1d: Conv1d(64, 64, k=5, s=3, p=2) + BN (`htsat.py:747-751`)
        fan_in = cfg.mel_bins * 5
        params["mel_conv1d"] = {
            "conv": {
                "kernel": jax.random.uniform(
                    next(keys), (5, cfg.mel_bins, cfg.mel_bins), minval=-1.0, maxval=1.0
                ) * math.sqrt(1.0 / fan_in),
                "bias": jnp.zeros((cfg.mel_bins,)),
            },
            "bn": {
                "scale": jnp.ones((cfg.mel_bins,)), "bias": jnp.zeros((cfg.mel_bins,)),
                "mean": jnp.zeros((cfg.mel_bins,)), "var": jnp.ones((cfg.mel_bins,)),
            },
        }
        if cfg.fusion_type == "aff_1d":
            params["fusion_model"] = fusion_ops.init_aff_params(next(keys), cfg.mel_bins, kind="1D")
        elif cfg.fusion_type == "iaff_1d":
            params["fusion_model"] = fusion_ops.init_iaff_params(next(keys), cfg.mel_bins, kind="1D")
    if cfg.enable_fusion and cfg.fusion_type in ("daf_2d", "aff_2d", "iaff_2d"):
        # mel_conv2d inside PatchEmbed: kernel (P, 3P), stride (S, 3S)
        # (`htsat.py:101`)
        ks = (cfg.patch_size, cfg.patch_size * 3)
        fan_in = cfg.in_chans * ks[0] * ks[1]
        params["patch_embed"]["mel_conv2d"] = {
            "kernel": jax.random.uniform(
                next(keys), (*ks, cfg.in_chans, cfg.embed_dim), minval=-1.0, maxval=1.0
            ) * math.sqrt(1.0 / fan_in),
            "bias": jnp.zeros((cfg.embed_dim,)),
        }
        if cfg.fusion_type == "aff_2d":
            params["patch_embed"]["fusion_model"] = fusion_ops.init_aff_params(
                next(keys), cfg.embed_dim, kind="2D"
            )
        elif cfg.fusion_type == "iaff_2d":
            params["patch_embed"]["fusion_model"] = fusion_ops.init_iaff_params(
                next(keys), cfg.embed_dim, kind="2D"
            )
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _apply_ln(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _apply_linear(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _mlp(p, x):
    return _apply_linear(p["fc2"], jax.nn.gelu(_apply_linear(p["fc1"], x), approximate=False))


def _drop_path(x, rate, train, rng):
    """Stochastic depth per sample (`htsat.py:43-58`)."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
    return x / keep * mask


def window_attention(p, x, nh, window, mask=None, compute_dtype=None):
    """W-MSA with relative position bias (`htsat.py:326-357`).

    x: [B_, N, C] windows; returns (out [B_, N, C], probs [B_, nH, N, N]).
    """
    b_, n, c = x.shape
    hd = c // nh
    scale = hd**-0.5
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    qkv = _apply_linear(
        {k: v.astype(x.dtype) for k, v in p["qkv"].items()}, x
    ).reshape(b_, n, 3, nh, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3) * scale
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = attn + windows.gather_relative_bias(p["rel_bias_table"], window, window)[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
        attn = attn.reshape(b_, nh, n, n)
    probs = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
    out = _apply_linear({k_: v_.astype(out.dtype) for k_, v_ in p["proj"].items()}, out)
    return out.astype(in_dtype), probs


def swin_block(
    p,
    x,
    *,
    resolution,
    nh,
    window,
    shift,
    drop_path_rate=0.0,
    train=False,
    rng=None,
    residual_fn=None,
    residual_params=None,
    double_ffn_compat=True,
    compute_dtype=None,
    use_pallas=False,
    use_pallas_block=False,
):
    """One Swin block (`htsat.py:439-482`), with the ResiDual epilogue folded in.

    Returns ``(x, attn_probs, residual_x)`` where ``residual_x`` is the tapped
    post-attention residual (after ResiDual when injected — matching the
    patched forward `src/residual.py:88-98`).

    ``double_ffn_compat`` reproduces the reference's patched-forward quirk
    (`src/residual.py:92-96`): when a ResiDual is injected, the shortcut+MLP
    is applied *twice*. The published ResiDual accuracy (0.8685, PDF Table 1)
    was produced by that forward, so it is the default when ``residual_fn``
    is given; pass ``False`` for the clean single-FFN semantics.
    """
    h, w = resolution
    b, n, c = x.shape
    if min(h, w) <= window:
        shift = 0
        window = min(h, w)

    on_accel = jax.default_backend() not in ("cpu",)
    if (
        use_pallas_block
        and on_accel
        and not (train and drop_path_rate > 0.0)
    ):
        from audio_residual_tpu.ops.pallas import swin_block as fsb

        nw_img = (h // window) * (w // window)
        hidden = p["mlp"]["fc1"]["kernel"].shape[1]
        k_res = residual_params["basis"].shape[0] if residual_params is not None else 0
        if fsb.block_supports(nw_img, window * window, c, nh, hidden, k_res):
            y = x.reshape(b, h, w, c)
            if shift > 0:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            wins = windows.window_partition(y, window)
            flat = (
                p["norm1"]["scale"], p["norm1"]["bias"],
                p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
                p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"],
                p["norm2"]["scale"], p["norm2"]["bias"],
                p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
                p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
                p["attn"]["rel_bias_table"],
            )
            if residual_params is not None:
                flat = flat + (
                    residual_params["basis"], residual_params["mean"], residual_params["lam"],
                )
            out_wins = fsb.fused_swin_block(
                wins, flat, nh, window, nw_img, shift, (h, w),
                residual_params is not None, double_ffn_compat, compute_dtype,
            ).astype(x.dtype)
            y = windows.window_reverse(out_wins, window, h, w)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            return y.reshape(b, n, c), None, None

    shortcut = x
    y = _apply_ln(p["norm1"], x).reshape(b, h, w, c)
    if shift > 0:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    wins = windows.window_partition(y, window)

    probs = None
    if use_pallas and jax.default_backend() not in ("cpu",):
        from audio_residual_tpu.ops.pallas import window_attention as fwa

        nw_img = (h // window) * (w // window)
        if fwa.supports(nw_img, window * window, c, nh):
            attn_out = fwa.fused_window_attention(
                wins,
                p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
                p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"],
                p["attn"]["rel_bias_table"],
                nh, window, nw_img, shift, (h, w), compute_dtype,
            ).astype(wins.dtype)
        else:
            use_pallas = False
    if probs is None and not (use_pallas and jax.default_backend() not in ("cpu",)):
        mask = (
            jnp.asarray(windows.shift_window_mask(h, w, window, shift)) if shift > 0 else None
        )
        attn_out, probs = window_attention(
            p["attn"], wins, nh, window, mask, compute_dtype=compute_dtype
        )
    y = windows.window_reverse(attn_out, window, h, w)
    if shift > 0:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    y = y.reshape(b, n, c)

    rng1 = rng2 = None
    if rng is not None:
        rng1, rng2 = jax.random.split(rng)
    residual_x = _drop_path(y, drop_path_rate, train, rng1)
    if residual_fn is not None:
        residual_x = residual_fn(residual_x)

    x = shortcut + residual_x
    x = x + _drop_path(_mlp(p["mlp"], _apply_ln(p["norm2"], x)), drop_path_rate, train, rng2)
    if residual_fn is not None and double_ffn_compat:
        # reference patched-forward quirk (src/residual.py:95-96)
        x = shortcut + _drop_path(x, drop_path_rate, train, rng2)
        x = x + _drop_path(_mlp(p["mlp"], _apply_ln(p["norm2"], x)), drop_path_rate, train, rng2)
    return x, probs, residual_x


def _patch_merge(p, x, resolution):
    """PatchMerging (`htsat.py:505-526`): 2x2 neighbourhood concat -> LN -> linear."""
    h, w = resolution
    b, n, c = x.shape
    x = x.reshape(b, h, w, c)
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
    )
    x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
    return _apply_linear(p["reduction"], _apply_ln(p["norm"], x))


def reshape_wav2img(x: jnp.ndarray, cfg: HTSATConfig) -> jnp.ndarray:
    """Log-mel [B, T, F] -> Swin image [B, spec_size, spec_size, 1].

    Matches `htsat.py:848-863`: bicubic align_corners=True stretch of T to
    ``spec_size * freq_ratio``, then fold time into ``freq_ratio`` chunks
    stacked along the frequency ("height") axis, chunk-major.
    """
    b = x.shape[0]
    target_t = cfg.spec_size * cfg.freq_ratio
    target_f = cfg.spec_size // cfg.freq_ratio
    # resize (T, F) plane
    x = interpolate.resize_bicubic_align_corners(x, target_t, target_f)
    # [B, T, F] -> [B, F, T] -> split T into (freq_ratio, T/freq_ratio)
    x = x.transpose(0, 2, 1)
    x = x.reshape(b, target_f, cfg.freq_ratio, target_t // cfg.freq_ratio)
    x = x.transpose(0, 2, 1, 3)  # [B, ratio, F, T']
    x = x.reshape(b, cfg.freq_ratio * target_f, target_t // cfg.freq_ratio)
    return x[..., None]  # NHWC, H = chunk-major freq axis, W = time


def _proj_conv(p, x, cfg: HTSATConfig):
    ph, pw = cfg.patch_stride
    if cfg.patch_size == ph == pw and x.shape[1] % ph == 0 and x.shape[2] % pw == 0:
        # non-overlapping patches (every shipped HTSAT config): the conv is
        # exactly a reshape + one GEMM. XLA's conv lowering at C_in=1/K=16
        # measured 6.9 us/clip vs 1.4 for the GEMM form (B=128, v5e).
        b, h, w, cin = x.shape
        patches = (
            x.reshape(b, h // ph, ph, w // pw, pw, cin)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b * (h // ph) * (w // pw), ph * pw * cin)
        )
        kernel = p["kernel"].reshape(ph * pw * cin, -1).astype(x.dtype)
        y = patches @ kernel + p["bias"]
        return y.reshape(b, h // ph, w // pw, -1)
    return jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=cfg.patch_stride,
        padding=[
            ((cfg.patch_size - cfg.patch_stride[0]) // 2,) * 2,
            ((cfg.patch_size - cfg.patch_stride[1]) // 2,) * 2,
        ],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]


def _patch_embed(p, x, cfg: HTSATConfig, longer=None):
    """Conv patch embedding (`htsat.py:108-144`): 4x4/4 conv -> [B, N, C] -> LN.

    With 2-D fusion (`htsat.py:100-134`): channel 0 is the global mel, channels
    1:4 are local chunks run through ``mel_conv2d`` (kernel (P, 3P), stride
    (S, 3S)), time-concatenated, and fused into the global patches via
    DAF/AFF/iAFF where ``longer`` is set (masked select — static shapes).
    """
    fusion_2d = cfg.enable_fusion and cfg.fusion_type in ("daf_2d", "aff_2d", "iaff_2d")
    if not fusion_2d:
        y = _proj_conv(p["proj"], x, cfg)
    else:
        b = x.shape[0]
        global_y = _proj_conv(p["proj"], x[..., 0:1], cfg)  # [B, H', W', C]
        _, hh, ww, cc = global_y.shape
        local = x[..., 1:]  # [B, H, W, 3]
        local = local.transpose(0, 3, 1, 2).reshape(b * 3, *x.shape[1:3], 1)
        ly = jax.lax.conv_general_dilated(
            local,
            p["mel_conv2d"]["kernel"].astype(x.dtype),
            window_strides=(cfg.patch_stride[0], cfg.patch_stride[1] * 3),
            padding=[
                ((cfg.patch_size - cfg.patch_stride[0]) // 2,) * 2,
                ((cfg.patch_size - cfg.patch_stride[1]) // 2,) * 2,
            ],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["mel_conv2d"]["bias"]
        _, lh, lw, lc = ly.shape
        # [B, 3, lh, lw, C] -> chunk-concat along width (`htsat.py:126`)
        ly = ly.reshape(b, 3, lh, lw, lc).transpose(0, 2, 1, 3, 4).reshape(b, lh, 3 * lw, lc)
        if 3 * lw < ww:
            ly = jnp.pad(ly, ((0, 0), (0, 0), (0, ww - 3 * lw), (0, 0)))
        else:
            ly = ly[:, :, :ww]
        if cfg.fusion_type == "daf_2d":
            fused = fusion_ops.daf(global_y, ly)
        elif cfg.fusion_type == "aff_2d":
            fused = fusion_ops.aff(p["fusion_model"], global_y, ly, kind="2D")
        else:
            fused = fusion_ops.iaff(p["fusion_model"], global_y, ly, kind="2D")
        if longer is None:
            y = fused
        else:
            y = jnp.where(longer[:, None, None, None], fused, global_y)
    b, h, w, c = y.shape
    y = y.reshape(b, h * w, c)
    if p["norm"] is not None:
        y = _apply_ln(p["norm"], y)
    return y


def _fuse_1d(params, mel, longer, cfg: HTSATConfig):
    """1-D mel fusion before patch embed (`htsat.py:918-938`): local chunks
    through Conv1d(64, 64, k5, s3, p2)+BN, time-concatenated, padded to T,
    fused into the global mel along the mel-bin channel axis."""
    b, _, t, f = mel.shape
    global_mel = mel[:, 0]  # [B, T, F]
    local = mel[:, 1:].reshape(b * 3, t, f)  # NWC: W=T, C=F
    mp = params["mel_conv1d"]
    ly = jax.lax.conv_general_dilated(
        local, mp["conv"]["kernel"].astype(mel.dtype), window_strides=(3,),
        padding=[(2, 2)], dimension_numbers=("NWC", "WIO", "NWC"),
    ) + mp["conv"]["bias"]
    bn = mp["bn"]
    ly = (ly - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5) * bn["scale"] + bn["bias"]
    tp = ly.shape[1]
    ly = ly.reshape(b, 3, tp, f).reshape(b, 3 * tp, f)  # chunk-concat on time
    if 3 * tp < t:
        ly = jnp.pad(ly, ((0, 0), (0, t - 3 * tp), (0, 0)))
    else:
        ly = ly[:, :t]
    if cfg.fusion_type == "daf_1d":
        fused = fusion_ops.daf(global_mel, ly)
    elif cfg.fusion_type == "aff_1d":
        fused = fusion_ops.aff(params["fusion_model"], global_mel, ly, kind="1D")
    else:
        fused = fusion_ops.iaff(params["fusion_model"], global_mel, ly, kind="1D")
    if longer is not None:
        fused = jnp.where(longer[:, None, None], fused, global_mel)
    # dtype-following: the f32 biases/BN stats above promote ly (and the
    # fusion ops' outputs) to f32 — cast back so an AMP (bf16) input keeps
    # the downstream bicubic stretch + patch embed on the bf16 MXU path;
    # the fusion internals deliberately stay f32
    return fused.astype(mel.dtype)


def htsat_apply(
    params: dict,
    batch: dict | jnp.ndarray,
    cfg: HTSATConfig,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    taps: tuple[str, ...] = (),
    residual: dict | None = None,
    double_ffn_compat: bool = True,
    compute_dtype: Any = None,
    start_layer: int = 0,
    stop_at_layer: int | None = None,
    stop_at_image: bool = False,
) -> dict:
    """Full HTSAT forward (`htsat.py:779-834,881-994`).

    Split execution for frozen-prefix caching (ResiDual λ training re-runs
    the frozen encoder every epoch in the reference — SURVEY.md hard part
    #6): ``stop_at_layer=l`` runs frontend+patch_embed+layers[:l] and returns
    ``{"tokens": x}``; ``start_layer=l`` takes ``batch={"tokens": x}`` and
    resumes at layer ``l``. ``stop_at_image=True`` stops earlier, right after
    ``reshape_wav2img`` (non-fusion only) and returns ``{"image": [B,H,W,1]}``
    — at full size 65k floats/clip vs the 480k-sample waveform (7.3x fewer
    bytes), which makes caching pay even when layer 0 itself is injected
    (the reference's published best config, PDF Table 1): every epoch skips
    the frontend + bicubic but keeps all token-level compute live. Resume
    with ``batch={"image": ...}`` (runs patch_embed + all layers).

    Args:
      batch: ``{"waveform": [B, T]}`` (non-fusion) or a raw ``[B, T]`` array;
        fusion inputs pass ``{"mel_fusion": [B, 4, T, F], "longer": [B]}``.
      taps: any of ``"attention"`` (per-layer block-averaged attention probs,
        eval-time semantics of `htsat.py:589-595`) and ``"residual"``
        (per-layer block-concatenated post-attention residuals,
        `htsat.py:596`). Static — untapped tensors are never materialised.
      residual: ``{layer_idx: {"basis": [K, D], "mean": [D], "lam": [K]}}``
        ResiDual params; applied in every block of the layer (shared unit,
        `src/residual.py:203-205`).
      compute_dtype: e.g. ``jnp.bfloat16`` to run attention/MLP matmuls in
        bf16 on the MXU (frontend + softmax stay f32).

    Returns the output dict of `htsat.py:825-832` (plus tapped lists).
    """
    from audio_residual_tpu.residual.module import residual_apply

    if isinstance(batch, dict) and ("tokens" in batch or "image" in batch):
        if stop_at_image:
            raise ValueError("stop_at_image needs a waveform input")
        if "image" in batch:
            if start_layer != 0:
                raise ValueError("image input always resumes at layer 0")
            x = batch["image"]
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
            frames_num = x.shape[1]
            x = _patch_embed(params["patch_embed"], x, cfg, longer=None)
        else:
            x = batch["tokens"]
            frames_num = cfg.spec_size
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        return _htsat_layers_and_head(
            params, x, cfg, frames_num,
            train=train, rng=rng, taps=taps, residual=residual,
            double_ffn_compat=double_ffn_compat, compute_dtype=compute_dtype,
            start_layer=start_layer if "tokens" in batch else 0,
            stop_at_layer=stop_at_layer,
            residual_apply=residual_apply,
        )

    fused_input = isinstance(batch, dict) and "mel_fusion" in batch
    longer = batch.get("longer") if isinstance(batch, dict) else None

    if not fused_input:
        wav = batch["waveform"] if isinstance(batch, dict) else batch
        fcfg = cfg.frontend_config
        if cfg.use_pallas_frontend and jax.default_backend() not in ("cpu",):
            from audio_residual_tpu.ops.pallas import frontend as pallas_fe

            # bf16 AMP mode extends to the DFT: single-pass bf16 (~0.4%
            # relative Re/Im, ~0.05 dB post-log — washed out by the bn0 mel
            # normalisation: measured min embedding cos 0.999994 vs the
            # pure-f32 path and 100% zero-shot argmax agreement, enforced
            # every bench run by the accuracy guard). cfg.dft_mode
            # overrides: "bf16x3" = 3-pass split-pair (~3e-3 dB), "f32" =
            # exact 6-pass.
            dft = cfg.dft_mode or (
                "bf16" if compute_dtype == jnp.bfloat16 else None
            )
            x = pallas_fe.fused_logmel(wav, fcfg, dft_mode=dft)  # [B, T, F]
        else:
            x = frontend.logmel(wav, fcfg)  # [B, T, F]
        x, bn0_state = frontend.batch_norm_mel(x, params["bn0"], train=train)
        if train and rng is not None:
            rng, arng = jax.random.split(rng)
            x = spec_augment(arng, x)
        if compute_dtype is not None:
            # AMP from the bn0 output on: the bicubic stretch (a matmul) and
            # the patch-embed GEMM run on the MXU in bf16 and the fold
            # transposes move half the bytes — torch autocast covers the
            # same ops. Measured ~0.4% elementwise, washed out like the
            # bf16 DFT (bench accuracy guard: cos 0.99999+, argmax 100%).
            x = x.astype(compute_dtype)
        x = reshape_wav2img(x, cfg)  # [B, H, W, 1]
        if stop_at_image:
            # in the dtype the path produced it: f32 golden, or bf16 under
            # AMP (where the uncached AMP path also has a bf16 image here —
            # resuming from this cache is bit-identical either way)
            return {"image": x}
    else:
        if stop_at_image:
            raise ValueError("stop_at_image supports non-fusion waveforms only")
        mel = batch["mel_fusion"]  # [B, 4, T, F]
        mel, bn0_state = frontend.batch_norm_mel(mel, params["bn0"], train=False)
        if compute_dtype is not None:
            # same AMP boundary as the non-fusion path. The fusion convs'
            # GEMMs take bf16 operands; the fusion-attention internals stay
            # f32 (their f32 biases/BN promote — _fuse_1d casts back on
            # return), and the bicubic stretch + patch embed run bf16.
            mel = mel.astype(compute_dtype)
        if cfg.enable_fusion and cfg.fusion_type in ("daf_1d", "aff_1d", "iaff_1d"):
            x1d = _fuse_1d(params, mel, longer, cfg)  # [B, T, F]
            if train and rng is not None:
                rng, arng = jax.random.split(rng)
                x1d = spec_augment(arng, x1d)
            x = reshape_wav2img(x1d, cfg)
        elif cfg.enable_fusion and cfg.fusion_type in (
            "daf_2d", "aff_2d", "iaff_2d", "channel_map",
        ):
            if train and rng is not None:
                rng, arng = jax.random.split(rng)
                mel = spec_augment(arng, mel.reshape(-1, *mel.shape[2:])).reshape(mel.shape)
            # all 4 channels to the image plane (`htsat.py:948`)
            b, c, t, f = mel.shape
            x = reshape_wav2img(mel.reshape(b * c, t, f), cfg)  # [B*4, H, W, 1]
            x = x[..., 0].reshape(b, c, *x.shape[1:3]).transpose(0, 2, 3, 1)  # NHWC, C=4
        else:
            # non-fusion model given fusion input: use the global channel
            x = reshape_wav2img(mel[:, 0], cfg)

    frames_num = x.shape[1]
    x = _patch_embed(params["patch_embed"], x, cfg, longer=longer)

    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    bn_state = bn0_state if (train and not fused_input) else None
    return _htsat_layers_and_head(
        params, x, cfg, frames_num,
        train=train, rng=rng, taps=taps, residual=residual,
        double_ffn_compat=double_ffn_compat, compute_dtype=compute_dtype,
        start_layer=0, stop_at_layer=stop_at_layer,
        residual_apply=residual_apply, bn0_state=bn_state,
    )


def _htsat_layers_and_head(
    params, x, cfg, frames_num, *, train, rng, taps, residual,
    double_ffn_compat, compute_dtype, start_layer, stop_at_layer,
    residual_apply, bn0_state=None,
):

    dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.depths))
    tap_attn, tap_res = [], []
    end_layer = stop_at_layer if stop_at_layer is not None else cfg.num_layers
    blk_idx = sum(cfg.depths[:start_layer])
    for i in range(start_layer, end_layer):
        layer_p = params["layers"][i]
        res_i = None
        if residual is not None and i in residual:
            r = residual[i]
            res_i = lambda t, r=r: residual_apply(t, r["basis"], r["mean"], r["lam"])
        resolution = cfg.layer_resolution(i)
        layer_attns, layer_residuals = [], []
        for j, blk_p in enumerate(layer_p["blocks"]):
            brng = None
            if rng is not None:
                rng, brng = jax.random.split(rng)
            x, probs, res_x = swin_block(
                blk_p,
                x,
                resolution=resolution,
                nh=cfg.num_heads[i],
                window=cfg.window_size,
                shift=0 if j % 2 == 0 else cfg.window_size // 2,
                drop_path_rate=float(dpr[blk_idx]),
                train=train,
                rng=brng,
                residual_fn=res_i,
                residual_params=(residual.get(i) if residual is not None else None),
                double_ffn_compat=double_ffn_compat,
                compute_dtype=compute_dtype,
                use_pallas=cfg.use_pallas_attention and "attention" not in taps,
                use_pallas_block=(
                    cfg.use_pallas_block and not taps
                ),
            )
            blk_idx += 1
            if "attention" in taps:
                layer_attns.append(probs)
            if "residual" in taps:
                layer_residuals.append(res_x)
        if "downsample" in layer_p:
            x = _patch_merge(layer_p["downsample"], x, resolution)
        if "attention" in taps:
            tap_attn.append(jnp.mean(jnp.stack(layer_attns), axis=0))
        if "residual" in taps:
            tap_res.append(jnp.concatenate(layer_residuals, axis=1))

    if stop_at_layer is not None:
        return {"tokens": x}

    x = x.astype(jnp.float32)
    x = _apply_ln(params["norm"], x)
    b, n, c = x.shape
    nl = cfg.num_layers
    sf = frames_num // (2 ** (nl - 1)) // cfg.patch_stride[0]
    st = frames_num // (2 ** (nl - 1)) // cfg.patch_stride[1]
    # tokens are a (SF, ST) grid row-major; keep NHWC-ish [B, SF, ST, C]
    x = x.reshape(b, sf, st, c)
    c_freq_bin = sf // cfg.freq_ratio
    # regroup the chunk-folded frequency axis back into (freq, time):
    # [B, ratio, c_freq, ST, C] -> [B, c_freq, ratio*ST, C]
    x = x.reshape(b, cfg.freq_ratio, c_freq_bin, st, c)
    x = x.transpose(0, 2, 1, 3, 4).reshape(b, c_freq_bin, cfg.freq_ratio * st, c)

    fine_grained = jnp.mean(x, axis=1)  # [B, T', C]
    fine_grained = interpolate.repeat_frames(fine_grained, 8 * cfg.patch_stride[1])

    latent = jnp.mean(x, axis=(1, 2))  # [B, C] == avgpool over (freq, time)

    # tscam conv: (SF, 3) kernel, padding (0, 1)  (`htsat.py:739-744,816`)
    logits_map = jax.lax.conv_general_dilated(
        x,
        params["tscam_conv"]["kernel"],
        window_strides=(1, 1),
        padding=[(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["tscam_conv"]["bias"]  # [B, 1, T', num_classes]
    logits_map = logits_map[:, 0]  # [B, T', num_classes]

    fpx = interpolate.repeat_frames(jax.nn.sigmoid(logits_map), 8 * cfg.patch_stride[1])
    clip_logits = jnp.mean(logits_map, axis=1)  # [B, num_classes]

    out = {
        "framewise_output": fpx,
        "clipwise_output": jax.nn.sigmoid(clip_logits),
        "fine_grained_embedding": fine_grained,
        "embedding": latent,
    }
    if train and bn0_state is not None:
        # updated BN running stats for the train step to merge back into
        # params (BatchNorm over the global batch under pjit == SyncBN,
        # covering `main.py:269`)
        out["bn0_state"] = bn0_state
    if "attention" in taps:
        out["layers_attention"] = tap_attn
    if "residual" in taps:
        out["layers_residuals"] = tap_res
    return out
