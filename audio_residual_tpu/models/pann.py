"""PANN CNN audio encoders (Cnn6 / Cnn10 / Cnn14) — TPU-native JAX.

Reference: `CLAP/src/laion_clap/clap_module/pann_model.py` (PANNs re-designed
for CLAP). Same frontend as HTSAT (torchlibrosa-semantics log-mel + bn0 over
mel bins), then a VGG-ish conv stack in NHWC:

  * Cnn6:  4 x ConvBlock5x5 (conv5x5 + BN + ReLU), fc1 512
  * Cnn10: 5 x ConvBlock (2 x conv3x3 + BN + ReLU), fc1 1024
  * Cnn14: 6 x ConvBlock, fc1 2048; supports 1-D/2-D/channel_map fusion

Output dict: ``clipwise_output`` (sigmoid), ``embedding`` (post-fc1 ReLU),
``fine_grained_embedding`` (frame-level latent, repeat-upsampled).
NHWC everywhere — convs map straight onto the MXU; eval-mode BN is a fused
scale/shift.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from audio_residual_tpu.ops import frontend, fusion as fusion_ops, interpolate
from audio_residual_tpu.ops.spec_augment import spec_augment

__all__ = ["PANNConfig", "init_pann_params", "pann_apply", "PANN_VARIANTS"]

PANN_VARIANTS = {
    "Cnn6": dict(channels=(64, 128, 256, 512), block="5x5", fc=512, interp=16),
    "Cnn10": dict(channels=(64, 128, 256, 512, 1024), block="3x3", fc=1024, interp=32),
    "Cnn14": dict(channels=(64, 128, 256, 512, 1024, 2048), block="3x3x2", fc=2048, interp=32),
}


@dataclass(frozen=True)
class PANNConfig:
    model_name: str = "Cnn14"
    sample_rate: int = 48000
    clip_samples: int = 480000
    n_fft: int = 1024
    hop_size: int = 480
    mel_bins: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    num_classes: int = 527
    enable_fusion: bool = False
    fusion_type: str = "None"
    dtype: Any = jnp.float32
    use_pallas_frontend: bool = True  # fused log-mel kernel off-CPU

    @property
    def variant(self) -> dict:
        return PANN_VARIANTS[self.model_name]

    @property
    def embed_dim(self) -> int:
        return self.variant["fc"]

    @property
    def frontend_config(self) -> frontend.FrontendConfig:
        return frontend.FrontendConfig(
            sample_rate=self.sample_rate, n_fft=self.n_fft, hop_length=self.hop_size,
            win_length=self.n_fft, n_mels=self.mel_bins, fmin=self.fmin, fmax=self.fmax,
        )


def _xavier_conv(key, kh, kw, cin, cout):
    lim = math.sqrt(6.0 / (kh * kw * (cin + cout)))
    return jax.random.uniform(key, (kh, kw, cin, cout), minval=-lim, maxval=lim)


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)), "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _linear_xavier(key, d_in, d_out):
    lim = math.sqrt(6.0 / (d_in + d_out))
    return {
        "kernel": jax.random.uniform(key, (d_in, d_out), minval=-lim, maxval=lim),
        "bias": jnp.zeros((d_out,)),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_pann_params(key: jax.Array, cfg: PANNConfig) -> dict:
    v = cfg.variant
    keys = iter(jax.random.split(key, 64))
    params: dict = {"bn0": _bn_init(cfg.mel_bins)}
    in_c = 1
    if cfg.enable_fusion and cfg.fusion_type == "channel_map":
        in_c = 4
    blocks = []
    for i, out_c in enumerate(v["channels"]):
        cin = in_c if i == 0 else v["channels"][i - 1]
        if v["block"] == "5x5":
            blk = {"conv1": {"kernel": _xavier_conv(next(keys), 5, 5, cin, out_c)}, "bn1": _bn_init(out_c)}
        else:
            blk = {
                "conv1": {"kernel": _xavier_conv(next(keys), 3, 3, cin, out_c)},
                "bn1": _bn_init(out_c),
                "conv2": {"kernel": _xavier_conv(next(keys), 3, 3, out_c, out_c)},
                "bn2": _bn_init(out_c),
            }
        blocks.append(blk)
    params["conv_blocks"] = blocks
    params["fc1"] = _linear_xavier(next(keys), v["fc"], v["fc"])
    params["fc_audioset"] = _linear_xavier(next(keys), v["fc"], cfg.num_classes)

    if cfg.enable_fusion and cfg.fusion_type in ("daf_1d", "aff_1d", "iaff_1d"):
        params["mel_conv1d"] = {
            "conv": {
                "kernel": _xavier_conv(next(keys), 5, 1, cfg.mel_bins, cfg.mel_bins)[:, 0],
                "bias": jnp.zeros((cfg.mel_bins,)),
            },
            "bn": _bn_init(cfg.mel_bins),
        }
        if cfg.fusion_type == "aff_1d":
            params["fusion_model"] = fusion_ops.init_aff_params(next(keys), cfg.mel_bins, kind="1D")
        elif cfg.fusion_type == "iaff_1d":
            params["fusion_model"] = fusion_ops.init_iaff_params(next(keys), cfg.mel_bins, kind="1D")
    if cfg.enable_fusion and cfg.fusion_type in ("daf_2d", "aff_2d", "iaff_2d"):
        params["mel_conv2d"] = {
            "conv": {"kernel": _xavier_conv(next(keys), 5, 5, 1, 64), "bias": jnp.zeros((64,))},
            "bn": _bn_init(64),
        }
        if cfg.fusion_type == "aff_2d":
            params["fusion_model"] = fusion_ops.init_aff_params(next(keys), 64, kind="2D")
        elif cfg.fusion_type == "iaff_2d":
            params["fusion_model"] = fusion_ops.init_iaff_params(next(keys), 64, kind="2D")
    return params


def _bn(p, x):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + 1e-5) * p["scale"] + p["bias"]


def _conv2d(kernel, x, stride=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _avg_pool(x, size):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, *size, 1), (1, *size, 1), "VALID"
    ) / float(np.prod(size))


def _max_pool(x, size, stride=None, padding="VALID"):
    stride = stride or size
    if isinstance(padding, (list, tuple)):
        padding = [(0, 0), *padding, (0, 0)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, *size, 1), (1, *stride, 1), padding
    )


def _conv_block(p, x, pool=(2, 2), pool_type="avg"):
    x = jax.nn.relu(_bn(p["bn1"], _conv2d(p["conv1"]["kernel"], x)))
    if "conv2" in p:
        x = jax.nn.relu(_bn(p["bn2"], _conv2d(p["conv2"]["kernel"], x)))
    if pool == (1, 1):
        return x
    if pool_type == "avg":
        return _avg_pool(x, pool)
    if pool_type == "max":
        return _max_pool(x, pool)
    return _avg_pool(x, pool) + _max_pool(x, pool)


def _dropout(x, rate, train, rng):
    if not train or rng is None or rate == 0:
        return x
    keep = 1 - rate
    return x * jax.random.bernoulli(rng, keep, x.shape) / keep


def _fuse_1d_pann(params, mel, longer, cfg: PANNConfig):
    b, _, t, f = mel.shape
    global_mel = mel[:, 0]
    local = mel[:, 1:].reshape(b * 3, t, f)
    mp = params["mel_conv1d"]
    ly = jax.lax.conv_general_dilated(
        local, mp["conv"]["kernel"].astype(mel.dtype), window_strides=(3,),
        padding=[(2, 2)], dimension_numbers=("NWC", "WIO", "NWC"),
    ) + mp["conv"]["bias"]
    ly = _bn(mp["bn"], ly)
    tp = ly.shape[1]
    ly = ly.reshape(b, 3 * tp, f)
    ly = jnp.pad(ly, ((0, 0), (0, max(t - 3 * tp, 0)), (0, 0)))[:, :t]
    if cfg.fusion_type == "daf_1d":
        fused = fusion_ops.daf(global_mel, ly)
    elif cfg.fusion_type == "aff_1d":
        fused = fusion_ops.aff(params["fusion_model"], global_mel, ly, kind="1D")
    else:
        fused = fusion_ops.iaff(params["fusion_model"], global_mel, ly, kind="1D")
    return jnp.where(longer[:, None, None], fused, global_mel) if longer is not None else fused


def pann_apply(
    params: dict,
    batch,
    cfg: PANNConfig,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
) -> dict:
    """Forward (`pann_model.py:223-330` Cnn14 and siblings).

    ``batch``: ``{"waveform": [B, T]}`` or raw array; fusion models take
    ``{"mel_fusion": [B, 4, T, F], "longer": [B]}``.
    """
    fused_input = isinstance(batch, dict) and "mel_fusion" in batch
    longer = batch.get("longer") if isinstance(batch, dict) else None
    v = cfg.variant

    if not fused_input:
        wav = batch["waveform"] if isinstance(batch, dict) else batch
        if cfg.use_pallas_frontend and jax.default_backend() not in ("cpu",):
            from audio_residual_tpu.ops.pallas import frontend as pallas_fe

            x = pallas_fe.fused_logmel(wav, cfg.frontend_config)  # [B, T, F]
        else:
            x = frontend.logmel(wav, cfg.frontend_config)  # [B, T, F]
        x, _ = frontend.batch_norm_mel(x, params["bn0"], train=False)
        x = x[..., None]  # NHWC, H=T W=F C=1
    else:
        mel, _ = frontend.batch_norm_mel(batch["mel_fusion"], params["bn0"], train=False)
        if cfg.fusion_type in ("daf_1d", "aff_1d", "iaff_1d"):
            x = _fuse_1d_pann(params, mel, longer, cfg)[..., None]
        else:  # 2d variants and channel_map keep all channels
            x = mel.transpose(0, 2, 3, 1)  # [B, T, F, 4]

    if train and rng is not None:
        rng, arng = jax.random.split(rng)
        x = spec_augment(arng, x.reshape(x.shape[0], x.shape[1], -1)).reshape(x.shape)

    fusion_2d = cfg.enable_fusion and cfg.fusion_type in ("daf_2d", "aff_2d", "iaff_2d")
    blocks = params["conv_blocks"]
    if fusion_2d:
        global_x = _conv_block(blocks[0], x[..., 0:1])  # pooled [B, T/2, F/2, 64]
        b = x.shape[0]
        th = global_x.shape[1]
        local = x[..., 1:].transpose(0, 3, 1, 2)[..., None].reshape(b * 3, x.shape[1], x.shape[2], 1)
        mp = params["mel_conv2d"]
        ly = _conv2d(mp["conv"]["kernel"], local, stride=(6, 2), padding=[(2, 2), (2, 2)]) + mp["conv"]["bias"]
        ly = jax.nn.relu(_bn(mp["bn"], ly))
        lh, lw = ly.shape[1], ly.shape[2]
        # [B, 3, lh, lw, 64] -> time-concat on H (`pann_model.py:289`)
        ly = ly.reshape(b, 3, lh, lw, 64).reshape(b, 3 * lh, lw, 64)
        ly = jnp.pad(ly, ((0, 0), (0, max(th - 3 * lh, 0)), (0, 0), (0, 0)))[:, :th]
        ly = ly[:, :, : global_x.shape[2]]
        if cfg.fusion_type == "daf_2d":
            fused = fusion_ops.daf(global_x, ly)
        elif cfg.fusion_type == "aff_2d":
            fused = fusion_ops.aff(params["fusion_model"], global_x, ly, kind="2D")
        else:
            fused = fusion_ops.iaff(params["fusion_model"], global_x, ly, kind="2D")
        x = jnp.where(longer[:, None, None, None], fused, global_x) if longer is not None else fused
        start = 1
    else:
        x = _conv_block(blocks[0], x)
        start = 1

    for i in range(start, len(blocks)):
        if rng is not None:
            rng, drng = jax.random.split(rng)
        else:
            drng = None
        x = _dropout(x, 0.2, train, drng)
        pool = (1, 1) if (cfg.model_name == "Cnn14" and i == len(blocks) - 1) else (2, 2)
        x = _conv_block(blocks[i], x, pool=pool)
    if rng is not None:
        rng, drng = jax.random.split(rng)
        x = _dropout(x, 0.2, train, drng)

    x = jnp.mean(x, axis=2)  # mean over mel axis -> [B, T', C]

    # latent path: max/avg pool1d (k3 s1 p1) over time
    lx = x[:, :, None, :]  # [B, T', 1, C]
    l1 = _max_pool(lx, (3, 1), stride=(1, 1), padding=[(1, 1), (0, 0)])[:, :, 0]
    l2 = jax.lax.reduce_window(
        lx, 0.0, jax.lax.add, (1, 3, 1, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (0, 0), (0, 0)]
    )[:, :, 0] / 3.0
    latent = jax.nn.relu((l1 + l2) @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    latent_output = interpolate.repeat_frames(latent, v["interp"])

    x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)  # [B, C]
    if rng is not None:
        rng, drng = jax.random.split(rng)
        x = _dropout(x, 0.5, train, drng)
    x = jax.nn.relu(x @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    embedding = _dropout(x, 0.5, train, rng)
    clipwise = jax.nn.sigmoid(x @ params["fc_audioset"]["kernel"] + params["fc_audioset"]["bias"])
    return {
        "clipwise_output": clipwise,
        "embedding": embedding,
        "fine_grained_embedding": latent_output,
    }
