"""audio-residual-tpu: TPU-native CLAP/HTSAT + ResiDual framework.

A from-scratch JAX (jit/pjit/Pallas) rebuild of the capabilities of
arianna011/Audio-ResiDual: CLAP dual-tower audio-text model with an HTSAT
Swin-transformer audio encoder exposing first-class representation taps,
device-side streaming PCA, ResiDual spectral reweighting as a fused epilogue,
zero-shot / linear-probe / retrieval evaluation, and data-parallel training
over TPU meshes.
"""

__version__ = "0.1.0"

from audio_residual_tpu.models.clap import (  # noqa: F401
    CLAPConfig,
    clap_apply,
    encode_audio,
    encode_text,
    init_clap_params,
)
from audio_residual_tpu.models.htsat import (  # noqa: F401
    HTSATConfig,
    htsat_apply,
    init_htsat_params,
)
from audio_residual_tpu.residual.module import (  # noqa: F401
    init_residual_params,
    load_residual_params,
    residual_apply,
    save_residual_params,
)
