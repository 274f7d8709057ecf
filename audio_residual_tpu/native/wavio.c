/* Native host-side audio decode kernels for the data loader.
 *
 * The reference reaches its decode path through torchaudio/librosa C
 * libraries (SURVEY.md §2.6); this is the framework's own native layer:
 * PCM16/PCM32/float32 WAV frame decode with mono downmix, and the int16
 * round-trip quantisation applied on every eval path
 * (`src/residual.py:210-212`). Called from Python via ctypes
 * (audio_residual_tpu/native/__init__.py); built with plain gcc -O3.
 */

#include <stdint.h>
#include <stddef.h>

/* interleaved int16 frames -> mono float32; returns n_frames */
long wav_pcm16_to_float32_mono(const int16_t *in, long n_frames, int channels,
                               float *out) {
    const float scale = 1.0f / 32768.0f;
    if (channels == 1) {
        for (long i = 0; i < n_frames; ++i) out[i] = in[i] * scale;
    } else {
        const float inv_c = 1.0f / channels;
        for (long i = 0; i < n_frames; ++i) {
            float acc = 0.0f;
            const int16_t *f = in + (size_t)i * channels;
            for (int c = 0; c < channels; ++c) acc += f[c];
            out[i] = acc * scale * inv_c;
        }
    }
    return n_frames;
}

/* interleaved int32 frames -> mono float32 */
long wav_pcm32_to_float32_mono(const int32_t *in, long n_frames, int channels,
                               float *out) {
    const float scale = 1.0f / 2147483648.0f;
    const float inv_c = 1.0f / channels;
    for (long i = 0; i < n_frames; ++i) {
        float acc = 0.0f;
        const int32_t *f = in + (size_t)i * channels;
        for (int c = 0; c < channels; ++c) acc += f[c] * scale;
        out[i] = acc * inv_c;
    }
    return n_frames;
}

/* int16 storage round-trip: clamp [-1,1], scale 32767, trunc, rescale.
 * Matches torch `.to(torch.int16)` truncation (`src/residual.py:210-212`). */
void quantize_roundtrip_f32(const float *in, long n, float *out) {
    for (long i = 0; i < n; ++i) {
        float x = in[i];
        if (x > 1.0f) x = 1.0f;
        if (x < -1.0f) x = -1.0f;
        out[i] = (float)((int16_t)(x * 32767.0f)) / 32767.0f;
    }
}

/* right-pad-or-truncate to target_len (host collate fast path,
 * `audio_dataset.py:89-106`) */
void pad_or_truncate_f32(const float *in, long n, float *out, long target_len) {
    long m = n < target_len ? n : target_len;
    for (long i = 0; i < m; ++i) out[i] = in[i];
    for (long i = m; i < target_len; ++i) out[i] = 0.0f;
}
