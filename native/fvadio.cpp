// fvadio — native audio I/O runtime for formula_vad_tpu.
//
// Replaces the role of libsndfile in the reference
// (src/audio_utils/AudioFileStream.zig, AudioBuffer.zig): bulk PCM sample
// conversion and interleave<->planar transforms, the host-side hot loops of
// the data loader. Exposed through a minimal C ABI consumed via ctypes
// (no pybind11 in this environment).
//
// All functions are thread-safe (stateless, caller-owned buffers) so the
// Python side can decode many streams in parallel from a thread pool.

#include <cstdint>
#include <cstring>
#include <cstdio>

extern "C" {

// ---- sample conversion: interleaved raw -> planar float32 ----------------

// 16-bit signed PCM, interleaved -> planar float32 scaled by 1/32768.
void fvad_decode_pcm16(const int16_t* in, float* out, int64_t n_frames,
                       int32_t n_channels) {
  for (int32_t c = 0; c < n_channels; ++c) {
    float* dst = out + (int64_t)c * n_frames;
    const int16_t* src = in + c;
    for (int64_t i = 0; i < n_frames; ++i) {
      dst[i] = (float)src[(int64_t)i * n_channels] * (1.0f / 32768.0f);
    }
  }
}

// 24-bit signed little-endian PCM -> planar float32 scaled by 1/2^23.
void fvad_decode_pcm24(const uint8_t* in, float* out, int64_t n_frames,
                       int32_t n_channels) {
  const float scale = 1.0f / 8388608.0f;
  for (int32_t c = 0; c < n_channels; ++c) {
    float* dst = out + (int64_t)c * n_frames;
    for (int64_t i = 0; i < n_frames; ++i) {
      const uint8_t* p = in + ((int64_t)i * n_channels + c) * 3;
      int32_t v = (int32_t)p[0] | ((int32_t)p[1] << 8) | ((int32_t)p[2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      dst[i] = (float)v * scale;
    }
  }
}

// 32-bit signed PCM -> planar float32 scaled by 1/2^31.
void fvad_decode_pcm32(const int32_t* in, float* out, int64_t n_frames,
                       int32_t n_channels) {
  const float scale = 1.0f / 2147483648.0f;
  for (int32_t c = 0; c < n_channels; ++c) {
    float* dst = out + (int64_t)c * n_frames;
    const int32_t* src = in + c;
    for (int64_t i = 0; i < n_frames; ++i) {
      dst[i] = (float)src[(int64_t)i * n_channels] * scale;
    }
  }
}

// float32 interleaved -> planar (deinterleave only).
void fvad_deinterleave_f32(const float* in, float* out, int64_t n_frames,
                           int32_t n_channels) {
  for (int32_t c = 0; c < n_channels; ++c) {
    float* dst = out + (int64_t)c * n_frames;
    const float* src = in + c;
    for (int64_t i = 0; i < n_frames; ++i) {
      dst[i] = src[(int64_t)i * n_channels];
    }
  }
}

// ---- encode: planar float32 -> interleaved -------------------------------

void fvad_encode_f32(const float* in, float* out, int64_t n_frames,
                     int32_t n_channels) {
  for (int32_t c = 0; c < n_channels; ++c) {
    const float* src = in + (int64_t)c * n_frames;
    float* dst = out + c;
    for (int64_t i = 0; i < n_frames; ++i) {
      dst[(int64_t)i * n_channels] = src[i];
    }
  }
}

// planar float32 -> interleaved PCM16 with clip and round-half-to-even
// (matches numpy's np.round, the Python reference path).
void fvad_encode_pcm16(const float* in, int16_t* out, int64_t n_frames,
                       int32_t n_channels) {
  for (int32_t c = 0; c < n_channels; ++c) {
    const float* src = in + (int64_t)c * n_frames;
    int16_t* dst = out + c;
    for (int64_t i = 0; i < n_frames; ++i) {
      float v = src[i];
      if (v > 1.0f) v = 1.0f;
      if (v < -1.0f) v = -1.0f;
      // default FP rounding mode is round-to-nearest-even
      int32_t q = (int32_t)__builtin_nearbyintf(v * 32767.0f);
      dst[(int64_t)i * n_channels] = (int16_t)q;
    }
  }
}

// ---- host DSP helpers ----------------------------------------------------

// RMS per channel over planar float32 [n_channels, n_frames].
void fvad_rms_per_channel(const float* in, float* out_rms, int64_t n_frames,
                          int32_t n_channels) {
  for (int32_t c = 0; c < n_channels; ++c) {
    const float* src = in + (int64_t)c * n_frames;
    double acc = 0.0;
    for (int64_t i = 0; i < n_frames; ++i) acc += (double)src[i] * src[i];
    out_rms[c] = (float)__builtin_sqrt(acc / (double)n_frames);
  }
}

int32_t fvad_abi_version(void) { return 1; }

}  // extern "C"
