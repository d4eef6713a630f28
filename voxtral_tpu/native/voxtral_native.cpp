// voxtral_native — C++ runtime components for the voxtral_tpu data path.
//
// The reference implementation is fully native (Rust); this library is the
// C++ equivalent for the two host-side hot paths that sit outside the
// TPU compute graph:
//
//   1. The audio frontend: windowed real DFT + mel projection + the vLLM
//      log normalization (reference src/audio/mel.rs).  The DFT is
//      GEMM-shaped (dense [n_bins x n_fft] twiddle matrices applied per
//      frame) — n_fft=400 is not a power of two, and at 201 bins the
//      O(n^2) transform is ~80k MACs/frame, ideal for vectorized loops.
//   2. The GGUF Q4_0 repacker: one streaming pass over the 18-byte blocks
//      producing the TPU-resident layouts (transposed packed nibbles
//      [K/2, N] + bf16 scales [K/32, N], or int8 codes [N, K] + f16
//      scales) without the intermediate copies of the numpy path
//      (reference src/gguf/{reader,tensor}.rs).
//
// Exposed as a plain C ABI consumed via ctypes
// (voxtral_tpu/native/__init__.py); the Python numpy implementations
// remain as behavior-identical fallbacks.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Half/bfloat conversions
// ---------------------------------------------------------------------------

static inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;  // +-0
    } else {
      // Subnormal: normalize.
      int shift = 0;
      while (!(mant & 0x400)) {
        mant <<= 1;
        ++shift;
      }
      mant &= 0x3FF;
      bits = sign | ((127 - 15 - shift + 1) << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (mant << 13);  // inf / nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &bits, 4);
  return out;
}

static inline uint16_t f32_to_bf16(float f) {
  uint32_t bits;
  std::memcpy(&bits, &f, 4);
  // Round to nearest even.
  uint32_t lsb = (bits >> 16) & 1u;
  bits += 0x7FFFu + lsb;
  return (uint16_t)(bits >> 16);
}

// ---------------------------------------------------------------------------
// Mel frontend
// ---------------------------------------------------------------------------

// Log-mel spectrogram with reflect padding and vLLM normalization.
//
//   samples      [n_samples] f32
//   window       [n_fft] periodic Hann (precomputed)
//   cos_t, sin_t [n_bins x n_fft] twiddles for the real DFT
//   mel_basis    [n_mels x n_bins] Slaney filterbank
//   out          [max_frames x n_mels] row-major
//
// Frame count matches the reference (torch center=True minus the dropped
// last frame): (n_samples + 2*(n_fft/2) - n_fft) / hop.
// Returns the number of frames written, or -1 on overflow of max_frames.
int64_t voxtral_mel_compute_log(
    const float* samples, int64_t n_samples,
    const float* window, const float* cos_t, const float* sin_t,
    const float* mel_basis,
    int32_t n_fft, int32_t hop, int32_t n_bins, int32_t n_mels,
    float log_mel_max,
    float* out, int64_t max_frames) {
  const int32_t pad = n_fft / 2;
  const int64_t padded_len = n_samples + 2 * (int64_t)pad;
  const int64_t n_frames = (padded_len - n_fft) / hop;
  if (n_frames > max_frames) return -1;

  // Reflect-padded sample accessor (matches np.pad mode="reflect").
  auto sample_at = [&](int64_t idx) -> float {
    int64_t i = idx - pad;
    if (i < 0) i = -i;
    if (i >= n_samples) i = 2 * (n_samples - 1) - i;
    if (i < 0 || i >= n_samples) return 0.0f;  // degenerate tiny inputs
    return samples[i];
  };

  const float floor_val = log_mel_max - 8.0f;
  float* frame_buf = new float[n_fft];
  float* power = new float[n_bins];

  for (int64_t f = 0; f < n_frames; ++f) {
    const int64_t start = f * hop;
    // Gather + window.  The interior of the signal needs no reflection —
    // use a fast path with direct pointer access.
    if (start >= pad && start + n_fft <= pad + n_samples) {
      const float* src = samples + (start - pad);
      for (int32_t t = 0; t < n_fft; ++t) frame_buf[t] = src[t] * window[t];
    } else {
      for (int32_t t = 0; t < n_fft; ++t)
        frame_buf[t] = sample_at(start + t) * window[t];
    }

    // Real DFT power via twiddle GEMV: per bin, re/im dot products.
    for (int32_t b = 0; b < n_bins; ++b) {
      const float* c = cos_t + (int64_t)b * n_fft;
      const float* s = sin_t + (int64_t)b * n_fft;
      float re = 0.0f, im = 0.0f;
      for (int32_t t = 0; t < n_fft; ++t) {
        re += frame_buf[t] * c[t];
        im += frame_buf[t] * s[t];
      }
      power[b] = re * re + im * im;
    }

    // Mel projection + log normalization.
    float* row = out + f * n_mels;
    for (int32_t m = 0; m < n_mels; ++m) {
      const float* fb = mel_basis + (int64_t)m * n_bins;
      float acc = 0.0f;
      for (int32_t b = 0; b < n_bins; ++b) acc += fb[b] * power[b];
      float v = log10f(acc > 1e-10f ? acc : 1e-10f);
      if (v < floor_val) v = floor_val;
      row[m] = (v + 4.0f) * 0.25f;
    }
  }

  delete[] frame_buf;
  delete[] power;
  return n_frames;
}

// ---------------------------------------------------------------------------
// Q4_0 repacking (GGUF 18-byte blocks -> TPU layouts)
// ---------------------------------------------------------------------------

// raw: N*K/32 blocks of 18 bytes (f16 scale + 16 nibble bytes; element i
// in byte i's low nibble, element i+16 in its high nibble).
//
// Packed/transposed output (Pallas layout — see ops/q4_pallas.py):
//   codes_packed [K/8, N] int32: word (i, n) packs elements 8i..8i+7 as
//     (code + 8) << 4j (j = position within the word)
//   scales_bf16  [K/32, N]
int voxtral_q4_repack_packed(
    const uint8_t* raw, int64_t n, int64_t k,
    uint32_t* codes_packed, uint16_t* scales_bf16) {
  if (k % 32 != 0) return -1;
  const int64_t blocks_per_row = k / 32;
  for (int64_t row = 0; row < n; ++row) {
    const uint8_t* rb = raw + row * blocks_per_row * 18;
    for (int64_t blk = 0; blk < blocks_per_row; ++blk) {
      const uint8_t* b = rb + blk * 18;
      uint16_t f16;
      std::memcpy(&f16, b, 2);
      scales_bf16[blk * n + row] = f32_to_bf16(f16_to_f32(f16));
      const uint8_t* nib = b + 2;
      const int64_t w0 = blk * 4;  // 4 output words per 32-element block
      // Element e (0..31) = nibble of byte e%16 (lo for e<16, hi after).
      for (int32_t w = 0; w < 4; ++w) {
        uint32_t word = 0;
        for (int32_t j = 0; j < 8; ++j) {
          const int32_t e = 8 * w + j;
          const uint32_t v =
              (e < 16) ? (nib[e] & 0x0F) : (nib[e - 16] >> 4);
          word |= v << (4 * j);
        }
        codes_packed[(w0 + w) * n + row] = word;
      }
    }
  }
  return 0;
}

// int8 output (XLA fallback layout):
//   codes  [N, K] int8 in -8..7
//   scales [N, K/32] f16 bits (kept exact)
int voxtral_q4_repack_int8(
    const uint8_t* raw, int64_t n, int64_t k,
    int8_t* codes, uint16_t* scales_f16) {
  if (k % 32 != 0) return -1;
  const int64_t blocks_per_row = k / 32;
  for (int64_t row = 0; row < n; ++row) {
    const uint8_t* rb = raw + row * blocks_per_row * 18;
    int8_t* crow = codes + row * k;
    for (int64_t blk = 0; blk < blocks_per_row; ++blk) {
      const uint8_t* b = rb + blk * 18;
      uint16_t f16;
      std::memcpy(&f16, b, 2);
      scales_f16[row * blocks_per_row + blk] = f16;
      const uint8_t* nib = b + 2;
      int8_t* dst = crow + blk * 32;
      for (int32_t i = 0; i < 16; ++i) {
        dst[i] = (int8_t)(nib[i] & 0x0F) - 8;
        dst[i + 16] = (int8_t)(nib[i] >> 4) - 8;
      }
    }
  }
  return 0;
}

// Dequantize raw Q4_0 blocks to f32 (reference tensor.rs:88-113).
int voxtral_q4_dequant_f32(const uint8_t* raw, int64_t n_elements,
                           float* out) {
  if (n_elements % 32 != 0) return -1;
  const int64_t n_blocks = n_elements / 32;
  for (int64_t blk = 0; blk < n_blocks; ++blk) {
    const uint8_t* b = raw + blk * 18;
    uint16_t f16;
    std::memcpy(&f16, b, 2);
    const float d = f16_to_f32(f16);
    const uint8_t* nib = b + 2;
    float* dst = out + blk * 32;
    for (int32_t i = 0; i < 16; ++i) {
      dst[i] = (float)((int32_t)(nib[i] & 0x0F) - 8) * d;
      dst[i + 16] = (float)((int32_t)(nib[i] >> 4) - 8) * d;
    }
  }
  return 0;
}

}  // extern "C"
