// Native block-floating-point pack engine.
//
// Quantizes + bit-packs fp32 weights into BFP storage (int8 codes or
// sub-byte codes interleaved into uint32 words) on the host, multithreaded.
// This is the hot host-side op of mixed-precision search: every trial
// re-packs the whole model's weights for its sampled per-layer config
// (the reference instead re-instantiates + reloads the model per trial,
// reference search/search.py:145-176 — its dominant wall-clock cost).
//
// Math mirrors llm_mixed_q_tpu/kernels/packing.py::pack_block_fp bit-for-bit
// (which itself mirrors reference block_fp.py:21-153):
//   per-block max -> exponent = clamp(ceil(log2(max)), emin, emax)
//   scale = 2^(exponent - mantissa_bits)
//   code  = sign(x + 1e-9) * clip(nearbyint((|x| + 1e-9) / 2^exponent * 2^mb),
//                                 0, 2^mb - 1)
// nearbyint under the default FE_TONEAREST mode is round-half-to-even,
// matching jnp.round / torch.round.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libbfp_pack.so bfp_pack.cc -lpthread

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct BfpParams {
  int width;          // sign + mantissa bits
  int mantissa_bits;  // width - 1
  float exp_min;
  float exp_max;
};

inline BfpParams make_params(int width, int exponent_width, int exponent_bias) {
  BfpParams p;
  p.width = width;
  p.mantissa_bits = width - 1;
  if (exponent_bias < 0) exponent_bias = (1 << (exponent_width - 1)) - 1;
  p.exp_max = static_cast<float>((1 << exponent_width) - 1 - exponent_bias);
  p.exp_min = static_cast<float>(-exponent_bias);
  return p;
}

// One row of blocks: quantize `in_padded` elements (already zero-padded by
// the caller) into codes (int32 workspace) + per-block scales.
// `zero_fill` is the value substituted for all-zero blocks' max (the
// reference's zero-block fix, block_fp.py:54-58) — computed globally by the
// caller in a first pass.
void quantize_row(const float* w, int in_padded, int block,
                  const BfpParams& p, float zero_fill, int8_t* codes,
                  float* scales) {
  const float mantissa_max = static_cast<float>((1 << p.mantissa_bits) - 1);
  const float mscale = static_cast<float>(1 << p.mantissa_bits);
  const int nb = in_padded / block;
  for (int b = 0; b < nb; ++b) {
    const float* xb = w + b * block;
    float pbm = 0.0f;
    for (int i = 0; i < block; ++i) {
      float a = std::fabs(xb[i]);
      if (a > pbm) pbm = a;
    }
    // XLA flushes subnormals to zero; mirror it so zero-block detection
    // (and thus the global fill) matches the JAX pack bit-for-bit
    if (pbm < FLT_MIN) pbm = zero_fill;
    float e = std::ceil(std::log2(pbm));
    if (e < p.exp_min) e = p.exp_min;
    if (e > p.exp_max) e = p.exp_max;
    const float two_e = std::exp2(e);
    scales[b] = std::exp2(e - static_cast<float>(p.mantissa_bits));
    int8_t* cb = codes + b * block;
    for (int i = 0; i < block; ++i) {
      float x = xb[i];
      float sign = (x + 1e-9f) >= 0.0f ? 1.0f : -1.0f;
      float value = std::fabs(x) + 1e-9f;
      float m = std::nearbyint(value / two_e * mscale);
      if (m > mantissa_max) m = mantissa_max;
      if (m < 0.0f) m = 0.0f;
      cb[i] = static_cast<int8_t>(sign * m);
    }
  }
}

// Global zero-block fill: min over all nonzero per-block maxes (1.0 if all
// blocks are zero) — matches packing.py's jnp.min(where(is_zero, inf, pbm)).
float compute_zero_fill(const float* w, int64_t out, int64_t in_padded,
                        int block) {
  float fill = INFINITY;
  const int64_t nb = in_padded / block;
  for (int64_t r = 0; r < out; ++r) {
    const float* row = w + r * in_padded;
    for (int64_t b = 0; b < nb; ++b) {
      float pbm = 0.0f;
      for (int i = 0; i < block; ++i) {
        float a = std::fabs(row[b * block + i]);
        if (a > pbm) pbm = a;
      }
      if (pbm >= FLT_MIN && pbm < fill) fill = pbm;  // FTZ like XLA
    }
  }
  return std::isinf(fill) ? 1.0f : fill;
}

void parallel_rows(int64_t out, int n_threads,
                   const std::function<void(int64_t, int64_t)>& fn) {
  if (n_threads <= 1 || out < 2) {
    fn(0, out);
    return;
  }
  std::vector<std::thread> workers;
  const int64_t chunk = (out + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(out, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back(fn, lo, hi);
  }
  for (auto& th : workers) th.join();
}

}  // namespace

extern "C" {

// Pack to int8 codes (one byte per element) + f32 per-block scales.
// w: [out, in] row-major, caller guarantees in % block == 0 via zero padding
// (in == in_padded here). codes: [out, in]; scales: [out, in/block].
void bfp_pack_int8(const float* w, int64_t out, int64_t in_padded, int width,
                   int exponent_width, int exponent_bias, int block,
                   int8_t* codes, float* scales, int n_threads) {
  const BfpParams p = make_params(width, exponent_width, exponent_bias);
  const float zero_fill = compute_zero_fill(w, out, in_padded, block);
  const int64_t nb = in_padded / block;
  parallel_rows(out, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      quantize_row(w + r * in_padded, static_cast<int>(in_padded), block, p,
                   zero_fill, codes + r * in_padded, scales + r * nb);
    }
  });
}

// Pack to sub-byte bit-packed uint32 words (column-strided tile layout, see
// packing.py::pack_block_fp_subbyte) + per-tile scales.
// in_padded must be a multiple of tile = per_word * 128.
// words: [out, in_padded/per_word]; scales: [n_tiles, out, tile/block]
// (the kernel's scale layout).
void bfp_pack_subbyte(const float* w, int64_t out, int64_t in_padded,
                      int width, int exponent_width, int exponent_bias,
                      int block, uint32_t* words, float* scales,
                      int n_threads) {
  const BfpParams p = make_params(width, exponent_width, exponent_bias);
  const float zero_fill = compute_zero_fill(w, out, in_padded, block);
  const int per_word = 32 / width;
  const int kSlice = 128;
  const int tile = per_word * kSlice;
  const int64_t nt = in_padded / tile;
  const int spt = tile / block;  // scales per tile
  const int cmax = (1 << (width - 1)) - 1;
  const int64_t words_per_row = in_padded / per_word;  // == nt * kSlice
  parallel_rows(out, n_threads, [&](int64_t lo, int64_t hi) {
    std::vector<int8_t> codes(in_padded);
    std::vector<float> row_scales(in_padded / block);
    for (int64_t r = lo; r < hi; ++r) {
      quantize_row(w + r * in_padded, static_cast<int>(in_padded), block, p,
                   zero_fill, codes.data(), row_scales.data());
      // scales -> [nt, out, spt]
      for (int64_t t = 0; t < nt; ++t) {
        std::memcpy(scales + (t * out + r) * spt, row_scales.data() + t * spt,
                    spt * sizeof(float));
      }
      // words: word g of tile t = sum_j (code[t*tile + j*128 + g] + cmax) << (w*j)
      uint32_t* wr = words + r * words_per_row;
      for (int64_t t = 0; t < nt; ++t) {
        const int8_t* ct = codes.data() + t * tile;
        uint32_t* wt = wr + t * kSlice;
        for (int g = 0; g < kSlice; ++g) {
          uint32_t acc = 0;
          for (int j = 0; j < per_word; ++j) {
            acc |= static_cast<uint32_t>(
                       static_cast<int>(ct[j * kSlice + g]) + cmax)
                   << (width * j);
          }
          wt[g] = acc;
        }
      }
    }
  });
}

int bfp_pack_version() { return 1; }

}  // extern "C"
