// Native host data pipeline for tpu_sednn — the C++ counterpart of the
// reference trainer's Interface.cc chunk reader (big-endian pfile frames ->
// byte-swap -> normalize -> 11-frame splice -> NAT append -> shuffled
// scatter), re-designed as a reusable threaded library instead of a
// monolithic trainer method.  Bound to Python via ctypes (no pybind11 in the
// image); tpu_sednn/io/native.py holds the wrapper + pure-NumPy fallback.
//
// Reference behaviors covered (citations into /root/reference):
//   * frame layout: 2 id words + fea_dim big-endian f32 per frame
//     (Interface.cc:710, how_to_get_pfile.txt)
//   * normalize x = (x - mean) * inv_std at load (Interface.cc:745-746)
//   * splice fea_context frames per sample (Interface.cc:770-775)
//   * NAT: per-sentence-segment mean of first 6 frames (Interface.cc:776-779)
//   * scatter to shuffled sample rows (Interface.cc:731-735)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline uint32_t bswap32(uint32_t v) {
#if defined(__GNUC__)
  return __builtin_bswap32(v);
#else
  return ((v & 0xFF) << 24) | ((v & 0xFF00) << 8) | ((v >> 8) & 0xFF00) | (v >> 24);
#endif
}

void for_each_range(int64_t n, int n_threads, const std::function<void(int64_t, int64_t)>& fn) {
  if (n_threads <= 1 || n < 4096) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t per = (n + n_threads - 1) / n_threads;
  for (int i = 0; i < n_threads; ++i) {
    int64_t lo = i * per, hi = std::min<int64_t>(n, lo + per);
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Read `n_frames` raw pfile frames starting at absolute frame `frame_start`,
// byte-swap, drop the 2 id words, normalize, write (n_frames, fea_dim) f32
// row-major into `out`.  Returns 0 on success, negative errno-style code.
int sednn_read_frames(const char* path, int64_t header_size, int64_t frame_start,
                      int64_t n_frames, int32_t fea_dim, const float* mean,
                      const float* inv_std, float* out, int32_t n_threads) {
  const int64_t words_per_frame = 2 + fea_dim;
  const int64_t bytes = n_frames * words_per_frame * 4;
  std::vector<uint32_t> raw(n_frames * words_per_frame);

  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  if (std::fseek(fp, header_size + frame_start * words_per_frame * 4, SEEK_SET) != 0) {
    std::fclose(fp);
    return -2;
  }
  if ((int64_t)std::fread(raw.data(), 1, bytes, fp) != bytes) {
    std::fclose(fp);
    return -3;
  }
  std::fclose(fp);

  for_each_range(n_frames, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint32_t* src = raw.data() + i * words_per_frame + 2;
      float* dst = out + i * fea_dim;
      if (mean && inv_std) {
        for (int32_t j = 0; j < fea_dim; ++j) {
          uint32_t w = bswap32(src[j]);
          float v;
          std::memcpy(&v, &w, 4);
          dst[j] = (v - mean[j]) * inv_std[j];
        }
      } else {
        for (int32_t j = 0; j < fea_dim; ++j) {
          uint32_t w = bswap32(src[j]);
          std::memcpy(dst + j, &w, 4);
        }
      }
    }
  });
  return 0;
}

// Splice + NAT + scatter for one chunk already resident as (n_frames, d) f32.
//   seg_off / seg_len : per sentence-segment offsets/lengths within the chunk
//   sample_index      : shuffled destination row per source sample
//   indata            : (n_samples, d*context [+ d]) output, caller-zeroed or not
//   nat               : 1 to append the first-6-frame mean per segment
// Returns number of samples written, or negative on error.
int64_t sednn_splice_scatter(const float* data, int64_t n_frames, int32_t d,
                             const int64_t* seg_off, const int64_t* seg_len,
                             int32_t n_segs, int32_t context, int32_t nat,
                             const int64_t* sample_index, int64_t n_samples,
                             float* indata, int32_t n_threads) {
  const int64_t in_dim = (int64_t)d * context + (nat ? d : 0);

  // precompute per-segment first-sample counters
  std::vector<int64_t> seg_base(n_segs + 1, 0);
  for (int32_t s = 0; s < n_segs; ++s) {
    int64_t ns = seg_len[s] >= context ? seg_len[s] - context + 1 : 0;
    seg_base[s + 1] = seg_base[s] + ns;
  }
  if (seg_base[n_segs] != n_samples) return -1;

  for_each_range(n_segs, std::min<int64_t>(n_threads, n_segs), [&](int64_t lo, int64_t hi) {
    std::vector<float> nat_est(d);
    for (int64_t s = lo; s < hi; ++s) {
      int64_t len = seg_len[s];
      if (len < context) continue;
      const float* seg = data + seg_off[s] * d;
      if (nat) {
        // reference divides by 6.0 unconditionally (Interface.cc:779); clamp
        // only when the segment is shorter than 6 frames
        int64_t k = std::min<int64_t>(6, len);
        float denom = len >= 6 ? 6.0f : (float)k;
        for (int32_t j = 0; j < d; ++j) nat_est[j] = 0.f;
        for (int64_t f = 0; f < k; ++f)
          for (int32_t j = 0; j < d; ++j) nat_est[j] += seg[f * d + j];
        for (int32_t j = 0; j < d; ++j) nat_est[j] /= denom;
      }
      int64_t n_s = len - context + 1;
      for (int64_t jw = 0; jw < n_s; ++jw) {
        float* row = indata + sample_index[seg_base[s] + jw] * in_dim;
        std::memcpy(row, seg + jw * d, (size_t)d * context * 4);
        if (nat) std::memcpy(row + (int64_t)d * context, nat_est.data(), (size_t)d * 4);
      }
    }
  });
  return seg_base[n_segs];
}

// Gather target rows: targ_out[sample_index[i]] = targ[seg-relative window i +
// targ_offset] for every spliced window, mirroring the second half of
// Interface::Readchunk (Interface.cc:833-853).
int64_t sednn_target_scatter(const float* targ, int64_t n_frames, int32_t d_out,
                             const int64_t* seg_off, const int64_t* seg_len,
                             int32_t n_segs, int32_t context, int32_t targ_offset,
                             const int64_t* sample_index, int64_t n_samples,
                             float* out, int32_t n_threads) {
  std::vector<int64_t> seg_base(n_segs + 1, 0);
  for (int32_t s = 0; s < n_segs; ++s) {
    int64_t ns = seg_len[s] >= context ? seg_len[s] - context + 1 : 0;
    seg_base[s + 1] = seg_base[s] + ns;
  }
  if (seg_base[n_segs] != n_samples) return -1;

  for_each_range(n_segs, std::min<int64_t>(n_threads, n_segs), [&](int64_t lo, int64_t hi) {
    for (int64_t s = lo; s < hi; ++s) {
      int64_t len = seg_len[s];
      if (len < context) continue;
      const float* seg = targ + (seg_off[s] + targ_offset) * d_out;
      int64_t n_s = len - context + 1;
      for (int64_t jw = 0; jw < n_s; ++jw) {
        std::memcpy(out + sample_index[seg_base[s] + jw] * d_out, seg + jw * d_out,
                    (size_t)d_out * 4);
      }
    }
  });
  return seg_base[n_segs];
}

// Bit-exact glibc lrand48-driven Fisher-Yates (GetRandIndex,
// Interface.cc:1044-1055): for i in 0..n-2 swap vec[lrand48()%(n-i)] with
// vec[n-1-i].  `state` is the 48-bit LCG state (pre-step); the advanced state
// is returned so the Python Rand48 stream stays the source of truth.
uint64_t sednn_rand48_shuffle(uint64_t state, int64_t* vec, int64_t n) {
  const uint64_t A = 0x5DEECE66DULL, C = 0xBULL, MASK = (1ULL << 48) - 1;
  for (int64_t i = 0; i < n - 1; ++i) {
    state = (A * state + C) & MASK;
    int64_t idx = (int64_t)(state >> 17) % (n - i);
    int64_t t = vec[idx];
    vec[idx] = vec[n - 1 - i];
    vec[n - 1 - i] = t;
  }
  return state;
}

}  // extern "C"
