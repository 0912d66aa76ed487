// Native host-side kernels for unitspeech_tpu.
//
// TPU-native replacements for the reference's native components
// (SURVEY.md §2.4):
//   * maximum_path_batch — the monotonic-alignment-search Viterbi DP the
//     reference gets from the external Cython `monotonic_align` package
//     (used at train_STEP1.py:344). The on-device lax.scan variant
//     (ops/mas.py) is the training path; this kernel serves host-side
//     preprocessing/tooling and acts as a parity oracle.
//   * active_speech_level — ITU-T P.56 active speech level, replacing the
//     G.191 `sv56demo` subprocess (sv56.py:57).
//
// Build: g++ -O3 -shared -fPIC -o libunitspeech_native.so unitspeech_native.cc
// ABI: plain C, consumed via ctypes (unitspeech_tpu/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Viterbi max-path DP. log_prior/path: (b, t_x, t_y) row-major float32.
// x_lengths/y_lengths: per-sample valid extents.
// Matches the resemble-ai/monotonic_align DP exactly, including the
// advance-on-tie backtrack rule.
void maximum_path_batch(const float* log_prior, float* path,
                        const int32_t* x_lengths, const int32_t* y_lengths,
                        int32_t b, int32_t t_x, int32_t t_y) {
  const float kNegInf = -1e9f;
  std::vector<float> value;
  for (int32_t s = 0; s < b; ++s) {
    const int32_t tx = x_lengths[s];
    const int32_t ty = y_lengths[s];
    const float* lp = log_prior + (size_t)s * t_x * t_y;
    float* out = path + (size_t)s * t_x * t_y;
    std::memset(out, 0, sizeof(float) * (size_t)t_x * t_y);
    if (tx <= 0 || ty <= 0) continue;

    value.assign((size_t)ty * tx, kNegInf);
    value[0] = lp[0];  // (y=0, x=0)
    for (int32_t y = 1; y < ty; ++y) {
      const int32_t x_lo = tx + y - ty > 0 ? tx + y - ty : 0;
      const int32_t x_hi = y + 1 < tx ? y + 1 : tx;
      for (int32_t x = x_lo; x < x_hi; ++x) {
        const float stay = x < y ? value[(size_t)(y - 1) * tx + x] : kNegInf;
        const float adv = x > 0 ? value[(size_t)(y - 1) * tx + x - 1] : kNegInf;
        value[(size_t)y * tx + x] =
            lp[(size_t)x * t_y + y] + (stay > adv ? stay : adv);
      }
    }
    int32_t index = tx - 1;
    for (int32_t y = ty - 1; y >= 0; --y) {
      out[(size_t)index * t_y + y] = 1.0f;
      if (index != 0 &&
          (index == y || value[(size_t)(y - 1) * tx + index - 1] >=
                             value[(size_t)(y - 1) * tx + index])) {
        --index;
      }
    }
  }
}

// ITU-T P.56 active speech level (method B), matching ops/sv56.py.
// x: float waveform in [-1, 1]; returns level in dBov and activity factor.
void active_speech_level(const float* x, int64_t n, int32_t sr,
                         double* level_dbov, double* activity) {
  const double kMargin = 15.9;
  const int kThresholds = 15;
  if (n <= 0) {
    *level_dbov = -100.0;
    *activity = 0.0;
    return;
  }
  const double g = std::exp(-1.0 / (sr * 0.03));
  const int64_t hangover = (int64_t)std::ceil(0.2 * sr);

  double thresholds[kThresholds];
  for (int j = 0; j < kThresholds; ++j) thresholds[j] = std::pow(2.0, j + 1 - 15);

  double sq = 0.0, p = 0.0, q = 0.0;
  int64_t counts[kThresholds] = {0};
  int64_t hang[kThresholds];
  for (int j = 0; j < kThresholds; ++j) hang[j] = hangover;

  for (int64_t i = 0; i < n; ++i) {
    const double xi = x[i];
    sq += xi * xi;
    p = g * p + (1.0 - g) * std::fabs(xi);
    q = g * q + (1.0 - g) * p;
    for (int j = 0; j < kThresholds; ++j) {
      if (q >= thresholds[j]) {
        ++counts[j];
        hang[j] = 0;
      } else if (hang[j] < hangover) {
        ++counts[j];
        ++hang[j];
      }
    }
  }
  if (sq <= 0.0) {
    *level_dbov = -100.0;
    *activity = 0.0;
    return;
  }
  const double long_term = 10.0 * std::log10(sq / (double)n + 1e-20);
  double a_db[kThresholds], delta[kThresholds];
  for (int j = 0; j < kThresholds; ++j) {
    a_db[j] = counts[j] > 0 ? 10.0 * std::log10(sq / (double)counts[j] + 1e-20)
                            : -100.0;
    delta[j] = a_db[j] - 20.0 * std::log10(thresholds[j]);
  }
  *level_dbov = long_term;
  *activity = 1.0;
  for (int j = kThresholds - 1; j >= 0; --j) {
    if (counts[j] == 0) continue;
    if (delta[j] >= kMargin) {
      double active;
      if (j == kThresholds - 1 || counts[j + 1] == 0) {
        active = a_db[j];
      } else {
        const double d1 = delta[j], d2 = delta[j + 1];
        if (std::fabs(d1 - d2) < 1e-9) {
          active = a_db[j];
        } else {
          const double w = (d1 - kMargin) / (d1 - d2);
          active = a_db[j] + w * (a_db[j + 1] - a_db[j]);
        }
      }
      *level_dbov = active;
      *activity = std::pow(10.0, (long_term - active) / 10.0);
      break;
    }
  }
}

}  // extern "C"
