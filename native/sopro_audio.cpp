// sopro-tpu native audio runtime: the host-side hot path of the serving
// stack (PCM conversion for the SPRO wire protocol, polyphase resampling,
// energy-VAD trim bounds). The TPU compute path is JAX/XLA; this library
// covers the I/O runtime the reference delegates to torch/torchaudio's C++
// (reference: src/sopro/audio.py:89-117, demo/server.py:119-124).
//
// C ABI only — bound from Python via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PCM conversion (SPRO wire frames, WAV payloads)
// ---------------------------------------------------------------------------

void sopro_f32_to_pcm16(const float* in, int16_t* out, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    float v = in[i];
    v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
    out[i] = (int16_t)lrintf(v * 32767.0f);
  }
}

void sopro_pcm16_to_f32(const int16_t* in, float* out, size_t n) {
  const float k = 1.0f / 32768.0f;
  for (size_t i = 0; i < n; ++i) out[i] = in[i] * k;
}

// mono downmix of interleaved multichannel float
void sopro_downmix_f32(const float* in, float* out, size_t frames, int ch) {
  const float k = 1.0f / (float)ch;
  for (size_t i = 0; i < frames; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < ch; ++c) acc += in[i * ch + c];
    out[i] = acc * k;
  }
}

// ---------------------------------------------------------------------------
// polyphase resampler (kaiser-windowed sinc, scipy resample_poly-compatible)
// ---------------------------------------------------------------------------

static double bessel_i0(double x) {
  // modified Bessel function of the first kind, order 0 (series expansion)
  double sum = 1.0, term = 1.0;
  const double x2 = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= x2 / (double)(k * k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// firwin(numtaps, cutoff, window=("kaiser", beta)) with unit DC gain
static std::vector<double> kaiser_sinc_filter(int half_len, double cutoff,
                                              double beta) {
  const int numtaps = 2 * half_len + 1;
  std::vector<double> h(numtaps);
  const double i0b = bessel_i0(beta);
  double sum = 0.0;
  for (int i = 0; i < numtaps; ++i) {
    const double m = i - half_len;
    const double sinc =
        m == 0.0 ? cutoff : std::sin(M_PI * cutoff * m) / (M_PI * m);
    const double r = 2.0 * i / (numtaps - 1) - 1.0;  // [-1, 1]
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    h[i] = sinc * w;
    sum += h[i];
  }
  for (auto& v : h) v /= sum;  // unit DC gain
  return h;
}

// number of output samples resample_poly produces for n inputs
size_t sopro_resample_out_len(size_t n, int up, int down) {
  return (n * (size_t)up + (size_t)down - 1) / (size_t)down;
}

// Polyphase up/down resampling equivalent to scipy.signal.resample_poly
// (window=("kaiser", 5.0)): zero-phase alignment, zero padding at edges.
void sopro_resample_poly_f32(const float* in, size_t n, int up, int down,
                             float* out) {
  if (up == down) {
    std::memcpy(out, in, n * sizeof(float));
    return;
  }
  const int max_rate = std::max(up, down);
  const int half_len = 10 * max_rate;
  std::vector<double> h = kaiser_sinc_filter(half_len, 1.0 / max_rate, 5.0);
  for (auto& v : h) v *= (double)up;

  const size_t n_out = sopro_resample_out_len(n, up, down);
  const int hl = (int)h.size();
  // y[j] = sum_k h[k] * x[(j*down + half_len - k) / up]  where the index
  // divides evenly; x zero-padded outside [0, n).
  for (size_t j = 0; j < n_out; ++j) {
    const long long t = (long long)j * down + half_len;  // position in taps
    double acc = 0.0;
    // k ranges so that (t - k) % up == 0 and 0 <= (t-k)/up < n
    long long k0 = t % up;  // smallest k with (t - k) divisible by up
    for (long long k = k0; k < hl; k += up) {
      const long long xi = (t - k) / up;
      if (xi < 0) break;  // xi only decreases with k; all later taps are < 0
      if (xi >= (long long)n) continue;
      acc += h[(size_t)k] * (double)in[(size_t)xi];
    }
    out[j] = (float)acc;
  }
}

// ---------------------------------------------------------------------------
// energy VAD trim (reference semantics: src/sopro/audio.py:30-86)
// ---------------------------------------------------------------------------

// Returns 1 and writes [start, end) sample bounds if trimming applies,
// else 0 (keep the original).
int sopro_trim_silence_bounds(const float* wav, size_t n, int sr,
                              float frame_ms, float hop_ms,
                              float thresh_db_floor, float prepad_ms,
                              float postpad_ms, float min_keep_sec,
                              size_t* start_out, size_t* end_out) {
  if (n == 0 || n < (size_t)(sr / 10)) return 0;
  const int frame_len = std::max(1, (int)(sr * frame_ms / 1000.0f));
  const int hop = std::max(1, (int)(sr * hop_ms / 1000.0f));
  if ((long long)n < frame_len) return 0;

  const size_t n_frames = 1 + (n - frame_len) / hop;
  std::vector<double> db(n_frames);
  double max_db = -1e30;
  for (size_t f = 0; f < n_frames; ++f) {
    double e = 0.0;
    const float* p = wav + f * hop;
    for (int i = 0; i < frame_len; ++i) e += (double)p[i] * p[i];
    e /= frame_len;
    db[f] = 10.0 * std::log10(e + 1e-10);
    max_db = std::max(max_db, db[f]);
  }
  const double thresh = std::max(max_db + thresh_db_floor,
                                 (double)thresh_db_floor);
  long long first = -1, last = -1;
  for (size_t f = 0; f < n_frames; ++f) {
    if (db[f] > thresh) {
      if (first < 0) first = (long long)f;
      last = (long long)f;
    }
  }
  if (first < 0) return 0;

  const long long prepad = (long long)(sr * prepad_ms / 1000.0f);
  const long long postpad = (long long)(sr * postpad_ms / 1000.0f);
  long long start = first * hop - prepad;
  if (start < 0) start = 0;
  long long end = last * hop + frame_len + postpad;
  if (end > (long long)n) end = (long long)n;
  if (end <= start || (end - start) < (long long)(min_keep_sec * sr)) return 0;
  *start_out = (size_t)start;
  *end_out = (size_t)end;
  return 1;
}

}  // extern "C"
