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
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <dlfcn.h>

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

// ---------------------------------------------------------------------------
// compressed-audio decode (mp3 via libmpg123, ogg-vorbis via libvorbisfile)
//
// The reference gets mp3/flac/ogg decode for free through its hard soundfile
// + torchaudio dependencies (reference: pyproject.toml:15-25, audio.py:89).
// This image ships neither, but the distro's codec libraries are present —
// they are dlopen'd lazily with prototypes declared here, so the build has
// zero compile-time audio deps and degrades cleanly when a lib is absent.
// ---------------------------------------------------------------------------

namespace {

// --- libmpg123 (prototypes match the stable mpg123 C ABI) ---
typedef struct mpg123_handle_struct mpg123_handle;
struct Mpg123Api {
  int (*init)(void);
  mpg123_handle* (*make)(const char*, int*);
  int (*open)(mpg123_handle*, const char*);
  int (*format_none)(mpg123_handle*);
  int (*format)(mpg123_handle*, long, int, int);
  int (*getformat)(mpg123_handle*, long*, int*, int*);
  int (*read)(mpg123_handle*, void*, size_t, size_t*);
  int (*close)(mpg123_handle*);
  void (*destroy)(mpg123_handle*);
  void* lib = nullptr;
  bool ok = false;
};

Mpg123Api& mpg123_api() {
  static Mpg123Api api;
  static bool tried = false;
  if (tried) return api;
  tried = true;
  api.lib = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_LOCAL);
  if (!api.lib) return api;
  api.init = (int (*)(void))dlsym(api.lib, "mpg123_init");
  api.make = (mpg123_handle * (*)(const char*, int*)) dlsym(api.lib, "mpg123_new");
  api.open = (int (*)(mpg123_handle*, const char*))dlsym(api.lib, "mpg123_open");
  api.format_none = (int (*)(mpg123_handle*))dlsym(api.lib, "mpg123_format_none");
  api.format = (int (*)(mpg123_handle*, long, int, int))dlsym(api.lib, "mpg123_format");
  api.getformat =
      (int (*)(mpg123_handle*, long*, int*, int*))dlsym(api.lib, "mpg123_getformat");
  api.read = (int (*)(mpg123_handle*, void*, size_t, size_t*))dlsym(api.lib,
                                                                    "mpg123_read");
  api.close = (int (*)(mpg123_handle*))dlsym(api.lib, "mpg123_close");
  api.destroy = (void (*)(mpg123_handle*))dlsym(api.lib, "mpg123_delete");
  api.ok = api.init && api.make && api.open && api.format_none && api.format &&
           api.getformat && api.read && api.close && api.destroy;
  if (api.ok) api.ok = api.init() == 0;  // MPG123_OK
  return api;
}

constexpr int kMpg123Ok = 0;
constexpr int kMpg123Done = -12;
constexpr int kMpg123NewFormat = -11;
constexpr int kMpg123EncSigned16 = 0xD0;  // the always-available encoding

// decodes into mono float32; returns 0 ok, 1 undecodable, 2 lib missing
int decode_mp3(const char* path, std::vector<float>& mono, int* sr) {
  Mpg123Api& api = mpg123_api();
  if (!api.ok) return 2;
  int err = 0;
  mpg123_handle* h = api.make(nullptr, &err);
  if (!h) return 1;
  if (api.open(h, path) != kMpg123Ok) {
    api.destroy(h);
    return 1;
  }
  long rate = 0;
  int ch = 0, enc = 0;
  if (api.getformat(h, &rate, &ch, &enc) != kMpg123Ok || rate <= 0 || ch <= 0) {
    api.close(h);
    api.destroy(h);
    return 1;
  }
  // force s16 output at the stream's native rate/channels (s16 is the one
  // encoding every libmpg123 build provides; float support is optional)
  api.format_none(h);
  if (api.format(h, rate, ch, kMpg123EncSigned16) != kMpg123Ok) {
    api.close(h);
    api.destroy(h);
    return 1;
  }
  std::vector<unsigned char> buf(1 << 18);
  const float scale = 1.0f / 32768.0f;
  for (;;) {
    size_t done = 0;
    int r = api.read(h, buf.data(), buf.size(), &done);
    if (done > 0) {
      const int16_t* s = (const int16_t*)buf.data();
      const size_t frames = done / sizeof(int16_t) / ch;
      const float k = scale / (float)ch;
      for (size_t i = 0; i < frames; ++i) {
        float acc = 0.0f;
        for (int c = 0; c < ch; ++c) acc += (float)s[i * ch + c];
        mono.push_back(acc * k);
      }
    }
    if (r == kMpg123Done) break;
    if (r == kMpg123NewFormat) {
      if (api.getformat(h, &rate, &ch, &enc) != kMpg123Ok || ch <= 0) break;
      continue;
    }
    if (r != kMpg123Ok && done == 0) break;
  }
  api.close(h);
  api.destroy(h);
  *sr = (int)rate;
  return mono.empty() ? 1 : 0;
}

// --- libvorbisfile ---
// vorbis_info layout (stable libvorbis ABI, x86-64): int version; int
// channels; long rate; ...
struct VorbisInfoHead {
  int version;
  int channels;
  long rate;
};

struct VorbisApi {
  int (*fopen)(const char*, void*);
  VorbisInfoHead* (*info)(void*, int);
  long (*read_float)(void*, float***, int, int*);
  int (*clear)(void*);
  void* lib = nullptr;
  bool ok = false;
};

VorbisApi& vorbis_api() {
  static VorbisApi api;
  static bool tried = false;
  if (tried) return api;
  tried = true;
  api.lib = dlopen("libvorbisfile.so.3", RTLD_NOW | RTLD_LOCAL);
  if (!api.lib) return api;
  api.fopen = (int (*)(const char*, void*))dlsym(api.lib, "ov_fopen");
  api.info = (VorbisInfoHead * (*)(void*, int)) dlsym(api.lib, "ov_info");
  api.read_float =
      (long (*)(void*, float***, int, int*))dlsym(api.lib, "ov_read_float");
  api.clear = (int (*)(void*))dlsym(api.lib, "ov_clear");
  api.ok = api.fopen && api.info && api.read_float && api.clear;
  return api;
}

int decode_ogg(const char* path, std::vector<float>& mono, int* sr) {
  VorbisApi& api = vorbis_api();
  if (!api.ok) return 2;
  // OggVorbis_File is opaque here; its real size is ~944 bytes — allocate
  // with generous headroom (ov_fopen initializes the struct itself)
  std::vector<unsigned char> vf(4096, 0);
  if (api.fopen(path, vf.data()) != 0) return 1;
  VorbisInfoHead* vi = api.info(vf.data(), -1);
  if (!vi || vi->channels <= 0 || vi->rate <= 0) {
    api.clear(vf.data());
    return 1;
  }
  const int ch = vi->channels;
  *sr = (int)vi->rate;
  int bitstream = 0;
  for (;;) {
    float** pcm = nullptr;
    long n = api.read_float(vf.data(), &pcm, 4096, &bitstream);
    if (n <= 0) break;  // 0 = EOF; negative = hole/error — stop either way
    const float k = 1.0f / (float)ch;
    for (long i = 0; i < n; ++i) {
      float acc = 0.0f;
      for (int c = 0; c < ch; ++c) acc += pcm[c][i];
      mono.push_back(acc * k);
    }
  }
  api.clear(vf.data());
  return mono.empty() ? 1 : 0;
}

}  // namespace

// Decode a compressed audio file to mono float32. Container is sniffed from
// the leading bytes (mp3: ID3 tag or MPEG sync; ogg: "OggS").
// Returns 0 on success (*out malloc'd — free with sopro_buf_free), 1 if the
// file is unsupported/undecodable, 2 if the needed system codec library is
// not present.
int sopro_decode_file(const char* path, float** out, size_t* n_out, int* sr) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  unsigned char magic[4] = {0, 0, 0, 0};
  size_t got = fread(magic, 1, 4, f);
  fclose(f);
  if (got < 4) return 1;

  std::vector<float> mono;
  int rc = 1;
  if (!memcmp(magic, "OggS", 4)) {
    rc = decode_ogg(path, mono, sr);
  } else if (!memcmp(magic, "ID3", 3) ||
             (magic[0] == 0xFF && (magic[1] & 0xE0) == 0xE0)) {
    rc = decode_mp3(path, mono, sr);
  } else {
    return 1;  // flac/webm/etc: no system decoder in this image
  }
  if (rc != 0) return rc;
  *out = (float*)malloc(mono.size() * sizeof(float));
  if (!*out) return 1;
  memcpy(*out, mono.data(), mono.size() * sizeof(float));
  *n_out = mono.size();
  return 0;
}

void sopro_buf_free(float* p) { free(p); }

}  // extern "C"
