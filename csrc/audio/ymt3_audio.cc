// ymt3_audio: host-side audio decode + resample fast path.
//
// Capability parity target: the reference leans on torchaudio/libsndfile
// C++ for `load_audio_file` (SURVEY.md C12, §2.2 native table). This is the
// first-party TPU-stack equivalent: WAV decode (PCM 8/16/24/32 + IEEE
// float) → mono mixdown → rational polyphase FIR resample → pinned-ready
// float32 buffer handed to Python via ctypes (yourmt3_tpu/data/audio_io.py).
//
// Build: `make` in this directory → libymt3audio.so.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

bool parse_wav(const uint8_t* buf, size_t len, WavData* out) {
  if (len < 44 || memcmp(buf, "RIFF", 4) || memcmp(buf + 8, "WAVE", 4))
    return false;
  size_t pos = 12;
  uint16_t fmt_code = 0, n_ch = 0, bits = 0;
  uint32_t sr = 0;
  const uint8_t* data = nullptr;
  size_t data_len = 0;
  while (pos + 8 <= len) {
    const uint8_t* cid = buf + pos;
    uint32_t csz = rd_u32(buf + pos + 4);
    const uint8_t* body = buf + pos + 8;
    if (pos + 8 + csz > len) csz = (uint32_t)(len - pos - 8);
    if (!memcmp(cid, "fmt ", 4) && csz >= 16) {
      fmt_code = rd_u16(body);
      n_ch = rd_u16(body + 2);
      sr = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (fmt_code == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: the real code is the first 2 bytes of
        // the SubFormat GUID at fmt offset 24 (PCM=1, IEEE float=3);
        // assuming PCM would decode float WAVs as garbage.
        if (csz >= 26)
          fmt_code = rd_u16(body + 24);
        else
          return false;  // truncated extensible fmt → Python fallback
      }
    } else if (!memcmp(cid, "data", 4)) {
      data = body;
      data_len = csz;
    }
    pos += 8 + csz + (csz & 1);
  }
  if (!data || !n_ch || !sr || !bits || (bits & 7)) return false;

  size_t bytes_per = bits / 8;
  size_t n_frames = data_len / (bytes_per * n_ch);
  out->samples.resize(n_frames);
  out->sample_rate = (int)sr;
  const float inv_ch = 1.0f / (float)n_ch;
  for (size_t i = 0; i < n_frames; ++i) {
    float acc = 0.f;
    for (int c = 0; c < n_ch; ++c) {
      const uint8_t* p = data + (i * n_ch + c) * bytes_per;
      float v = 0.f;
      if (fmt_code == 3 && bits == 32) {
        float f;
        memcpy(&f, p, 4);
        v = f;
      } else if (fmt_code == 1 && bits == 16) {
        int16_t s = (int16_t)rd_u16(p);
        v = (float)s / 32768.0f;
      } else if (fmt_code == 1 && bits == 24) {
        int32_t s = (int32_t)p[0] | ((int32_t)p[1] << 8) | ((int32_t)p[2] << 16);
        if (s >= (1 << 23)) s -= (1 << 24);
        v = (float)s / 8388608.0f;
      } else if (fmt_code == 1 && bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = (float)s / 2147483648.0f;
      } else if (fmt_code == 1 && bits == 8) {
        v = ((float)p[0] - 128.0f) / 128.0f;
      } else {
        return false;
      }
      acc += v;
    }
    out->samples[i] = acc * inv_ch;
  }
  return true;
}

double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

uint64_t gcd_u64(uint64_t a, uint64_t b) {
  while (b) {
    uint64_t t = a % b;
    a = b;
    b = t;
  }
  return a;
}

// Rational polyphase resample: sr_in → sr_out, Kaiser-windowed sinc.
std::vector<float> resample_poly(const std::vector<float>& x, int sr_in,
                                 int sr_out) {
  if (sr_in == sr_out) return x;
  uint64_t g = gcd_u64(sr_in, sr_out);
  int L = (int)(sr_out / g), M = (int)(sr_in / g);
  // filter: cutoff at min(1/L, 1/M) of Nyquist(upsampled), 24 taps/phase
  int taps_per_phase = 24;
  int n_taps = taps_per_phase * L;
  double fc = 0.5 / std::max(L, M);  // normalized to upsampled rate
  double beta = 8.6;  // ~ -80 dB Kaiser
  std::vector<double> h(n_taps);
  double i0b = bessel_i0(beta);
  int mid = (n_taps - 1) / 2;
  for (int n = 0; n < n_taps; ++n) {
    double t = n - (n_taps - 1) / 2.0;
    double sinc = (t == 0.0) ? 2.0 * fc
                             : std::sin(2.0 * M_PI * fc * t) / (M_PI * t);
    double w = n_taps > 1
                   ? bessel_i0(beta * std::sqrt(1.0 - std::pow(2.0 * t / (n_taps - 1), 2))) / i0b
                   : 1.0;
    h[n] = L * sinc * w;
  }
  (void)mid;
  size_t n_out = (x.size() * (uint64_t)L + M - 1) / M;
  std::vector<float> y(n_out, 0.f);
  // polyphase: output m taken from upsampled index u = m*M; phase = u % L
  for (size_t m = 0; m < n_out; ++m) {
    uint64_t u = (uint64_t)m * M;
    int phase = (int)(u % L);
    int64_t base = (int64_t)(u / L);  // input index of phase-0 tap
    float acc = 0.f;
    // taps for this phase: h[phase + k*L], input x[base - k + taps_center]
    for (int k = 0; k < taps_per_phase; ++k) {
      int hi = phase + k * L;
      int64_t xi = base + taps_per_phase / 2 - k;
      if (xi >= 0 && xi < (int64_t)x.size()) acc += (float)h[hi] * x[xi];
    }
    y[m] = acc;
  }
  return y;
}

}  // namespace

extern "C" {

// Load WAV at `path`, mixdown to mono, resample to target_sr.
// On success: *out = malloc'd float buffer (caller frees via ymt3_free),
// returns n_samples. Returns <= 0 on failure (caller falls back to Python).
long long ymt3_load_wav_resampled(const char* path, int target_sr,
                                  float** out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (fread(buf.data(), 1, sz, f) != (size_t)sz) {
    fclose(f);
    return -2;
  }
  fclose(f);
  WavData wav;
  if (!parse_wav(buf.data(), buf.size(), &wav)) return -3;
  std::vector<float> res = resample_poly(wav.samples, wav.sample_rate, target_sr);
  *out = (float*)malloc(res.size() * sizeof(float));
  if (!*out) return -4;
  memcpy(*out, res.data(), res.size() * sizeof(float));
  return (long long)res.size();
}

void ymt3_free(float* p) { free(p); }

// Segment framing on the native side: audio (n) → (n_seg, seg_len) with
// zero-padded tail (reference slice_padded_array, SURVEY.md C12).
long long ymt3_slice_segments(const float* audio, long long n,
                              long long seg_len, float* out,
                              long long max_segments) {
  long long n_seg = n <= seg_len ? 1 : (n - 1) / seg_len + 1;
  if (n_seg > max_segments) n_seg = max_segments;
  for (long long s = 0; s < n_seg; ++s) {
    long long start = s * seg_len;
    long long take = n - start;
    if (take > seg_len) take = seg_len;
    if (take < 0) take = 0;
    memcpy(out + s * seg_len, audio + start, take * sizeof(float));
    if (take < seg_len)
      memset(out + s * seg_len + take, 0, (seg_len - take) * sizeof(float));
  }
  return n_seg;
}

}  // extern "C"
