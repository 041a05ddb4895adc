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

// ---------------------------------------------------------------------------
// First-party FLAC decoder (subset: 8-24 bit, CONSTANT/VERBATIM/FIXED/LPC
// subframes, 4/5-bit Rice partitions, wasted bits, left-side/right-side/
// mid-side stereo). Slakh2100 — a headline eval dataset — ships FLAC; the
// reference decodes it through libsndfile/ffmpeg (SURVEY.md C12/C16).
// Mirrors yourmt3_tpu/data/flac.py (the always-available Python fallback).
// CRCs are skipped (trusted local datasets).
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data;
  size_t len;       // bytes
  uint64_t pos = 0; // bits

  bool ok(uint64_t need_bits) const { return pos + need_bits <= len * 8; }

  uint64_t read(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) {
      uint8_t byte = (pos >> 3) < len ? data[pos >> 3] : 0;
      v = (v << 1) | ((byte >> (7 - (pos & 7))) & 1);
      ++pos;
    }
    return v;
  }
  int64_t read_signed(int n) {
    uint64_t v = read(n);
    if (n && (v & (1ull << (n - 1)))) return (int64_t)v - (1ll << n);
    return (int64_t)v;
  }
  int unary() {
    int n = 0;
    while (pos < len * 8 && !((data[pos >> 3] >> (7 - (pos & 7))) & 1)) {
      ++n;
      ++pos;
    }
    if (pos >= len * 8) return -1;
    ++pos;
    return n;
  }
  void align() { pos = (pos + 7) & ~7ull; }
  void skip_utf8() {
    uint64_t first = read(8);
    int extra = 0;
    while ((first << extra) & 0x80 && extra < 7) ++extra;
    for (int i = 1; i < extra; ++i) read(8);
  }
};

bool flac_residual(BitReader* br, int blocksize, int pred_order,
                   std::vector<int64_t>* out) {
  int method = (int)br->read(2);
  if (method > 1) return false;
  int plen = method ? 5 : 4;
  int escape = (1 << plen) - 1;
  int porder = (int)br->read(4);
  int nparts = 1 << porder;
  for (int p = 0; p < nparts; ++p) {
    int count = (blocksize >> porder) - (p == 0 ? pred_order : 0);
    if (count < 0) return false;
    int param = (int)br->read(plen);
    if (param == escape) {
      int raw = (int)br->read(5);
      for (int i = 0; i < count; ++i)
        out->push_back(raw ? br->read_signed(raw) : 0);
    } else {
      for (int i = 0; i < count; ++i) {
        if (!br->ok(1)) return false;
        int q = br->unary();
        if (q < 0) return false;
        uint64_t v = ((uint64_t)q << param) | (param ? br->read(param) : 0);
        out->push_back((int64_t)(v >> 1) ^ -(int64_t)(v & 1));
      }
    }
  }
  return true;
}

static const int kFixedCoef[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool flac_subframe(BitReader* br, int blocksize, int bps,
                   std::vector<int64_t>* out) {
  if (br->read(1)) return false;
  int type = (int)br->read(6);
  int wasted = 0;
  if (br->read(1)) {
    int u = br->unary();
    if (u < 0) return false;
    wasted = u + 1;
    bps -= wasted;
  }
  out->clear();
  out->reserve(blocksize);
  if (type == 0) {  // CONSTANT
    int64_t v = br->read_signed(bps);
    out->assign(blocksize, v);
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out->push_back(br->read_signed(bps));
  } else if (type >= 8 && type <= 12) {  // FIXED
    int order = type - 8;
    for (int i = 0; i < order; ++i) out->push_back(br->read_signed(bps));
    std::vector<int64_t> resid;
    if (!flac_residual(br, blocksize, order, &resid)) return false;
    for (int64_t r : resid) {
      int64_t pred = 0;
      size_t n = out->size();
      for (int j = 0; j < order; ++j)
        pred += (int64_t)kFixedCoef[order][j] * (*out)[n - 1 - j];
      out->push_back(pred + r);
    }
  } else if (type >= 32) {  // LPC
    int order = (type & 31) + 1;
    for (int i = 0; i < order; ++i) out->push_back(br->read_signed(bps));
    int precision = (int)br->read(4) + 1;
    if (precision == 16) return false;  // escape value
    int shift = (int)br->read_signed(5);
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br->read_signed(precision);
    std::vector<int64_t> resid;
    if (!flac_residual(br, blocksize, order, &resid)) return false;
    for (int64_t r : resid) {
      int64_t acc = 0;
      size_t n = out->size();
      for (int j = 0; j < order; ++j) acc += coef[j] * (*out)[n - 1 - j];
      out->push_back((acc >> shift) + r);
    }
  } else {
    return false;
  }
  if (wasted)
    for (auto& s : *out) s <<= wasted;
  return (int)out->size() == blocksize;
}

static const int kBlocksizeCode[16] = {0,   192,  576,   1152,  2304, 4608,
                                       -8,  -16,  256,   512,   1024, 2048,
                                       4096, 8192, 16384, 32768};
static const int kSampleSizeCode[8] = {0, 8, 12, 0, 16, 20, 24, 32};

bool parse_flac(const uint8_t* buf, size_t len, WavData* out) {
  if (len < 42 || memcmp(buf, "fLaC", 4)) return false;
  size_t off = 4;
  int sr = 0, channels = 0, bps = 0;
  uint64_t total = 0;
  while (off + 4 <= len) {
    uint8_t hdr = buf[off];
    bool last = hdr & 0x80;
    int btype = hdr & 0x7F;
    uint32_t blen = ((uint32_t)buf[off + 1] << 16) |
                    ((uint32_t)buf[off + 2] << 8) | buf[off + 3];
    if (off + 4 + blen > len) return false;
    if (btype == 0 && blen >= 34) {
      BitReader si{buf + off + 4, blen};
      si.read(16); si.read(16); si.read(24); si.read(24);
      sr = (int)si.read(20);
      channels = (int)si.read(3) + 1;
      bps = (int)si.read(5) + 1;
      total = si.read(36);
    }
    off += 4 + blen;
    if (last) break;
  }
  if (!sr || !channels || bps < 8 || bps > 24) return false;

  BitReader br{buf, len};
  br.pos = off * 8;
  std::vector<std::vector<int64_t>> chans(channels);
  std::vector<std::vector<int64_t>> subs;
  uint64_t decoded = 0;
  while ((total == 0 || decoded < total) && br.ok(48)) {
    if (br.read(14) != 0x3FFE) return false;
    br.read(2);  // reserved + blocking strategy
    int bs_code = (int)br.read(4);
    int sr_code = (int)br.read(4);
    int chan_asgn = (int)br.read(4);
    int ss_code = (int)br.read(3);
    br.read(1);
    br.skip_utf8();
    int blocksize;
    if (bs_code == 6) blocksize = (int)br.read(8) + 1;
    else if (bs_code == 7) blocksize = (int)br.read(16) + 1;
    else if (bs_code == 0) return false;
    else blocksize = kBlocksizeCode[bs_code];
    if (sr_code == 12) br.read(8);
    else if (sr_code == 13 || sr_code == 14) br.read(16);
    int fbps = kSampleSizeCode[ss_code] ? kSampleSizeCode[ss_code] : bps;
    br.read(8);  // header CRC-8
    int nsub = chan_asgn <= 7 ? chan_asgn + 1 : 2;
    if (nsub != channels) return false;
    subs.assign(nsub, {});
    for (int c = 0; c < nsub; ++c) {
      int sbps = fbps;
      if ((chan_asgn == 8 && c == 1) || (chan_asgn == 9 && c == 0) ||
          (chan_asgn == 10 && c == 1))
        sbps += 1;  // side channel carries one extra bit
      if (!flac_subframe(&br, blocksize, sbps, &subs[c])) return false;
    }
    br.align();
    br.read(16);  // frame CRC-16
    if (chan_asgn == 8) {  // left/side → L, R=L-s
      for (int i = 0; i < blocksize; ++i) {
        chans[0].push_back(subs[0][i]);
        chans[1].push_back(subs[0][i] - subs[1][i]);
      }
    } else if (chan_asgn == 9) {  // side/right → L=R+s, R
      for (int i = 0; i < blocksize; ++i) {
        chans[0].push_back(subs[1][i] + subs[0][i]);
        chans[1].push_back(subs[1][i]);
      }
    } else if (chan_asgn == 10) {  // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int64_t m = (subs[0][i] << 1) | (subs[1][i] & 1);
        chans[0].push_back((m + subs[1][i]) >> 1);
        chans[1].push_back((m - subs[1][i]) >> 1);
      }
    } else {
      for (int c = 0; c < nsub; ++c)
        chans[c].insert(chans[c].end(), subs[c].begin(), subs[c].end());
    }
    decoded += blocksize;
  }
  if (total && decoded < total) return false;

  size_t n = total ? (size_t)total : chans[0].size();
  out->samples.resize(n);
  out->sample_rate = sr;
  const float scale = 1.0f / (float)(1u << (bps - 1));
  const float inv_ch = 1.0f / (float)channels;
  for (size_t i = 0; i < n; ++i) {
    float acc = 0.f;
    for (int c = 0; c < channels; ++c) acc += (float)chans[c][i] * scale;
    out->samples[i] = acc * inv_ch;
  }
  return true;
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

// Load FLAC at `path`, mixdown to mono, resample to target_sr. Same
// contract as ymt3_load_wav_resampled (returns <=0 → Python fallback).
long long ymt3_load_flac_resampled(const char* path, int target_sr,
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
  WavData flac;
  if (!parse_flac(buf.data(), buf.size(), &flac)) return -3;
  std::vector<float> res =
      resample_poly(flac.samples, flac.sample_rate, target_sr);
  *out = (float*)malloc(res.size() * sizeof(float));
  if (!*out) return -4;
  memcpy(*out, res.data(), res.size() * sizeof(float));
  return (long long)res.size();
}

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
