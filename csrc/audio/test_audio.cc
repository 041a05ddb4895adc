// ASAN-instrumented smoke test for the native audio path (SURVEY.md §5.2:
// the C++ host-I/O lib gets sanitizer tests of its own).
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
long long ymt3_load_wav_resampled(const char* path, int target_sr, float** out);
long long ymt3_load_flac_resampled(const char* path, int target_sr, float** out);
void ymt3_free(float* p);
long long ymt3_slice_segments(const float* audio, long long n, long long seg_len,
                              float* out, long long max_segments);
}

static void write_test_wav(const char* path, int sr, int n, float freq) {
  std::vector<int16_t> pcm(n);
  for (int i = 0; i < n; ++i)
    pcm[i] = (int16_t)(0.5f * 32767.0f * sinf(2.0f * (float)M_PI * freq * i / sr));
  FILE* f = fopen(path, "wb");
  uint32_t data_len = n * 2, chunk = 36 + data_len, sr32 = sr, br = sr * 2;
  uint16_t one = 1, ch = 1, ba = 2, bits = 16;
  fwrite("RIFF", 1, 4, f); fwrite(&chunk, 4, 1, f); fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f); uint32_t sixteen = 16; fwrite(&sixteen, 4, 1, f);
  fwrite(&one, 2, 1, f); fwrite(&ch, 2, 1, f); fwrite(&sr32, 4, 1, f);
  fwrite(&br, 4, 1, f); fwrite(&ba, 2, 1, f); fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f); fwrite(&data_len, 4, 1, f);
  fwrite(pcm.data(), 2, n, f);
  fclose(f);
}

int main() {
  // 44.1k 440 Hz sine → 16k; check length ratio and rough energy
  const char* p = "/tmp/ymt3_test.wav";
  write_test_wav(p, 44100, 44100, 440.0f);
  float* out = nullptr;
  long long n = ymt3_load_wav_resampled(p, 16000, &out);
  printf("resampled n=%lld\n", n);
  assert(n > 15900 && n < 16100);
  double e = 0;
  for (long long i = 1000; i < n - 1000; ++i) e += out[i] * out[i];
  double rms = sqrt(e / (n - 2000));
  printf("rms=%.4f (expect ~0.3536)\n", rms);
  assert(fabs(rms - 0.3536) < 0.02);
  // zero-crossing rate ≈ 2*f/sr
  int zc = 0;
  for (long long i = 1001; i < n - 1000; ++i)
    if ((out[i - 1] < 0) != (out[i] < 0)) zc++;
  double freq_est = 0.5 * zc / ((double)(n - 2001) / 16000.0);
  printf("freq≈%.1f Hz\n", freq_est);
  assert(fabs(freq_est - 440.0) < 5.0);

  // slicing
  std::vector<float> seg(3 * 7, -1.f);
  long long ns = ymt3_slice_segments(out, 20, 7, seg.data(), 3);
  assert(ns == 3);
  assert(seg[20] == 0.f);  // zero-padded tail (el 6 of seg 2)
  ymt3_free(out);

  // failure path: bogus file
  float* o2 = nullptr;
  assert(ymt3_load_wav_resampled("/tmp/does_not_exist.wav", 16000, &o2) < 0);

  // FLAC decode under ASAN: committed mid-side FIXED+Rice fixture
  // (1 s: 0.4·sin(439.5 Hz)+noise left, 0.3·sin(660 Hz) right; mono mix
  // rms ≈ sqrt((0.4/√2)^2... measured from the python decoder: 0.2310)
  float* fo = nullptr;
  long long fn = ymt3_load_flac_resampled("testdata/fixture_ms.flac",
                                          16000, &fo);
  printf("flac n=%lld\n", fn);
  assert(fn == 16000);
  double fe = 0.0;
  for (long long i = 0; i < fn; ++i) fe += fo[i] * fo[i];
  double frms = sqrt(fe / fn);
  printf("flac rms=%.4f\n", frms);
  assert(frms > 0.15 && frms < 0.35);
  ymt3_free(fo);
  assert(ymt3_load_flac_resampled("/tmp/nope.flac", 16000, &fo) < 0);
  printf("OK\n");
  return 0;
}
