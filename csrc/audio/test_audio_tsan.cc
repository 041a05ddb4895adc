// TSAN test (SURVEY.md §5.2): the audio lib is called concurrently from
// the Python prefetch threads via ctypes — verify it is race-free.
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
long long ymt3_load_wav_resampled(const char* path, int target_sr, float** out);
void ymt3_free(float* p);
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
  const char* p = "/tmp/ymt3_tsan.wav";
  write_test_wav(p, 44100, 22050, 440.0f);
  std::vector<std::thread> ts;
  for (int t = 0; t < 4; ++t) {
    ts.emplace_back([p] {
      for (int i = 0; i < 8; ++i) {
        float* out = nullptr;
        long long n = ymt3_load_wav_resampled(p, 16000, &out);
        assert(n > 7000);
        ymt3_free(out);
      }
    });
  }
  for (auto& t : ts) t.join();
  printf("TSAN OK\n");
  return 0;
}
