// Standalone profiling driver for the native runtime: encode+decode a
// corpus file repeatedly, single thread, so gprof/perf can attribute time.
//
// Build:  g++ -O2 -std=c++17 -march=native -pthread -pg \
//           tools/prof_driver.cpp -o /tmp/prof_driver
// (lzma_core.cpp is #included so its internals are visible to the profiler.)
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "../lzma_tpu/runtime/src/lzma_core.cpp"

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s corpus [greedy|optimal] [reps]\n", argv[0]);
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data((size_t)n);
  if (fread(data.data(), 1, (size_t)n, f) != (size_t)n) return 2;
  fclose(f);

  bool optimal = argc > 2 && !strcmp(argv[2], "optimal");
  int reps = argc > 3 ? atoi(argv[3]) : 3;
  int fb = optimal ? 32 : 8;
  int mf = optimal ? 1 : 3;
  int64_t bs = 1 << 20;
  int64_t nblocks = (n + bs - 1) / bs;
  std::vector<uint8_t> out((size_t)lzt_encode_bound(n) + nblocks * 16);
  std::vector<uint32_t> sizes((size_t)nblocks);
  std::vector<uint8_t> dec((size_t)n);
  for (int r = 0; r < reps; r++) {
    int64_t total = lzt_encode_blocks(data.data(), n, 3, 0, 2, 1u << 20, fb,
                                      mf, optimal ? 1 : 0, bs, 1, out.data(),
                                      (int64_t)out.size(), sizes.data());
    if (total <= 0) { fprintf(stderr, "encode failed\n"); return 1; }
    int64_t off = 0;
    for (int64_t b = 0; b < nblocks; b++) {
      int64_t raw = std::min<int64_t>(bs, n - b * bs);
      int rc = lzt_decode(out.data() + off, sizes[b], 3, 0, 2, 1u << 20,
                          dec.data() + b * bs, raw);
      if (rc != 0) { fprintf(stderr, "decode failed\n"); return 1; }
      off += sizes[b];
    }
    if (memcmp(dec.data(), data.data(), (size_t)n)) {
      fprintf(stderr, "mismatch\n");
      return 1;
    }
  }
  printf("ok\n");
  return 0;
}
