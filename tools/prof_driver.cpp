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

  if (argc > 2 && !strcmp(argv[2], "cand")) {
    // Profile the CAND optimal parse alone (the hybrid-optimal host
    // half): lists generated once with the exact BT4 finder, then
    // `reps` encode_cand passes dominate the profile.
    int fb = 32;
    int64_t bs = 1 << 18;
    int64_t nblocks = (n + bs - 1) / bs;
    std::vector<int32_t> cl, cd;
    std::vector<int64_t> coff, pbase;
    std::vector<int32_t> md(700);
    for (int64_t b = 0; b < nblocks; b++) {
      int64_t off = b * bs;
      int64_t len = std::min(bs, n - off);
      MatchFinder mf(data.data() + off, (int32_t)len, (int32_t)bs, fb,
                     MatchFinder::BT4);
      pbase.push_back((int64_t)coff.size());
      coff.push_back((int64_t)cl.size());
      for (int64_t p = 0; p < len; p++) {
        int cnt = mf.find_matches(md.data());
        for (int i = 0; i < cnt; i++) {
          cl.push_back(md[2 * i]);
          cd.push_back(md[2 * i + 1]);
        }
        coff.push_back((int64_t)cl.size());
      }
    }
    EncParams p;
    p.lc = 3; p.lp = 0; p.pb = 2;
    p.dict_size = (uint32_t)bs;
    p.fb = fb; p.mf = 1; p.eos = 0; p.optimal = 1;
    Encoder enc(p);
    size_t total = 0;
    for (int r = 0; r < reps; r++) {
      for (int64_t b = 0; b < nblocks; b++) {
        int64_t off = b * bs;
        int64_t len = std::min(bs, n - off);
        std::vector<uint8_t> out_s;
        enc.encode_cand(data.data() + off, (size_t)len, cl.data(), cd.data(),
                        coff.data() + pbase[b], &out_s);
        total += out_s.size();
      }
    }
    printf("ok cand total=%zu\n", total);
    return 0;
  }
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
