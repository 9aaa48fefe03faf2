// Native unit tests for the RLGR coder (no framework; assert-based, the
// counterpart of the reference's Catch2 C++ tests which only covered a demo
// math lib — these cover the actual coder).
//
// Build + run: make -C raht3dgs_tpu/native test

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

extern "C" {
int rlgr_encode(const int64_t* seq, size_t n, int flag_signed, uint8_t** out,
                size_t* out_len);
int rlgr_decode(const uint8_t* buf, size_t len, int flag_signed, int64_t* seq,
                size_t n);
void rlgr_buffer_free(uint8_t* buf);
int gr_encode_one(uint64_t value, unsigned k, uint8_t** out, size_t* out_len);
uint64_t gr_decode_one(const uint8_t* buf, size_t len, unsigned k);
}

static int failures = 0;
#define CHECK(cond)                                                      \
  do {                                                                   \
    if (!(cond)) {                                                       \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      failures++;                                                        \
    }                                                                    \
  } while (0)

static void roundtrip(const std::vector<int64_t>& seq, int flag_signed) {
  uint8_t* buf = nullptr;
  size_t len = 0;
  CHECK(rlgr_encode(seq.data(), seq.size(), flag_signed, &buf, &len) == 0);
  std::vector<int64_t> out(seq.size(), -777);
  CHECK(rlgr_decode(buf, len, flag_signed, out.data(), out.size()) == 0);
  CHECK(out == seq);
  rlgr_buffer_free(buf);
}

int main() {
  // GR codeword roundtrip across k values incl. the 32-bit escape
  for (unsigned k = 0; k <= 8; k++) {
    for (uint64_t v : {0ull, 1ull, 31ull, 32ull, 1000ull, (1ull << 31)}) {
      uint8_t* buf = nullptr;
      size_t len = 0;
      CHECK(gr_encode_one(v, k, &buf, &len) == 0);
      CHECK(gr_decode_one(buf, len, k) == v);
      rlgr_buffer_free(buf);
    }
  }

  // Edge sequences
  roundtrip({}, 1);
  roundtrip({0}, 1);
  roundtrip({5}, 1);
  roundtrip(std::vector<int64_t>(10000, 0), 1);
  roundtrip({-3, 0, 0, 0, 7, 0, 0, -1}, 1);
  roundtrip({INT32_MAX, INT32_MIN, 0, 0, 1}, 1);

  // Random distributions, signed and unsigned
  std::mt19937_64 gen(7);
  for (int trial = 0; trial < 20; trial++) {
    std::vector<int64_t> v(5000, 0);
    std::uniform_int_distribution<int> idx(0, 4999);
    std::uniform_int_distribution<int64_t> val(-100000, 100000);
    int nz = 1 << (trial % 12);
    for (int i = 0; i < nz; i++) v[idx(gen)] = val(gen);
    roundtrip(v, 1);
    for (auto& x : v) x = std::llabs(x);
    roundtrip(v, 0);
  }

  // Compression sanity: sparse data far below raw size
  {
    std::vector<int64_t> v(100000, 0);
    for (int i = 0; i < 500; i++) v[(i * 997) % v.size()] = (i % 7) - 3;
    uint8_t* buf = nullptr;
    size_t len = 0;
    rlgr_encode(v.data(), v.size(), 1, &buf, &len);
    CHECK(len < v.size() / 8);
    rlgr_buffer_free(buf);
  }

  if (failures == 0) {
    std::printf("native rlgr tests: ALL OK\n");
    return 0;
  }
  std::printf("native rlgr tests: %d FAILURES\n", failures);
  return 1;
}
