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
int rlgr_encode32(const int32_t* seq, size_t n, int flag_signed, uint8_t** out,
                  size_t* out_len);
int rlgr_decode32(const uint8_t* buf, size_t len, int flag_signed,
                  int32_t* seq, size_t n);
int rlgr_encode_batch32(const int32_t* data, const size_t* offsets,
                        const size_t* ns, size_t count, int flag_signed,
                        int n_threads, uint8_t** outs, size_t* out_lens);
int rlgr_decode_batch32(const uint8_t* buf, const size_t* buf_offsets,
                        const size_t* buf_lens, const size_t* ns,
                        const size_t* out_offsets, size_t count,
                        int flag_signed, int n_threads, int32_t* out);
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

  // Batch API: per-job streams byte-identical to single-stream encodes of
  // the same slices, parallel decode reconstructs exactly (forced 4 threads
  // regardless of hardware so the pool path itself is exercised).
  {
    std::mt19937_64 gen(11);
    const size_t kJobs = 13;
    std::vector<int32_t> flat;
    std::vector<size_t> offsets, ns;
    std::uniform_int_distribution<int32_t> val(-500, 500);
    for (size_t j = 0; j < kJobs; j++) {
      offsets.push_back(flat.size());
      size_t n = (j * 977) % 4000;  // includes a zero-length job (j == 0)
      ns.push_back(n);
      for (size_t i = 0; i < n; i++)
        flat.push_back((i % 3) ? 0 : val(gen));
    }
    std::vector<uint8_t*> outs(kJobs, nullptr);
    std::vector<size_t> lens(kJobs, 0);
    CHECK(rlgr_encode_batch32(flat.data(), offsets.data(), ns.data(), kJobs,
                              1, 4, outs.data(), lens.data()) == 0);
    // byte-identity vs single-stream encodes
    std::vector<uint8_t> cat;
    std::vector<size_t> boffs, blens;
    for (size_t j = 0; j < kJobs; j++) {
      uint8_t* one = nullptr;
      size_t one_len = 0;
      CHECK(rlgr_encode32(flat.data() + offsets[j], ns[j], 1, &one,
                          &one_len) == 0);
      CHECK(one_len == lens[j]);
      CHECK(std::memcmp(one, outs[j], one_len) == 0);
      rlgr_buffer_free(one);
      boffs.push_back(cat.size());
      blens.push_back(lens[j]);
      cat.insert(cat.end(), outs[j], outs[j] + lens[j]);
      rlgr_buffer_free(outs[j]);
    }
    std::vector<int32_t> dec(flat.size() + 1, -12345);
    CHECK(rlgr_decode_batch32(cat.data(), boffs.data(), blens.data(),
                              ns.data(), offsets.data(), kJobs, 1, 4,
                              dec.data()) == 0);
    CHECK(std::memcmp(dec.data(), flat.data(),
                      flat.size() * sizeof(int32_t)) == 0);
    CHECK(dec.back() == -12345);  // no overrun
  }

  if (failures == 0) {
    std::printf("native rlgr tests: ALL OK\n");
    return 0;
  }
  std::printf("native rlgr tests: %d FAILURES\n", failures);
  return 1;
}
