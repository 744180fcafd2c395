// PCLMULQDQ-folded CRC-32 (gzip polynomial 0xEDB88320, zlib convention).
//
// Every inflated BGZF block is CRC-verified (svio.cc); with the fast
// inflate path the table-driven zlib crc32 became ~15% of window decode.
// This is the classic carry-less-multiply folding scheme from the Intel
// whitepaper "Fast CRC Computation for Generic Polynomials Using PCLMULQDQ"
// (the same constants and reduction used by zlib-ng and chromium's zlib):
// fold 64-byte stripes with k1/k2, collapse to one 128-bit lane with k3/k4,
// reduce to 64 then 32 bits via k5 + Barrett reduction with the reflected
// polynomial pair.
//
// Runtime-dispatched: the folded path compiles with a per-function target
// attribute and is taken only when the CPU reports PCLMUL+SSE4.1, so the
// library binary stays generic. Tail bytes (< 64) and non-PCLMUL hosts use
// zlib's crc32. Exactness vs zlib is fuzz-tested over lengths/alignments in
// tests/test_fast_inflate.py::test_crc32_matches_zlib.
//
// C ABI: svio_crc32(crc, buf, len) == zlib crc32(crc, buf, len).

#include <cstdint>
#include <cstddef>
#include <zlib.h>

#if defined(__x86_64__) || defined(__i386__)
#include <immintrin.h>
#define SVIO_CRC_PCLMUL 1
#endif

namespace {

#ifdef SVIO_CRC_PCLMUL

// Bit-reflected domain constants (Intel paper / chromium crc32_simd.c).
alignas(16) const uint64_t k1k2[] = {0x0154442bd4, 0x01c6e41596};
alignas(16) const uint64_t k3k4[] = {0x01751997d0, 0x00ccaa009e};
alignas(16) const uint64_t k5k0[] = {0x0163cd6124, 0x0000000000};
alignas(16) const uint64_t poly[] = {0x01db710641, 0x01f7011641};

// Internal-state CRC fold over len >= 64 bytes, len % 64 == 0.
// `crc` is the raw (pre-conditioned) register, i.e. zlib_crc ^ 0xffffffff.
__attribute__((target("pclmul,sse4.1")))
uint32_t crc32_fold_pclmul(uint32_t crc, const uint8_t* buf, size_t len) {
  __m128i x0, x1, x2, x3, x4, x5, x6, x7, x8, y5, y6, y7, y8;

  x1 = _mm_loadu_si128((const __m128i*)(buf + 0x00));
  x2 = _mm_loadu_si128((const __m128i*)(buf + 0x10));
  x3 = _mm_loadu_si128((const __m128i*)(buf + 0x20));
  x4 = _mm_loadu_si128((const __m128i*)(buf + 0x30));
  x1 = _mm_xor_si128(x1, _mm_cvtsi32_si128((int)crc));
  x0 = _mm_load_si128((const __m128i*)k1k2);
  buf += 64;
  len -= 64;

  while (len >= 64) {                    // parallel fold 4 lanes
    x5 = _mm_clmulepi64_si128(x1, x0, 0x00);
    x6 = _mm_clmulepi64_si128(x2, x0, 0x00);
    x7 = _mm_clmulepi64_si128(x3, x0, 0x00);
    x8 = _mm_clmulepi64_si128(x4, x0, 0x00);
    x1 = _mm_clmulepi64_si128(x1, x0, 0x11);
    x2 = _mm_clmulepi64_si128(x2, x0, 0x11);
    x3 = _mm_clmulepi64_si128(x3, x0, 0x11);
    x4 = _mm_clmulepi64_si128(x4, x0, 0x11);
    y5 = _mm_loadu_si128((const __m128i*)(buf + 0x00));
    y6 = _mm_loadu_si128((const __m128i*)(buf + 0x10));
    y7 = _mm_loadu_si128((const __m128i*)(buf + 0x20));
    y8 = _mm_loadu_si128((const __m128i*)(buf + 0x30));
    x1 = _mm_xor_si128(_mm_xor_si128(x1, x5), y5);
    x2 = _mm_xor_si128(_mm_xor_si128(x2, x6), y6);
    x3 = _mm_xor_si128(_mm_xor_si128(x3, x7), y7);
    x4 = _mm_xor_si128(_mm_xor_si128(x4, x8), y8);
    buf += 64;
    len -= 64;
  }

  x0 = _mm_load_si128((const __m128i*)k3k4);  // collapse to one lane
  x5 = _mm_clmulepi64_si128(x1, x0, 0x00);
  x1 = _mm_clmulepi64_si128(x1, x0, 0x11);
  x1 = _mm_xor_si128(_mm_xor_si128(x1, x2), x5);
  x5 = _mm_clmulepi64_si128(x1, x0, 0x00);
  x1 = _mm_clmulepi64_si128(x1, x0, 0x11);
  x1 = _mm_xor_si128(_mm_xor_si128(x1, x3), x5);
  x5 = _mm_clmulepi64_si128(x1, x0, 0x00);
  x1 = _mm_clmulepi64_si128(x1, x0, 0x11);
  x1 = _mm_xor_si128(_mm_xor_si128(x1, x4), x5);

  // 128 -> 64 bits
  x2 = _mm_clmulepi64_si128(x1, x0, 0x10);
  x3 = _mm_setr_epi32(~0, 0, ~0, 0);
  x1 = _mm_srli_si128(x1, 8);
  x1 = _mm_xor_si128(x1, x2);
  x0 = _mm_loadl_epi64((const __m128i*)k5k0);
  x2 = _mm_srli_si128(x1, 4);
  x1 = _mm_and_si128(x1, x3);
  x1 = _mm_clmulepi64_si128(x1, x0, 0x00);
  x1 = _mm_xor_si128(x1, x2);

  // Barrett reduce 64 -> 32 bits
  x0 = _mm_load_si128((const __m128i*)poly);
  x2 = _mm_and_si128(x1, x3);
  x2 = _mm_clmulepi64_si128(x2, x0, 0x10);
  x2 = _mm_and_si128(x2, x3);
  x2 = _mm_clmulepi64_si128(x2, x0, 0x00);
  x1 = _mm_xor_si128(x1, x2);
  return (uint32_t)_mm_extract_epi32(x1, 1);
}

bool pclmul_supported() {
  static const bool ok = __builtin_cpu_supports("pclmul") &&
                         __builtin_cpu_supports("sse4.1");
  return ok;
}

#endif  // SVIO_CRC_PCLMUL

}  // namespace

extern "C" uint32_t svio_crc32(uint32_t crc, const uint8_t* buf, size_t len) {
#ifdef SVIO_CRC_PCLMUL
  if (len >= 64 && pclmul_supported()) {
    uint32_t c = crc ^ 0xffffffffu;            // zlib -> internal state
    size_t n = len & ~(size_t)63;              // 64-byte multiple
    c = crc32_fold_pclmul(c, buf, n);
    // zlib handles the < 64-byte tail; (c ^ ~0) round-trips the state
    return (uint32_t)crc32(c ^ 0xffffffffu, buf + n, (uInt)(len - n));
  }
#endif
  return (uint32_t)crc32(crc, buf, (uInt)len);
}
