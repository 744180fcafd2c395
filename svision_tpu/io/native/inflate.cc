// Fast raw-DEFLATE (RFC 1951) decoder for BGZF blocks.
//
// BGZF decode is the #1 cost of the host pipeline (~80% of collection time;
// system zlib measured 590 MB/s on sim BAMs). This decoder exploits what the
// BGZF framing guarantees — the exact inflated size is known up front, blocks
// are <= 64 KiB — to skip all streaming/allocation machinery:
//
//   * 64-bit bit buffer refilled 8 bytes at a time (caller pads input by 8)
//   * one-level 10-bit Huffman table with libdeflate-style packed entries:
//     a literal entry carries the decoded byte, a length/distance entry
//     carries (base value, extra-bit count), so the hot loop consumes the
//     code bits AND its extra bits with one table lookup + one shift — no
//     per-symbol base/extra array walks. Rare >10-bit codes take a
//     canonical bit-by-bit slow path (no subtables built per block)
//   * match copy specialized for the patterns BAM payloads produce:
//     dist==1 -> memset (quality-score runs), dist>=8 -> unconditional
//     8-byte word copies that overshoot into the caller's 8-byte output
//     slack (no tail loop), else pattern doubling
//
// The caller (svio.cc BgzfCursor) verifies the gzip ISIZE matches and falls
// back to zlib on any error return, so a decode bug degrades to the old
// speed, never to wrong bytes. Output equality vs zlib is fuzz-tested over
// compression levels and payload shapes in tests/test_fast_inflate.py.
//
// C ABI: svio_inflate(in, in_len, out, out_len) -> 0 ok / <0 error.
// `in` MUST have 8 readable bytes of slack past in_len; `out` MUST have 32
// writable bytes of slack past out_len (both arranged by the caller).

#include <cstdint>
#include <cstring>

namespace {

constexpr int kTableBits = 10;
constexpr int kTableSize = 1 << kTableBits;

// Packed fast-table entry (32-bit):
//   bits  0..4   code length in bits (0 only in an all-zero "slow" entry)
//   bits  8..12  extra-bit count (length/distance alphabets)
//   bits 16..31  payload: literal byte / symbol id / length base / dist base
//   bit  31      F_LIT  (literal or plain-symbol entry; payload = symbol)
//   bit  30      F_EOB  (end-of-block symbol)
//   bit  29      F_2LIT (two literals packed: byte1 bits 16..23, byte2 8..15,
//                bits 0..4 = combined code length — see combine_literals)
// Distance-alphabet entries use no flag bits (base <= 24577 fits bits 16..30
// and code length >= 1 keeps valid entries nonzero). Length entries carry a
// base <= 258 (bits 16..24), so bits 29..31 are zero there and the flag test
// is unambiguous on the litlen table.
constexpr uint32_t F_LIT = 1u << 31;
constexpr uint32_t F_EOB = 1u << 30;
constexpr uint32_t F_2LIT = 1u << 29;

enum Alphabet { ALPHA_SYMS, ALPHA_LITLEN, ALPHA_DIST };

const uint16_t kLenBase[29] = {3,  4,  5,  6,  7,  8,  9,  10, 11,  13,
                               15, 17, 19, 23, 27, 31, 35, 43, 51,  59,
                               67, 83, 99, 115, 131, 163, 195, 227, 258};
const uint8_t kLenExtra[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
                               2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
const uint16_t kDistBase[30] = {1,    2,    3,    4,    5,    7,     9,    13,
                                17,   25,   33,   49,   65,   97,    129,  193,
                                257,  385,  513,  769,  1025, 1537,  2049, 3073,
                                4097, 6145, 8193, 12289, 16385, 24577};
const uint8_t kDistExtra[30] = {0, 0, 0,  0,  1,  1,  2,  2,  3,  3,
                                4, 4, 5,  5,  6,  6,  7,  7,  8,  8,
                                9, 9, 10, 10, 11, 11, 12, 12, 13, 13};
const uint8_t kClOrder[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                              11, 4, 12, 3, 13, 2, 14, 1, 15};

// Canonical-Huffman decoder state for one alphabet.
struct Huff {
  uint32_t fast[kTableSize];  // packed entries; 0 -> slow path
  // canonical slow-path tables
  uint16_t count[16];    // number of codes of each length
  uint16_t first[16];    // first canonical code of each length (MSB-first)
  uint16_t offset[16];   // index into sorted[] of first symbol of each length
  uint16_t sorted[288];  // symbols ordered by (code length, symbol)
  int max_len;

  static uint32_t pack(Alphabet a, uint32_t sym, uint32_t l) {
    switch (a) {
      case ALPHA_LITLEN:
        if (sym < 256) return (sym << 16) | F_LIT | l;
        if (sym == 256) return F_EOB | l;
        if (sym - 257 >= 29) return 0;  // invalid litlen symbol -> slow/error
        return ((uint32_t)kLenBase[sym - 257] << 16) |
               ((uint32_t)kLenExtra[sym - 257] << 8) | l;
      case ALPHA_DIST:
        if (sym >= 30) return 0;
        return ((uint32_t)kDistBase[sym] << 16) |
               ((uint32_t)kDistExtra[sym] << 8) | l;
      default:
        return (sym << 16) | F_LIT | l;
    }
  }

  // lens[i] = code length of symbol i (0 = unused). Returns false on an
  // over-subscribed code (corrupt stream); incomplete codes are permitted
  // (DEFLATE's fixed distance tree covers 30 of 32 slots).
  bool build(const uint8_t* lens, int n, Alphabet alpha) {
    memset(count, 0, sizeof(count));
    for (int i = 0; i < n; i++) count[lens[i]]++;
    count[0] = 0;
    max_len = 0;
    for (int l = 1; l <= 15; l++)
      if (count[l]) max_len = l;
    // Kraft check: reject over-subscribed codes. Incomplete codes have no
    // fast-table entry and no canonical match, so a stream referencing the
    // unused code space fails at decode time.
    int left = 1;
    for (int l = 1; l <= 15; l++) {
      left <<= 1;
      left -= count[l];
      if (left < 0) return false;  // over-subscribed
    }
    uint16_t code = 0;
    int off = 0;
    for (int l = 1; l <= 15; l++) {
      first[l] = code;
      offset[l] = (uint16_t)off;
      code = (uint16_t)((code + count[l]) << 1);
      off += count[l];
    }
    int pos[16];
    for (int l = 1; l <= 15; l++) pos[l] = offset[l];
    for (int i = 0; i < n; i++)
      if (lens[i]) sorted[pos[lens[i]]++] = (uint16_t)i;

    memset(fast, 0, sizeof(fast));
    // fill fast table: codes are MSB-first in the spec but the stream feeds
    // LSB-first, so a code of length l occupies the bit-reversed low l bits
    for (int l = 1; l <= 15 && l <= kTableBits; l++) {
      uint16_t c = first[l];
      for (int k = 0; k < count[l]; k++, c++) {
        uint16_t sym = sorted[offset[l] + k];
        // bit-reverse c over l bits
        uint32_t rev = 0;
        for (int b = 0; b < l; b++) rev |= ((c >> b) & 1u) << (l - 1 - b);
        uint32_t entry = pack(alpha, sym, (uint32_t)l);
        for (uint32_t idx = rev; idx < kTableSize; idx += (1u << l))
          fast[idx] = entry;
      }
    }
    if (alpha == ALPHA_LITLEN) combine_literals();
    return true;
  }

  // Pack two consecutive literals into one table entry where both codes fit
  // in kTableBits. BAM payloads are literal-dense (4-bit-packed sequence
  // bytes draw from ~16 common values, so their codes run 4-6 bits at BGZF
  // level 1): most literal pairs decode with ONE lookup, halving the
  // hot-loop dependency chain on the dominant byte class. Exact, not
  // speculative — Huffman codes are prefix-free, so when the second entry's
  // code length fits entirely inside the remaining known bits it IS the
  // next symbol.
  void combine_literals() {
    // descending: idx >> l1 < idx, so the second-symbol lookup always sees
    // an original (not yet combined) entry
    for (int32_t idx = kTableSize - 1; idx >= 0; idx--) {
      uint32_t e = fast[idx];
      if (!(e & F_LIT)) continue;
      uint32_t l1 = e & 31;
      if (l1 >= kTableBits) continue;
      uint32_t e2 = fast[idx >> l1];
      if (!(e2 & F_LIT) || (e2 & F_2LIT)) continue;
      uint32_t l2 = e2 & 31;
      if (l1 + l2 > kTableBits) continue;
      fast[idx] = F_LIT | F_2LIT | (e & 0xff0000u) |
                  (((e2 >> 16) & 0xffu) << 8) | (l1 + l2);
    }
  }
};

struct Bits {
  const uint8_t* in;
  const uint8_t* end;   // logical end (slack lies beyond)
  uint64_t hold = 0;
  int nbits = 0;
  int ghost_bits = 0;   // zero bits fed past `end`; consuming them = error

  inline void refill() {
    while (nbits < 56) {
      if (in >= end) {
        // feed zero bits; the final check rejects decodes that consumed them
        nbits += 8;
        ghost_bits += 8;
        continue;
      }
      hold |= (uint64_t)(*in++) << nbits;
      nbits += 8;
    }
  }

  inline void refill_fast() {
    if (end - in >= 8 && nbits < 56) {
      uint64_t w;
      memcpy(&w, in, 8);
      hold |= w << nbits;
      int take = (63 - nbits) >> 3;
      in += take;
      nbits += take << 3;
    } else {
      refill();
    }
  }

  inline uint32_t peek(int n) const { return (uint32_t)hold & ((1u << n) - 1); }

  inline void drop(int n) {
    hold >>= n;
    nbits -= n;
  }

  inline uint32_t get(int n) {
    if (n == 0) return 0;
    uint32_t v = peek(n);
    drop(n);
    return v;
  }
};

// Slow path: walk canonical codes MSB-first, bit by bit (codes > kTableBits).
int decode_sym_slow(Bits& b, const Huff& h) {
  uint32_t code = 0;
  for (int l = 1; l <= h.max_len; l++) {
    code = (code << 1) | (b.peek(1));
    b.drop(1);
    int idx = (int)code - (int)h.first[l];
    if (idx >= 0 && idx < h.count[l]) return h.sorted[h.offset[l] + idx];
  }
  return -1;
}

inline int decode_sym(Bits& b, const Huff& h) {
  uint32_t e = h.fast[b.peek(kTableBits)];
  if (e) {
    b.drop(e & 31);
    return (int)((e >> 16) & 0x3fff);  // strip F_LIT/F_EOB flag bits
  }
  return decode_sym_slow(b, h);
}

}  // namespace

extern "C" {

// Returns 0 on success (exactly out_len bytes written), negative on error.
int svio_inflate(const uint8_t* in, int64_t in_len, uint8_t* out,
                 int64_t out_len) {
  // Decoder state lives on the stack (~9.6 KB): reentrant across
  // block-parallel inflate threads with zero TLS machinery. The previous
  // thread_local globals cost ~28% inside the dlopen'd shared library —
  // global-dynamic TLS puts __tls_get_addr reloads on the hot loop's
  // table accesses (a static-linked build was initial-exec and unaffected,
  // which hid the tax from the standalone benchmarks).
  Huff g_litlen, g_dist;
  Bits b{in, in + in_len};
  uint8_t* const out_base = out;
  uint8_t* const out_end = out + out_len;

  for (;;) {
    b.refill_fast();
    uint32_t bfinal = b.get(1);
    uint32_t btype = b.get(2);

    if (btype == 0) {
      // stored: byte-align, LEN/NLEN, raw copy — all through the bit reader
      // so ghost-bit accounting stays uniform (consuming a ghost byte shows
      // up at the final nbits >= ghost_bits check)
      b.drop(b.nbits & 7);
      b.refill();
      uint32_t len = b.get(16);
      uint32_t nlen = b.get(16);
      if ((len ^ 0xffffu) != nlen) return -2;
      if (out + len > out_end) return -3;
      // drain whole bytes still held in the bit buffer (multiple of 8 bits
      // after alignment), then bulk-copy the rest straight from the input
      while (len && b.nbits >= 8) {
        *out++ = (uint8_t)b.get(8);
        len--;
      }
      if (len) {
        if (b.in + len > b.end) return -3;
        memcpy(out, b.in, len);
        out += len;
        b.in += len;
      }
    } else if (btype == 1 || btype == 2) {
      if (btype == 1) {
        // fixed trees
        uint8_t ll[288], dl[30];
        for (int i = 0; i < 144; i++) ll[i] = 8;
        for (int i = 144; i < 256; i++) ll[i] = 9;
        for (int i = 256; i < 280; i++) ll[i] = 7;
        for (int i = 280; i < 288; i++) ll[i] = 8;
        for (int i = 0; i < 30; i++) dl[i] = 5;
        if (!g_litlen.build(ll, 288, ALPHA_LITLEN) ||
            !g_dist.build(dl, 30, ALPHA_DIST))
          return -4;
      } else {
        // dynamic trees
        uint32_t hlit = b.get(5) + 257;
        uint32_t hdist = b.get(5) + 1;
        uint32_t hclen = b.get(4) + 4;
        if (hlit > 286 || hdist > 30) return -5;
        uint8_t cl_lens[19];
        memset(cl_lens, 0, sizeof(cl_lens));
        for (uint32_t i = 0; i < hclen; i++) {
          b.refill_fast();
          cl_lens[kClOrder[i]] = (uint8_t)b.get(3);
        }
        Huff cl;
        if (!cl.build(cl_lens, 19, ALPHA_SYMS)) return -6;
        uint8_t lens[288 + 30];
        uint32_t n = 0, total = hlit + hdist;
        while (n < total) {
          b.refill_fast();
          int sym = decode_sym(b, cl);
          if (sym < 0) return -7;
          if (sym < 16) {
            lens[n++] = (uint8_t)sym;
          } else if (sym == 16) {
            if (n == 0) return -8;
            uint32_t rep = 3 + b.get(2);
            if (n + rep > total) return -8;
            uint8_t prev = lens[n - 1];
            while (rep--) lens[n++] = prev;
          } else if (sym == 17) {
            uint32_t rep = 3 + b.get(3);
            if (n + rep > total) return -9;
            while (rep--) lens[n++] = 0;
          } else {
            uint32_t rep = 11 + b.get(7);
            if (n + rep > total) return -10;
            while (rep--) lens[n++] = 0;
          }
        }
        if (lens[256] == 0) return -11;  // no EOB code
        if (!g_litlen.build(lens, (int)hlit, ALPHA_LITLEN) ||
            !g_dist.build(lens + hlit, (int)hdist, ALPHA_DIST))
          return -12;
      }

      // decompress the block body — software-pipelined: the NEXT symbol's
      // table entry is looked up BEFORE the current match copy runs, so the
      // (L2-latency-bound, 64 KiB window) match-source loads overlap the
      // next decode instead of serializing with it. Invariants:
      //   * a dispatch arm runs with >= 48 buffered bits (one match consumes
      //     at most 48: length code <=15 + extra <=5 + dist code <=15 +
      //     extra <=13), so no refill mid-arm;
      //   * refill only ORs bits ABOVE nbits into `hold`, so an entry looked
      //     up from peek(kTableBits) stays valid across a refill — entries
      //     carried between iterations never need re-lookup.
      if (b.nbits < 48) b.refill_fast();
      uint32_t e = g_litlen.fast[b.peek(kTableBits)];
      for (;;) {
        uint32_t len;
        if (e & F_LIT) {
          // 1 or 2 literals per entry (F_2LIT). Both bytes are stored
          // unconditionally — the stray out[1] of a 1-literal entry is
          // overwritten by the next emit or lands in the caller's output
          // slack — and `out` advances by the entry's literal count.
          if (out >= out_end) return -14;
          b.drop(e & 31);
          out[0] = (uint8_t)(e >> 16);
          out[1] = (uint8_t)(e >> 8);
          out += 1 + ((e >> 29) & 1);
          // literal run: keep decoding literals from the same refill
          while (b.nbits >= kTableBits && out < out_end) {
            e = g_litlen.fast[b.peek(kTableBits)];
            if (!(e & F_LIT)) break;
            b.drop(e & 31);
            out[0] = (uint8_t)(e >> 16);
            out[1] = (uint8_t)(e >> 8);
            out += 1 + ((e >> 29) & 1);
          }
          if (b.nbits < 48) b.refill_fast();
          if (e & F_LIT) {           // run ended on bits/bounds, not entry
            e = g_litlen.fast[b.peek(kTableBits)];
            continue;
          }
          // e is a fresh non-literal entry and >= 48 bits are buffered:
          // fall straight into the match/EOB dispatch below
        }
        if (e == 0) {
          // >kTableBits code: canonical decode, then classic length fetch
          int sym = decode_sym_slow(b, g_litlen);
          if (sym < 0) return -13;
          if (sym < 256) {
            if (out >= out_end) return -14;
            *out++ = (uint8_t)sym;
            if (b.nbits < 48) b.refill_fast();
            e = g_litlen.fast[b.peek(kTableBits)];
            continue;
          }
          if (sym == 256) break;
          sym -= 257;
          if (sym >= 29) return -15;
          len = kLenBase[sym] + b.get(kLenExtra[sym]);
        } else if (e & F_EOB) {
          b.drop(e & 31);
          break;
        } else {
          // length entry: consume code bits + extra bits in one drop
          uint32_t cl = e & 31, eb = (e >> 8) & 31;
          len = (e >> 16) + ((uint32_t)(b.hold >> cl) & ((1u << eb) - 1));
          b.drop((int)(cl + eb));
        }

        uint32_t dist;
        uint32_t d = g_dist.fast[b.peek(kTableBits)];
        if (d) {
          uint32_t cl = d & 31, eb = (d >> 8) & 31;
          dist = (d >> 16) + ((uint32_t)(b.hold >> cl) & ((1u << eb) - 1));
          b.drop((int)(cl + eb));
        } else {
          int dsym = decode_sym_slow(b, g_dist);
          if (dsym < 0 || dsym >= 30) return -16;
          dist = kDistBase[dsym] + b.get(kDistExtra[dsym]);
        }
        if ((int64_t)dist > out - out_base) return -17;
        if (out + len > out_end) return -18;
        const uint8_t* src = out - dist;
        // preload the next symbol's entry before the copy (see loop header)
        if (b.nbits < 48) b.refill_fast();
        const uint32_t e_next = g_litlen.fast[b.peek(kTableBits)];
        if (dist == 1) {
          memset(out, *src, len);
          out += len;
        } else if (dist >= 32) {
          // the dominant class on BAM payloads (98% of matches have
          // dist >= 16, ~60% > 4096: overlapping-read redundancy): one
          // unconditional 32-byte copy covers the 26-byte average length
          // with no loop; overshoot (<= 31 bytes) lands in bytes the next
          // emit overwrites or in the output slack — svio sizes the block
          // buffer with 32 bytes of slack for exactly this path
          uint8_t* dst = out;
          out += len;
          memcpy(dst, src, 32);
          if (len > 32) {
            int64_t left = (int64_t)len - 32;
            do {
              dst += 32;
              src += 32;
              memcpy(dst, src, 32);
              left -= 32;
            } while (left > 0);
          }
        } else if (dist >= 16) {
          // unconditional 16-byte copies, overshooting by up to 15 bytes
          // into bytes the next iteration will overwrite (or, at stream end,
          // into the caller's output slack); src trails dst by >= 16
          // so chunks never overlap
          uint8_t* dst = out;
          out += len;
          memcpy(dst, src, 16);
          if (len > 16) {
            int64_t left = (int64_t)len - 16;
            do {
              dst += 16;
              src += 16;
              memcpy(dst, src, 16);
              left -= 16;
            } while (left > 0);
          }
        } else if (dist >= 8) {
          // 8-byte word copies, overshoot <= 7 bytes; chunks never overlap
          uint8_t* dst = out;
          out += len;
          memcpy(dst, src, 8);
          if (len > 8) {
            int64_t left = (int64_t)len - 8;
            do {
              dst += 8;
              src += 8;
              memcpy(dst, src, 8);
              left -= 8;
            } while (left > 0);
          }
        } else {
          // 2 <= dist < 8: seed one period then double the copied region
          memcpy(out, src, dist);
          uint32_t copied = dist;
          while (copied < len) {
            uint32_t chunk = copied < len - copied ? copied : len - copied;
            memcpy(out + copied, out, chunk);
            copied += chunk;
          }
          out += len;
        }
        e = e_next;   // entry preloaded before the copy
      }
    } else {
      return -19;  // reserved block type
    }

    if (bfinal) break;
  }
  // every consumed bit must have been real: unconsumed >= ghost
  if (b.nbits < b.ghost_bits) return -20;
  if (out != out_end) return -21;      // ISIZE mismatch
  return 0;
}

}  // extern "C"
