// PGO training driver for libsvio (see build.sh).
//
// Synthesizes a small but representative BAM on disk — BGZF blocks at
// deflate levels 1 and 6, long noisy CIGARs, literal-dense packed sequence
// nibbles, run-heavy quality strings, a sprinkle of supplementary records
// with big I/D ops — then decodes it through the exact svio_fetch() entry
// the production reader uses. The gcov profile this run leaves behind
// steers the optimizer's layout of the inflate hot loop and the record
// scan (~8% measured on real window fetches vs an unprofiled build).
//
// Built and run only at library build time by build.sh; never shipped into
// the Python package. Any failure here simply falls back to a plain -O3
// build, so this program prefers dying loudly (nonzero exit) over
// producing a bogus profile.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

struct SvioResult;
extern "C" SvioResult* svio_fetch(const char* bam_path,
                                  const uint64_t* chunk_beg,
                                  const uint64_t* chunk_end, int n_chunks,
                                  uint64_t voffset0, int tid, int64_t start,
                                  int64_t end, int count_only, int decode_seq,
                                  int n_threads);
extern "C" int64_t svio_result_count(SvioResult* r);
extern "C" int svio_result_error(SvioResult* r);
extern "C" void svio_result_free(SvioResult* r);

namespace {

uint64_t lcg_state = 0x9e3779b97f4a7c15ull;
inline uint32_t rnd() {
  lcg_state = lcg_state * 6364136223846793005ull + 1442695040888963407ull;
  return (uint32_t)(lcg_state >> 33);
}

struct BgzfWriter {
  FILE* fp;
  std::vector<uint8_t> pending;
  uint64_t file_off = 0;

  explicit BgzfWriter(FILE* f) : fp(f) {}

  // current BGZF virtual offset of the next byte to be appended
  uint64_t tell_virtual() const {
    return (file_off << 16) | (uint64_t)pending.size();
  }

  void put(const void* data, size_t n) {
    const uint8_t* p = (const uint8_t*)data;
    pending.insert(pending.end(), p, p + n);
    while (pending.size() >= 60000) flush_block(60000);
  }

  void flush_block(size_t take_n) {
    if (take_n == 0 || pending.empty()) return;
    size_t n = take_n < pending.size() ? take_n : pending.size();
    // alternate deflate levels so the profile sees both the long-match
    // level-1 shape and the denser level-6 shape
    static int which = 0;
    int level = (which++ & 3) ? 1 : 6;
    std::vector<uint8_t> comp(n + 1024);
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY) != Z_OK)
      exit(3);
    zs.next_in = pending.data();
    zs.avail_in = (uInt)n;
    zs.next_out = comp.data();
    zs.avail_out = (uInt)comp.size();
    if (deflate(&zs, Z_FINISH) != Z_STREAM_END) exit(4);
    size_t clen = zs.total_out;
    deflateEnd(&zs);

    uint32_t crc = crc32(0, pending.data(), (uInt)n);
    uint16_t bsize = (uint16_t)(clen + 25);  // total block size - 1
    uint8_t hdr[18] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff,
                       6,    0,    'B', 'C', 2, 0, 0, 0};
    memcpy(hdr + 16, &bsize, 2);
    fwrite(hdr, 1, 18, fp);
    fwrite(comp.data(), 1, clen, fp);
    uint32_t isize = (uint32_t)n;
    fwrite(&crc, 4, 1, fp);
    fwrite(&isize, 4, 1, fp);
    file_off += 18 + clen + 8;
    pending.erase(pending.begin(), pending.begin() + n);
  }

  void finish() {
    while (!pending.empty()) flush_block(pending.size());
    // BGZF EOF marker block
    static const uint8_t eof[] = {
        0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06,
        0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00,
        0x00, 0x00, 0x00, 0x00, 0x00, 0x00};
    fwrite(eof, 1, sizeof(eof), fp);
  }
};

inline void put_i32(std::vector<uint8_t>& v, int32_t x) {
  const uint8_t* p = (const uint8_t*)&x;
  v.insert(v.end(), p, p + 4);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) return 1;
  const char* path = argv[1];
  FILE* fp = fopen(path, "wb");
  if (!fp) return 2;
  BgzfWriter w(fp);

  // --- BAM header ---
  w.put("BAM\x01", 4);
  int32_t l_text = 0;
  w.put(&l_text, 4);
  int32_t n_ref = 1;
  w.put(&n_ref, 4);
  int32_t l_name = 3;
  w.put(&l_name, 4);
  w.put("c1\0", 3);
  int32_t l_ref = 250000000;
  w.put(&l_ref, 4);
  // records must not share a block with the header tail for voffset0 to be
  // easy to compute: flush everything pending, then note the offset
  w.flush_block(w.pending.size());
  uint64_t voffset0 = w.tell_virtual();

  // --- records: sorted by pos, noisy CIGARs, 10% carry big I/D ops ---
  const int kRecords = 2400;
  int64_t pos = 1000;
  std::vector<uint8_t> rec;
  std::vector<uint32_t> cig;
  for (int i = 0; i < kRecords; i++) {
    pos += 500 + (rnd() % 2000);
    int l_seq = 2000 + (int)(rnd() % 14000);
    char name[32];
    int name_len = snprintf(name, sizeof(name), "pgo_read_%07d", i) + 1;

    cig.clear();
    int big = (i % 10 == 0);
    int remaining = l_seq;
    int lead_clip = (int)(rnd() % 64);
    if (lead_clip) {
      cig.push_back(((uint32_t)lead_clip << 4) | 4);  // S
      remaining -= lead_clip;
    }
    // noisy core: M runs broken by 1-3 bp I/D, one big I or D for 10%
    while (remaining > 400) {
      int m = 150 + (int)(rnd() % 400);
      if (m > remaining - 4) m = remaining - 4;
      cig.push_back(((uint32_t)m << 4) | 0);  // M
      remaining -= m;
      if (big && remaining > 300) {
        int ln = 80 + (int)(rnd() % 200);
        if (rnd() & 1) {
          if (ln > remaining - 4) ln = remaining - 4;
          cig.push_back(((uint32_t)ln << 4) | 1);  // I
          remaining -= ln;
        } else {
          cig.push_back(((uint32_t)ln << 4) | 2);  // D
        }
        big = 0;
      } else {
        int ln = 1 + (int)(rnd() % 3);
        if (rnd() & 1) {
          if (ln > remaining - 4) break;
          cig.push_back(((uint32_t)ln << 4) | 1);
          remaining -= ln;
        } else {
          cig.push_back(((uint32_t)ln << 4) | 2);
        }
      }
    }
    if (remaining > 0) cig.push_back(((uint32_t)remaining << 4) | 0);

    uint16_t flag = (i % 17 == 0) ? 0x800 : 0;  // some supplementaries
    rec.clear();
    put_i32(rec, 0);                  // refID
    put_i32(rec, (int32_t)pos);       // pos
    rec.push_back((uint8_t)name_len);
    rec.push_back(60);                // mapq
    rec.push_back(0); rec.push_back(0);  // bin
    rec.push_back((uint8_t)(cig.size() & 0xff));
    rec.push_back((uint8_t)(cig.size() >> 8));
    rec.push_back((uint8_t)(flag & 0xff));
    rec.push_back((uint8_t)(flag >> 8));
    put_i32(rec, l_seq);
    put_i32(rec, -1);                 // next_refID
    put_i32(rec, -1);                 // next_pos
    put_i32(rec, 0);                  // tlen
    rec.insert(rec.end(), (uint8_t*)name, (uint8_t*)name + name_len);
    rec.insert(rec.end(), (uint8_t*)cig.data(),
               (uint8_t*)(cig.data() + cig.size()));
    // packed sequence nibbles: literal-dense for the Huffman literal path
    for (int b = 0; b < (l_seq + 1) / 2; b++) {
      static const uint8_t nibs[4] = {1, 2, 4, 8};  // A C G T
      rec.push_back((uint8_t)((nibs[rnd() & 3] << 4) | nibs[rnd() & 3]));
    }
    // quality: long constant runs (dist-1 memset path) with noisy patches
    for (int b = 0; b < l_seq; b++)
      rec.push_back((b & 1023) < 1000 ? 0x22 : (uint8_t)(30 + (rnd() % 10)));

    int32_t block_size = (int32_t)rec.size();
    w.put(&block_size, 4);
    w.put(rec.data(), rec.size());
  }
  w.finish();
  fclose(fp);

  // --- decode it the way production does (twice: warm the branch profile) ---
  for (int round = 0; round < 2; round++) {
    SvioResult* r = svio_fetch(path, nullptr, nullptr, 0, voffset0,
                               /*tid=*/0, /*start=*/0, /*end=*/1ll << 40,
                               /*count_only=*/0, /*decode_seq=*/2,
                               /*n_threads=*/1);
    if (!r) return 5;
    int bad = svio_result_error(r) != 0 || svio_result_count(r) != kRecords;
    svio_result_free(r);
    if (bad) return 6;
  }
  remove(path);
  return 0;
}
