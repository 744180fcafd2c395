// svio: native BAM window decoder for svision-tpu.
//
// The reference delegates BAM IO to htslib via pysam (run_collection.py:23-26,
// classes.py:165-170, genotype.py:22-26); svision-tpu has no pysam, and the
// pure-Python reader (io/bam.py) is the fallback. This library is the
// production path: BGZF inflate + BAM record scan + region overlap filter,
// emitting structure-of-arrays batches that Python wraps as numpy views.
//
// C ABI only (consumed via ctypes). Chunk lists (BAI virtual offsets) are
// computed by the Python side; this layer is pure decode bandwidth.
//
// Build: make -C svision_tpu/io/native   -> libsvio.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <malloc.h>
#include <condition_variable>
#include <deque>
#include <functional>
#include <future>
#include <memory>
#include <mutex>
#include <thread>
#include <vector>
#include <zlib.h>

// fast raw-DEFLATE decoder (inflate.cc); zlib is the fallback on any error
extern "C" int svio_inflate(const uint8_t* in, int64_t in_len, uint8_t* out,
                            int64_t out_len);
// PCLMUL-dispatched CRC-32, zlib convention (crc32.cc)
extern "C" uint32_t svio_crc32(uint32_t crc, const uint8_t* buf, size_t len);

namespace {

// Tiny worker pool for block-parallel inflate (one pool per fetch call).
// Queued tasks still run after stop is requested; the destructor drains.
class InflatePool {
 public:
  explicit InflatePool(int n) {
    for (int i = 0; i < n; i++) workers_.emplace_back([this] { loop(); });
  }
  ~InflatePool() {
    {
      std::lock_guard<std::mutex> l(m_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> l(m_);
      q_.push_back(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> f;
      {
        std::unique_lock<std::mutex> l(m_);
        cv_.wait(l, [this] { return stop_ || !q_.empty(); });
        if (q_.empty()) return;  // stop requested and drained
        f = std::move(q_.front());
        q_.pop_front();
      }
      f();
    }
  }
  std::vector<std::thread> workers_;
  std::deque<std::function<void()>> q_;
  std::mutex m_;
  std::condition_variable cv_;
  bool stop_ = false;
};

// One BGZF block staged for (or finished with) background inflate.
struct PrefetchItem {
  int64_t coffset = -1;
  int64_t next_coffset = -1;
  std::shared_ptr<std::vector<uint8_t>> payload;  // inflated, sized isize
  std::future<bool> ready;                        // false = decode failed
};

// CRC verification of every inflated block (raw DEFLATE has no internal
// checksum; htslib always checks). SVIO_SKIP_CRC=1 opts out for trusted
// local data where the ~2 GB/s crc32 pass matters.
static bool check_crc_enabled() {
  static int enabled = -1;
  if (enabled < 0) {
    const char* e = getenv("SVIO_SKIP_CRC");
    enabled = (e && e[0] == '1') ? 0 : 1;
  }
  return enabled == 1;
}

struct BgzfCursor {
  FILE* fp = nullptr;
  int64_t block_coffset = -1;   // compressed offset of loaded block
  int64_t next_coffset = 0;     // compressed offset of the block after it
  std::vector<uint8_t> block;   // inflated payload
  std::vector<uint8_t> cdata;   // compressed payload (reused across blocks)
  size_t within = 0;            // cursor inside block
  // set when decode hits corruption or truncation (vs clean EOF): a
  // CRC/inflate failure, a partial block header, or a short mid-block
  // read. Surfaced through SvioResult so Python can raise instead of
  // silently treating a cut-short BAM as complete.
  bool corrupt = false;

  // block-parallel prefetch (nullptr pool = serial mode). The reader
  // thread stages compressed blocks sequentially into `ring`; pool workers
  // inflate them; load_block consumes in order. All stream/record logic
  // (read, tell_virtual, region bounds) is shared with serial mode, so the
  // two paths are behavior-identical by construction.
  InflatePool* pool = nullptr;
  int lookahead = 0;
  std::deque<PrefetchItem> ring;
  int64_t stage_coffset = -1;
  bool stage_eof = false;

  bool load_block(int64_t coffset) {
    if (pool) return load_block_mt(coffset);
    return load_block_serial(coffset);
  }

  // EOF signal for read(): in prefetch mode fp has raced ahead of the
  // parse position, so feof(fp) is meaningless there — termination comes
  // from load_block_mt failing once staging is exhausted.
  bool stream_eof() const { return pool ? false : feof(fp) != 0; }

  // Read one block's header + compressed payload at `coffset` and hand the
  // inflate to the pool. Returns false at EOF/corrupt header.
  bool stage_one() {
    if (stage_eof) return false;
    if (fseeko(fp, stage_coffset, SEEK_SET) != 0) {
      stage_eof = true;
      return false;
    }
    uint8_t hdr[12];
    size_t got = fread(hdr, 1, 12, fp);
    if (got == 0) {            // clean EOF at a block boundary
      stage_eof = true;
      return false;
    }
    if (got != 12 || hdr[0] != 0x1f || hdr[1] != 0x8b) {
      stage_eof = true;
      corrupt = true;          // partial/garbled header = truncated file
      return false;
    }
    uint16_t xlen = (uint16_t)(hdr[10] | (hdr[11] << 8));
    std::vector<uint8_t> extra(xlen);
    if (fread(extra.data(), 1, xlen, fp) != xlen) {
      stage_eof = true;
      corrupt = true;
      return false;
    }
    int bsize = -1;
    for (size_t p = 0; p + 4 <= extra.size();) {
      uint16_t slen = (uint16_t)(extra[p + 2] | (extra[p + 3] << 8));
      if (extra[p] == 'B' && extra[p + 1] == 'C' && slen == 2)
        bsize = (extra[p + 4] | (extra[p + 5] << 8)) + 1;
      p += 4 + slen;
    }
    if (bsize < 0) {
      stage_eof = true;
      corrupt = true;
      return false;
    }
    int cdata_len = bsize - 12 - xlen - 8;
    auto comp = std::make_shared<std::vector<uint8_t>>(cdata_len + 8, 0);
    if (fread(comp->data(), 1, cdata_len, fp) != (size_t)cdata_len) {
      stage_eof = true;
      corrupt = true;
      return false;
    }
    uint8_t tail[8];
    if (fread(tail, 1, 8, fp) != 8) {
      stage_eof = true;
      corrupt = true;
      return false;
    }
    uint32_t crc_expect, isize;
    memcpy(&crc_expect, tail, 4);
    memcpy(&isize, tail + 4, 4);

    PrefetchItem item;
    item.coffset = stage_coffset;
    item.next_coffset = stage_coffset + bsize;
    item.payload = std::make_shared<std::vector<uint8_t>>();
    auto payload = item.payload;
    auto task = std::make_shared<std::packaged_task<bool()>>(
        [comp, payload, cdata_len, isize, crc_expect]() -> bool {
          payload->resize(isize + 32);
          if (isize > 0 && svio_inflate(comp->data(), cdata_len,
                                        payload->data(), isize) != 0) {
            z_stream zs;
            memset(&zs, 0, sizeof(zs));
            if (inflateInit2(&zs, -15) != Z_OK) return false;
            zs.next_in = comp->data();
            zs.avail_in = cdata_len;
            zs.next_out = payload->data();
            zs.avail_out = isize;
            int rc = inflate(&zs, Z_FINISH);
            inflateEnd(&zs);
            if (rc != Z_STREAM_END) return false;
          }
          if (check_crc_enabled() &&
              svio_crc32(0, payload->data(), isize) != crc_expect)
            return false;
          payload->resize(isize);
          return true;
        });
    item.ready = task->get_future();
    pool->submit([task] { (*task)(); });
    stage_coffset = item.next_coffset;
    ring.push_back(std::move(item));
    return true;
  }

  bool load_block_mt(int64_t coffset) {
    if (coffset == block_coffset) return true;
    // drop staged blocks before the target (chunk lists can skip forward)
    while (!ring.empty() && ring.front().coffset < coffset) ring.pop_front();
    if (ring.empty() || ring.front().coffset != coffset) {
      ring.clear();
      stage_eof = false;
      stage_coffset = coffset;
    }
    while ((int)ring.size() < lookahead && stage_one()) {
    }
    if (ring.empty() || ring.front().coffset != coffset) return false;
    PrefetchItem item = std::move(ring.front());
    ring.pop_front();
    if (!item.ready.get()) {
      corrupt = true;   // inflate or CRC failure in the worker
      return false;
    }
    block = std::move(*item.payload);
    block_coffset = coffset;
    next_coffset = item.next_coffset;
    within = 0;
    return true;
  }

  bool load_block_serial(int64_t coffset) {
    if (coffset == block_coffset) return true;
    if (fseeko(fp, coffset, SEEK_SET) != 0) return false;
    uint8_t hdr[12];
    size_t got = fread(hdr, 1, 12, fp);
    if (got == 0) return false;  // clean EOF at a block boundary
    if (got != 12 || hdr[0] != 0x1f || hdr[1] != 0x8b) {
      corrupt = true;
      return false;
    }
    uint16_t xlen = (uint16_t)(hdr[10] | (hdr[11] << 8));
    std::vector<uint8_t> extra(xlen);
    if (fread(extra.data(), 1, xlen, fp) != xlen) {
      corrupt = true;
      return false;
    }
    int bsize = -1;
    for (size_t p = 0; p + 4 <= extra.size();) {
      uint8_t si1 = extra[p], si2 = extra[p + 1];
      uint16_t slen = (uint16_t)(extra[p + 2] | (extra[p + 3] << 8));
      if (si1 == 'B' && si2 == 'C' && slen == 2)
        bsize = (extra[p + 4] | (extra[p + 5] << 8)) + 1;
      p += 4 + slen;
    }
    if (bsize < 0) {
      corrupt = true;
      return false;
    }
    int cdata_len = bsize - 12 - xlen - 8;
    // 8 bytes of zeroed slack past the payload: the fast decoder's bit
    // buffer and word-copy are allowed to touch (not consume) them
    cdata.assign(cdata_len + 8, 0);
    if (fread(cdata.data(), 1, cdata_len, fp) != (size_t)cdata_len) {
      corrupt = true;
      return false;
    }
    uint8_t tail[8];
    if (fread(tail, 1, 8, fp) != 8) {
      corrupt = true;
      return false;
    }
    uint32_t crc_expect, isize;
    memcpy(&crc_expect, tail, 4);
    memcpy(&isize, tail + 4, 4);

    block.resize(isize + 32);  // 32 bytes of output slack (see inflate.cc)
    if (isize > 0 &&
        svio_inflate(cdata.data(), cdata_len, block.data(), isize) != 0) {
      // fall back to zlib: a fast-path decode error degrades to the old
      // speed, never to wrong bytes
      z_stream zs;
      memset(&zs, 0, sizeof(zs));
      if (inflateInit2(&zs, -15) != Z_OK) return false;
      zs.next_in = cdata.data();
      zs.avail_in = cdata_len;
      zs.next_out = block.data();
      zs.avail_out = isize;
      int rc = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (rc != Z_STREAM_END) {
        corrupt = true;
        return false;
      }
    }
    if (check_crc_enabled() &&
        svio_crc32(0, block.data(), isize) != crc_expect) {
      corrupt = true;
      return false;
    }
    block.resize(isize);
    block_coffset = coffset;
    next_coffset = coffset + bsize;
    within = 0;
    return true;
  }

  bool seek_virtual(uint64_t voffset) {
    if (!load_block((int64_t)(voffset >> 16))) return false;
    within = voffset & 0xffff;
    return within <= block.size();
  }

  uint64_t tell_virtual() const {
    return ((uint64_t)block_coffset << 16) | (uint64_t)within;
  }

  // read n bytes; returns bytes actually read (EOF-safe)
  size_t read(uint8_t* dst, size_t n) {
    size_t got = 0;
    while (n > 0) {
      if (block_coffset < 0 && !load_block(0)) break;
      size_t avail = block.size() - within;
      if (avail == 0) {
        if (!load_block(next_coffset)) break;
        if (block.empty()) {
          if (stream_eof()) break;
          continue;  // empty block mid-file
        }
        avail = block.size();
      }
      size_t take = avail < n ? avail : n;
      memcpy(dst + got, block.data() + within, take);
      within += take;
      got += take;
      n -= take;
    }
    return got;
  }
};

struct Batch {
  std::vector<int32_t> refid, pos, endpos;
  std::vector<uint16_t> flag;
  std::vector<uint8_t> mapq;
  // per-record prefilter features, computed during the scan so the Python
  // clean-read prefilter (collect/prefilter.py) never touches the qname or
  // CIGAR buffers for the ~97% of records it drops:
  //   sig_hash  = polynomial qname hash, identical to prefilter.qname_hashes
  //               (sum(byte[i]*FNV_PRIME^i mod 2^64) ^ len)
  //   max_indel = longest I or D CIGAR op (0 when none)
  std::vector<uint64_t> sig_hash;
  std::vector<int32_t> max_indel;
  std::vector<int64_t> qname_off{0}, cigar_off{0}, seq_off{0};
  std::vector<char> qname_buf;
  std::vector<uint32_t> cigar_buf;
  std::vector<char> seq_buf;
  std::vector<int32_t> seq_len;   // ASCII length per record (packed mode)
  // BGZF virtual offset of each emitted record's start: lets a caller
  // re-fetch an exact record subset later without re-inflating the whole
  // span (the giant-window streaming second pass)
  std::vector<uint64_t> voffset;
};

const char SEQ_NT[17] = "=ACMGRSVTWYHKDBN";
constexpr uint64_t kFnvPrime = 1099511628211ull;
// ops that consume reference: M D N = X  (indices 0,2,3,7,8)
const int REF_CONSUME[9] = {1, 0, 1, 1, 0, 0, 0, 1, 1};

inline int32_t rd_i32(const uint8_t* p) { int32_t v; memcpy(&v, p, 4); return v; }
inline uint32_t rd_u32(const uint8_t* p) { uint32_t v; memcpy(&v, p, 4); return v; }
inline uint16_t rd_u16(const uint8_t* p) { uint16_t v; memcpy(&v, p, 2); return v; }

// Parse one record payload into the batch when it overlaps [start,end) on tid.
// Returns: 0 skipped, 1 kept, 2 past-region (caller may stop on sorted input).
// decode_seq: 0 = skip sequences, 1 = expand to ASCII, 2 = copy the raw
// 4-bit-packed bytes (half the memory traffic and no expand loop; Python
// decodes lazily per record it actually keeps after the clean-read
// prefilter, collect/prefilter.py).
int parse_record(const uint8_t* buf, int size, int tid, int64_t start,
                 int64_t end, bool count_only, int decode_seq, Batch* out) {
  int32_t refid = rd_i32(buf);
  int32_t pos = rd_i32(buf + 4);
  uint8_t l_read_name = buf[8];
  uint8_t mapq = buf[9];
  uint16_t n_cigar = rd_u16(buf + 12);
  uint16_t flag = rd_u16(buf + 14);
  int32_t l_seq = rd_i32(buf + 16);

  if (tid >= 0) {
    // coordinate-sorted stream: stop once past the target ref/region;
    // skip earlier refs (full-scan mode starts at the first record)
    if (refid < 0 || refid > tid) return 2;
    if (refid < tid) return 0;
    if ((int64_t)pos >= end) return 2;
  }
  const uint8_t* cig = buf + 32 + l_read_name;
  // long-CIGAR records (>65535 ops): placeholder kSmN cigar, real ops in the
  // CG:B,I aux tag (SAM spec 4.2.2)
  const uint8_t* cg_ops = nullptr;
  int32_t cg_n = 0;
  if (n_cigar == 2) {
    uint32_t op0 = rd_u32(cig), op1 = rd_u32(cig + 4);
    if ((op0 & 0xf) == 4 /*S*/ && (int32_t)(op0 >> 4) == l_seq &&
        (op1 & 0xf) == 3 /*N*/) {
      const uint8_t* aux =
          cig + 4 * n_cigar + (l_seq + 1) / 2 + l_seq;
      const uint8_t* lim = buf + size;
      while (aux + 3 <= lim) {
        char t0 = (char)aux[0], t1 = (char)aux[1], typ = (char)aux[2];
        aux += 3;
        if (typ == 'B') {
          if (aux + 5 > lim) break;
          char sub = (char)aux[0];
          int32_t cnt = rd_i32(aux + 1);
          const uint8_t* data = aux + 5;
          int esz = (sub == 'c' || sub == 'C') ? 1
                    : (sub == 's' || sub == 'S') ? 2 : 4;
          // counts come from the file: reject negative (infinite loop) and
          // oversized (OOB read) values
          if (cnt < 0 || data + (int64_t)cnt * esz > lim) break;
          if (t0 == 'C' && t1 == 'G' && sub == 'I') {
            cg_ops = data;
            cg_n = cnt;
            break;
          }
          aux = data + (int64_t)cnt * esz;
        } else if (typ == 'A' || typ == 'c' || typ == 'C') {
          aux += 1;
        } else if (typ == 's' || typ == 'S') {
          aux += 2;
        } else if (typ == 'i' || typ == 'I' || typ == 'f') {
          aux += 4;
        } else if (typ == 'Z' || typ == 'H') {
          while (aux < lim && *aux) aux++;
          aux++;
        } else {
          break;
        }
      }
    }
  }
  int64_t ref_span = 0;
  uint32_t max_indel = 0;
  if (cg_ops) {
    for (int i = 0; i < cg_n; i++) {
      uint32_t v = rd_u32(cg_ops + 4 * i);
      uint32_t op = v & 0xf, l = v >> 4;
      if (REF_CONSUME[op]) ref_span += l;
      if ((op == 1 || op == 2) && l > max_indel) max_indel = l;  // I/D
    }
  } else {
    for (int i = 0; i < n_cigar; i++) {
      uint32_t v = rd_u32(cig + 4 * i);
      uint32_t op = v & 0xf, l = v >> 4;
      if (REF_CONSUME[op]) ref_span += l;
      if ((op == 1 || op == 2) && l > max_indel) max_indel = l;
    }
  }
  int64_t epos = pos + (ref_span > 0 ? ref_span : 1);
  if (tid >= 0 && epos <= start) return 0;
  if (count_only) return 1;

  out->refid.push_back(refid);
  out->pos.push_back(pos);
  out->endpos.push_back((int32_t)epos);
  out->flag.push_back(flag);
  out->mapq.push_back(mapq);

  out->qname_buf.insert(out->qname_buf.end(), (const char*)(buf + 32),
                        (const char*)(buf + 32 + l_read_name - 1));
  out->qname_off.push_back((int64_t)out->qname_buf.size());
  {
    uint64_t h = 0, pw = 1;
    const uint8_t* q = buf + 32;
    int ql = l_read_name - 1;
    for (int i = 0; i < ql; i++) {
      h += (uint64_t)q[i] * pw;   // wraps mod 2^64, matching numpy
      pw *= kFnvPrime;
    }
    out->sig_hash.push_back(h ^ (uint64_t)ql);
  }
  out->max_indel.push_back((int32_t)max_indel);

  if (cg_ops) {
    for (int i = 0; i < cg_n; i++)
      out->cigar_buf.push_back(rd_u32(cg_ops + 4 * i));
  } else {
    for (int i = 0; i < n_cigar; i++)
      out->cigar_buf.push_back(rd_u32(cig + 4 * i));
  }
  out->cigar_off.push_back((int64_t)out->cigar_buf.size());

  if (decode_seq == 1 && l_seq > 0) {
    const uint8_t* sp = cig + 4 * n_cigar;
    size_t base = out->seq_buf.size();
    out->seq_buf.resize(base + l_seq);
    for (int i = 0; i < l_seq; i++) {
      uint8_t b = sp[i >> 1];
      out->seq_buf[base + i] = SEQ_NT[(i & 1) ? (b & 0xf) : (b >> 4)];
    }
  } else if (decode_seq == 2 && l_seq > 0) {
    const uint8_t* sp = cig + 4 * n_cigar;
    int packed = (l_seq + 1) / 2;
    out->seq_buf.insert(out->seq_buf.end(), (const char*)sp,
                        (const char*)(sp + packed));
  }
  out->seq_off.push_back((int64_t)out->seq_buf.size());
  out->seq_len.push_back(decode_seq ? l_seq : 0);
  return 1;
}

}  // namespace

extern "C" {

// Opaque result handle + flat views.
struct SvioResult {
  Batch batch;
  int64_t count = 0;
  // 0 ok; 1 corrupt/truncated block or record cut short mid-stream. The
  // Python wrapper raises on nonzero instead of treating partial data as a
  // complete fetch.
  int error = 0;
};

// Fetch records from BAI chunk list (or full scan from voffset0 when
// n_chunks==0). tid<0 disables region filtering (full-file iteration).
SvioResult* svio_fetch(const char* bam_path, const uint64_t* chunk_beg,
                       const uint64_t* chunk_end, int n_chunks,
                       uint64_t voffset0, int tid, int64_t start, int64_t end,
                       int count_only, int decode_seq, int n_threads) {
#ifdef __GLIBC__
  // A 30x 10 Mb window's seq_buf is ~135 MB: above glibc's default mmap
  // threshold, so every window mmap'ed fresh pages (soft-faulted on first
  // touch) and munmap'ed them on free — ~0.1 s/window of kernel time on
  // the WGS sweep. Raising the threshold keeps the big batch buffers on
  // the brk heap where consecutive windows reuse them. Peak retention is
  // one window's buffers per worker process.
  static bool malloc_tuned = [] {
    mallopt(M_MMAP_THRESHOLD, 512 << 20);
    mallopt(M_TRIM_THRESHOLD, 512 << 20);
    return true;
  }();
  (void)malloc_tuned;
#endif
  FILE* fp = fopen(bam_path, "rb");
  if (!fp) return nullptr;
  BgzfCursor cur;
  cur.fp = fp;
  std::unique_ptr<InflatePool> pool;
  if (n_threads > 1) {
    pool.reset(new InflatePool(n_threads));
    cur.pool = pool.get();
    cur.lookahead = 2 * n_threads + 2;
  }
  SvioResult* res = new SvioResult();
  std::vector<uint8_t> rec;

  if (!count_only) {
    // Reserve output buffers from the compressed span (BAM inflates ~4-15x;
    // modest under-reserve just means one or two doublings instead of ~20,
    // which removes most reallocation memcpy traffic from the scan). The
    // reserve is a hint, not a budget: hard-cap it so a huge span (whole
    // unindexed BAM, or index chunks covering most of the file) cannot
    // up-front-allocate gigabytes the region filter would never fill —
    // amortized doubling covers anything beyond the cap.
    int64_t comp = 0;
    if (n_chunks > 0) {
      for (int c = 0; c < n_chunks; c++)
        comp += (int64_t)((chunk_end[c] >> 16) - (chunk_beg[c] >> 16)) + 65536;
    } else {
      if (fseeko(fp, 0, SEEK_END) == 0) comp = ftello(fp);
      fseeko(fp, 0, SEEK_SET);
    }
    if (comp > 0) {
      constexpr int64_t kSeqReserveCap = 512ll << 20;    // 512 MiB
      constexpr int64_t kCigarReserveCap = 64ll << 20;   // 64 MiB
      int64_t cig = comp / 8;
      res->batch.cigar_buf.reserve(
          (size_t)(cig < kCigarReserveCap ? cig : kCigarReserveCap));
      int64_t seq = decode_seq == 2 ? comp * 4
                    : decode_seq == 1 ? comp * 8 : 0;
      if (seq > 0)
        res->batch.seq_buf.reserve(
            (size_t)(seq < kSeqReserveCap ? seq : kSeqReserveCap));
    }
  }

  auto scan_range = [&](uint64_t vbeg, uint64_t vend_limit, bool bounded) {
    if (!cur.seek_virtual(vbeg)) return;
    uint8_t szb[4];
    while (true) {
      uint64_t vrec = cur.tell_virtual();
      if (bounded && vrec >= vend_limit) break;
      size_t got = cur.read(szb, 4);
      if (got != 4) {
        if (got != 0) cur.corrupt = true;  // record length cut short
        break;
      }
      int32_t size = rd_i32(szb);
      if (size <= 0 || size > (1 << 28)) {
        cur.corrupt = true;  // garbage length = desynced/corrupt stream
        break;
      }
      const uint8_t* payload;
      if (cur.block.size() - cur.within >= (size_t)size) {
        // record fully inside the loaded block: parse in place, no copy
        payload = cur.block.data() + cur.within;
        cur.within += size;
      } else {
        rec.resize(size);
        if (cur.read(rec.data(), size) != (size_t)size) {
          cur.corrupt = true;  // record body cut short mid-stream
          break;
        }
        payload = rec.data();
      }
      int rc = parse_record(payload, size, tid, start, end,
                            count_only != 0, decode_seq, &res->batch);
      if (rc == 1) {
        res->count++;
        if (!count_only) res->batch.voffset.push_back(vrec);
      } else if (rc == 2) {
        break;  // sorted: past the region
      }
    }
  };

  if (n_chunks > 0) {
    for (int c = 0; c < n_chunks; c++)
      scan_range(chunk_beg[c], chunk_end[c], true);
  } else {
    scan_range(voffset0, 0, false);
  }
  if (cur.corrupt) res->error = 1;
  fclose(fp);
  return res;
}

int64_t svio_result_count(SvioResult* r) { return r->count; }
int svio_result_error(SvioResult* r) { return r->error; }

// Array accessors (valid until svio_result_free)
int32_t* svio_refid(SvioResult* r) { return r->batch.refid.data(); }
int32_t* svio_pos(SvioResult* r) { return r->batch.pos.data(); }
int32_t* svio_endpos(SvioResult* r) { return r->batch.endpos.data(); }
uint16_t* svio_flag(SvioResult* r) { return r->batch.flag.data(); }
uint8_t* svio_mapq(SvioResult* r) { return r->batch.mapq.data(); }
int64_t* svio_qname_off(SvioResult* r) { return r->batch.qname_off.data(); }
char* svio_qname_buf(SvioResult* r) { return r->batch.qname_buf.data(); }
int64_t svio_qname_buf_len(SvioResult* r) { return (int64_t)r->batch.qname_buf.size(); }
int64_t* svio_cigar_off(SvioResult* r) { return r->batch.cigar_off.data(); }
uint32_t* svio_cigar_buf(SvioResult* r) { return r->batch.cigar_buf.data(); }
int64_t svio_cigar_buf_len(SvioResult* r) { return (int64_t)r->batch.cigar_buf.size(); }
int64_t* svio_seq_off(SvioResult* r) { return r->batch.seq_off.data(); }
int32_t* svio_seq_len(SvioResult* r) { return r->batch.seq_len.data(); }
char* svio_seq_buf(SvioResult* r) { return r->batch.seq_buf.data(); }
int64_t svio_seq_buf_len(SvioResult* r) { return (int64_t)r->batch.seq_buf.size(); }
uint64_t* svio_voffset(SvioResult* r) { return r->batch.voffset.data(); }
uint64_t* svio_sig_hash(SvioResult* r) { return r->batch.sig_hash.data(); }
int32_t* svio_max_indel(SvioResult* r) { return r->batch.max_indel.data(); }

// bumped whenever the C ABI grows; the Python loader rebuilds a stale .so
int svio_abi_version() { return 3; }

void svio_result_free(SvioResult* r) { delete r; }

}  // extern "C"
