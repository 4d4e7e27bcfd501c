// Multithreaded BGZF codec — native replacement for the reference's Intel GKL
// deflater/inflater (CommandLineProgram.java --use-jdk-deflater toggles;
// IntelInflaterDeflaterIntegrationTest) and htsjdk BlockCompressed streams.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). Blocks are
// compressed/decompressed in parallel with a simple thread pool: BGZF's 64 KiB
// independent members make this embarrassingly parallel, which is exactly why
// htslib uses a block thread pool for BAM I/O.

#include <atomic>
#include <algorithm>
#include <functional>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr size_t kBlockSize = 0xff00;  // htsjdk BlockCompressedOutputStream payload
constexpr int kHeaderLen = 18;
constexpr int kFooterLen = 8;

struct BlockSpan {
  size_t in_off;
  size_t in_len;
  size_t out_off;
  size_t out_len;  // filled by worker
};

void write_bgzf_header(uint8_t* p, uint16_t bsize_minus_1) {
  static const uint8_t tmpl[kHeaderLen] = {
      0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff,
      0x06, 0x00, 0x42, 0x43, 0x02, 0x00, 0x00, 0x00};
  std::memcpy(p, tmpl, kHeaderLen);
  p[16] = bsize_minus_1 & 0xff;
  p[17] = (bsize_minus_1 >> 8) & 0xff;
}

size_t deflate_block(const uint8_t* in, size_t in_len, uint8_t* out, int level) {
  // raw deflate into out + header/footer; returns total member size
  z_stream zs{};
  deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY);
  zs.next_in = const_cast<uint8_t*>(in);
  zs.avail_in = in_len;
  zs.next_out = out + kHeaderLen;
  zs.avail_out = kBlockSize + 1024;
  deflate(&zs, Z_FINISH);
  size_t clen = zs.total_out;
  deflateEnd(&zs);
  uint32_t crc = crc32(0, in, in_len);
  size_t total = kHeaderLen + clen + kFooterLen;
  write_bgzf_header(out, static_cast<uint16_t>(total - 1));
  uint8_t* f = out + kHeaderLen + clen;
  uint32_t isize = static_cast<uint32_t>(in_len);
  std::memcpy(f, &crc, 4);
  std::memcpy(f + 4, &isize, 4);
  return total;
}

bool inflate_block(const uint8_t* in, size_t in_len, uint8_t* out, size_t out_len) {
  z_stream zs{};
  inflateInit2(&zs, -15);
  zs.next_in = const_cast<uint8_t*>(in);
  zs.avail_in = in_len;
  zs.next_out = out;
  zs.avail_out = out_len;
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END && zs.total_out == out_len;
}

void parallel_for(size_t n, int n_threads, const std::function<void(size_t)>& fn) {
  if (n_threads <= 1 || n <= 1) {
    for (size_t i = 0; i < n; i++) fn(i);
    return;
  }
  std::atomic<size_t> next{0};
  std::vector<std::thread> pool;
  int workers = std::min<size_t>(n_threads, n);
  for (int t = 0; t < workers; t++) {
    pool.emplace_back([&] {
      for (size_t i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Compress payload into a BGZF stream (without the terminating EOF member,
// which the Python side appends). Returns the number of bytes written to out,
// or -1 if out_capacity is too small. out must have capacity for the worst
// case: n_blocks * (kBlockSize + 1024 + 26).
long bgzf_compress(const uint8_t* in, long in_len, uint8_t* out,
                   long out_capacity, int level, int n_threads) {
  size_t n_blocks = (in_len + kBlockSize - 1) / kBlockSize;
  if (in_len == 0) return 0;
  size_t worst_per_block = kBlockSize + 1024 + kHeaderLen + kFooterLen;
  if (static_cast<size_t>(out_capacity) < n_blocks * worst_per_block) return -1;

  std::vector<uint8_t> scratch(n_blocks * worst_per_block);
  std::vector<size_t> sizes(n_blocks);
  parallel_for(n_blocks, n_threads, [&](size_t b) {
    size_t off = b * kBlockSize;
    size_t len = std::min(kBlockSize, static_cast<size_t>(in_len) - off);
    sizes[b] = deflate_block(in + off, len, scratch.data() + b * worst_per_block, level);
  });
  size_t w = 0;
  for (size_t b = 0; b < n_blocks; b++) {
    std::memcpy(out + w, scratch.data() + b * worst_per_block, sizes[b]);
    w += sizes[b];
  }
  return static_cast<long>(w);
}

// Decompress n_blocks BGZF members described by (in_offsets[i], in_lens[i])
// into out at out_offsets[i] with expected sizes out_lens[i]. Returns 0 on
// success, -1 on any corrupt block.
int bgzf_decompress_blocks(const uint8_t* in, long n_blocks,
                           const long* in_offsets, const long* in_lens,
                           uint8_t* out, const long* out_offsets,
                           const long* out_lens, int n_threads) {
  std::atomic<int> ok{1};
  parallel_for(n_blocks, n_threads, [&](size_t b) {
    if (!inflate_block(in + in_offsets[b], in_lens[b], out + out_offsets[b], out_lens[b]))
      ok.store(0);
  });
  return ok.load() ? 0 : -1;
}

}  // extern "C"
