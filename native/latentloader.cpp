// latentloader — native batch assembly for fp16 latent shards.
//
// The reference feeds training through 16 torch DataLoader worker processes
// per GPU doing mmap'd .pt reads + crop + fp16->fp32 casts
// (train_ddp_v3mod2.py:683-699).  This library replaces that with an
// in-process engine: every *.npy latent shard is mmap'd once, and batches
// are assembled by a thread pool writing crops straight into caller-owned
// pinned buffers — no worker processes, no IPC, no Python in the loop.
//
// Exposed C ABI (consumed via ctypes from jatsr_tpu/data/native_loader.py):
//   ll_open(hr_paths, lr_paths, n)            -> handle
//   ll_frames(handle, i)                      -> frame count of song i
//   ll_channels(handle)                       -> latent channel count
//   ll_fill_batch(handle, idx[B], start[B], B, target, out_hr, out_lr,
//                 n_threads)                  -> 0 on success
//   ll_close(handle)
//
// Crop semantics match the Python loader exactly: start+target slice for
// long songs, loop-tiling for short ones (train_ddp_v3mod2.py:519-529).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// ---- fp16 -> fp32 via a 64K lookup table (built once) ----------------------
struct F16Table {
  float t[65536];
  F16Table() {
    for (uint32_t h = 0; h < 65536; ++h) {
      uint32_t sign = (h & 0x8000u) << 16;
      uint32_t exp = (h >> 10) & 0x1F;
      uint32_t man = h & 0x3FFu;
      uint32_t bits;
      if (exp == 0) {
        if (man == 0) {
          bits = sign;  // +-0
        } else {        // subnormal: normalise
          int e = -1;
          uint32_t m = man;
          do {
            ++e;
            m <<= 1;
          } while (!(m & 0x400u));
          bits = sign | ((127 - 15 - e) << 23) | ((m & 0x3FFu) << 13);
        }
      } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);  // inf / nan
      } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
      }
      std::memcpy(&t[h], &bits, 4);
    }
  }
};
const F16Table kF16;

struct Shard {
  const uint16_t* data = nullptr;  // fp16 payload [frames, channels]
  int64_t frames = 0;
  int64_t channels = 0;
  void* map_base = nullptr;
  size_t map_len = 0;
};

// Minimal .npy header parser: v1/v2, little-endian fp16, C-order, 2-D.
bool parse_npy(const uint8_t* p, size_t len, Shard* out) {
  if (len < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) return false;
  int major = p[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = p[8] | (p[9] << 8);
    hoff = 10;
  } else {
    hlen = p[8] | (p[9] << 8) | (p[10] << 16) | ((size_t)p[11] << 24);
    hoff = 12;
  }
  std::string hdr((const char*)p + hoff, hlen);
  if (hdr.find("'descr': '<f2'") == std::string::npos &&
      hdr.find("\"descr\": \"<f2\"") == std::string::npos)
    return false;
  if (hdr.find("'fortran_order': False") == std::string::npos) return false;
  size_t sp = hdr.find("'shape':");
  if (sp == std::string::npos) return false;
  long long a = 0, b = 0;
  if (std::sscanf(hdr.c_str() + sp, "'shape': (%lld, %lld)", &a, &b) != 2)
    return false;
  out->frames = a;
  out->channels = b;
  out->data = (const uint16_t*)(p + hoff + hlen);
  return true;
}

bool map_file(const char* path, Shard* s) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return false;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (base == MAP_FAILED) return false;
  s->map_base = base;
  s->map_len = st.st_size;
  if (!parse_npy((const uint8_t*)base, st.st_size, s)) {
    munmap(base, st.st_size);
    return false;
  }
  return true;
}

struct Dataset {
  std::vector<Shard> hr, lr;
  int64_t channels = 0;
};

void convert_rows(const uint16_t* src, float* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) dst[i] = kF16.t[src[i]];
}

// Copy a [target, C] crop (looping if the song is shorter than target).
void fill_one(const Shard& s, int64_t start, int64_t target, float* out) {
  const int64_t C = s.channels;
  if (s.frames >= target) {
    convert_rows(s.data + start * C, out, target * C);
  } else {
    int64_t written = 0;
    while (written < target) {
      int64_t n = std::min(s.frames, target - written);
      convert_rows(s.data, out + written * C, n * C);
      written += n;
    }
  }
}

}  // namespace

extern "C" {

void* ll_open(const char** hr_paths, const char** lr_paths, int64_t n) {
  auto* ds = new Dataset();
  ds->hr.resize(n);
  ds->lr.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    if (!map_file(hr_paths[i], &ds->hr[i]) ||
        !map_file(lr_paths[i], &ds->lr[i]) ||
        ds->hr[i].frames != ds->lr[i].frames) {
      delete ds;
      return nullptr;
    }
  }
  ds->channels = n > 0 ? ds->hr[0].channels : 0;
  return ds;
}

int64_t ll_frames(void* h, int64_t i) {
  return ((Dataset*)h)->hr[i].frames;
}

int64_t ll_channels(void* h) { return ((Dataset*)h)->channels; }

int ll_fill_batch(void* h, const int64_t* idx, const int64_t* start,
                  int64_t batch, int64_t target, float* out_hr, float* out_lr,
                  int n_threads) {
  auto* ds = (Dataset*)h;
  const int64_t C = ds->channels;
  std::atomic<int64_t> next(0);
  std::atomic<int> err(0);
  auto work = [&]() {
    int64_t b;
    while ((b = next.fetch_add(1)) < batch) {
      int64_t fi = idx[b];
      if (fi < 0 || fi >= (int64_t)ds->hr.size()) {
        err.store(1);
        continue;
      }
      const Shard& hs = ds->hr[fi];
      int64_t st = start[b];
      if (hs.frames >= target &&
          (st < 0 || st + target > hs.frames)) {
        err.store(2);
        continue;
      }
      fill_one(hs, st, target, out_hr + b * target * C);
      fill_one(ds->lr[fi], st, target, out_lr + b * target * C);
    }
  };
  int nt = std::max(1, std::min<int>(n_threads, (int)batch));
  if (nt == 1) {
    work();
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; ++i) threads.emplace_back(work);
    for (auto& t : threads) t.join();
  }
  return err.load();
}

void ll_close(void* h) {
  auto* ds = (Dataset*)h;
  for (auto& s : ds->hr)
    if (s.map_base) munmap(s.map_base, s.map_len);
  for (auto& s : ds->lr)
    if (s.map_base) munmap(s.map_base, s.map_len);
  delete ds;
}

}  // extern "C"
