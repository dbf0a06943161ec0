// Copyright 2026. Apache License 2.0.
//
// medloader: native data-loading runtime for medicalseg_tpu.
//
// Replaces the reference's paddle.io.DataLoader worker processes
// (medicalseg/core/train.py:87-95) with an in-process C++ thread pool:
//   * zero-copy .npy parsing (v1/v2 headers, C-order, f32/i32/i16/u8),
//   * an LRU byte-bounded RAM cache of decoded volumes,
//   * async prefetch of upcoming batch indices,
//   * batch assembly straight into a caller-provided pinned buffer, so
//     Python sees one contiguous [N, D, H, W] array ready for
//     jax.device_put.
//
// C ABI only (consumed via ctypes; no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <list>
#include <map>
#include <memory>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

// gzip inflate backend: libdeflate (2-3x faster one-shot inflate than
// zlib; present in this image) preferred, zlib fallback, else the
// ml_gzip_* entry points report -3 and Python uses its gzip module.
// The build recipe (data_native.build_library) tries the -D flags in
// that order.
#if defined(ML_WITH_DEFLATE)
#include <libdeflate.h>
#elif defined(ML_WITH_ZLIB)
#include <zlib.h>
#endif

namespace {

struct Volume {
  std::vector<uint8_t> data;   // decoded payload (element bytes)
  std::vector<int64_t> shape;  // dims
  int dtype = 0;               // 0=f32 1=i32 2=i16 3=u8 4=f64 5=i64
  size_t nbytes() const { return data.size(); }
};

int dtype_size(int dt) {
  switch (dt) {
    case 0: return 4; case 1: return 4; case 2: return 2;
    case 3: return 1; case 4: return 8; case 5: return 8;
  }
  return 0;
}

// ---------------------------------------------------------------------
// .npy parsing
// ---------------------------------------------------------------------
bool parse_npy(const std::string& path, Volume* out, std::string* err) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) { *err = "open failed: " + path; return false; }
  uint8_t magic[8];
  if (fread(magic, 1, 8, f) != 8 ||
      memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f); *err = "bad npy magic: " + path; return false;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    uint8_t b[2];
    if (fread(b, 1, 2, f) != 2) { fclose(f); *err = "trunc"; return false; }
    hlen = b[0] | (b[1] << 8);
  } else {
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) { fclose(f); *err = "trunc"; return false; }
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
  }
  std::string header(hlen, '\0');
  if (fread(&header[0], 1, hlen, f) != hlen) {
    fclose(f); *err = "trunc header"; return false;
  }

  // descr
  size_t dp = header.find("'descr'");
  if (dp == std::string::npos) { fclose(f); *err = "no descr"; return false; }
  size_t q1 = header.find('\'', dp + 7);
  size_t q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  int dtype;
  if (descr == "<f4") dtype = 0;
  else if (descr == "<i4") dtype = 1;
  else if (descr == "<i2") dtype = 2;
  else if (descr == "|u1") dtype = 3;
  else if (descr == "<f8") dtype = 4;
  else if (descr == "<i8") dtype = 5;
  else { fclose(f); *err = "unsupported dtype " + descr; return false; }

  if (header.find("'fortran_order': True") != std::string::npos) {
    fclose(f); *err = "fortran order unsupported"; return false;
  }

  size_t sp = header.find("'shape'");
  size_t p1 = header.find('(', sp);
  size_t p2 = header.find(')', p1);
  std::string shape_str = header.substr(p1 + 1, p2 - p1 - 1);
  std::vector<int64_t> shape;
  int64_t cur = -1;
  for (char c : shape_str) {
    if (c >= '0' && c <= '9') {
      cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
    } else if (cur >= 0) {
      shape.push_back(cur); cur = -1;
    }
  }
  if (cur >= 0) shape.push_back(cur);

  int64_t count = 1;
  for (int64_t s : shape) count *= s;
  size_t nbytes = (size_t)count * dtype_size(dtype);
  out->data.resize(nbytes);
  if (fread(out->data.data(), 1, nbytes, f) != nbytes) {
    fclose(f); *err = "trunc payload"; return false;
  }
  fclose(f);
  out->shape = std::move(shape);
  out->dtype = dtype;
  return true;
}

// ---------------------------------------------------------------------
// Loader: thread pool + LRU cache + prefetch queue
// ---------------------------------------------------------------------
class Loader {
 public:
  Loader(std::vector<std::string> paths, int threads, size_t cache_bytes)
      : paths_(std::move(paths)), cache_cap_(cache_bytes), stop_(false) {
    if (threads < 1) threads = 1;
    for (int i = 0; i < threads; ++i)
      workers_.emplace_back([this] { worker(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void prefetch(const int* idxs, int n) {
    std::lock_guard<std::mutex> lk(mu_);
    for (int i = 0; i < n; ++i)
      if (idxs[i] >= 0 && idxs[i] < (int)paths_.size())
        queue_.push(idxs[i]);
    cv_.notify_all();
  }

  // Blocking fetch (serves from cache, decodes otherwise).
  std::shared_ptr<Volume> get(int idx, std::string* err) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      auto it = cache_.find(idx);
      if (it != cache_.end()) {
        touch(idx);
        return it->second;
      }
    }
    auto vol = std::make_shared<Volume>();
    if (!parse_npy(paths_[idx], vol.get(), err)) return nullptr;
    insert(idx, vol);
    return vol;
  }

  const std::string& last_error() const { return last_error_; }

 private:
  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_) return;
        idx = queue_.front();
        queue_.pop();
        if (cache_.count(idx)) continue;
      }
      auto vol = std::make_shared<Volume>();
      std::string err;
      if (parse_npy(paths_[idx], vol.get(), &err)) {
        insert(idx, vol);
      } else {
        std::lock_guard<std::mutex> lk(mu_);
        last_error_ = err;
      }
    }
  }

  void insert(int idx, std::shared_ptr<Volume> vol) {
    std::lock_guard<std::mutex> lk(mu_);
    if (cache_.count(idx)) return;
    cache_bytes_ += vol->nbytes();
    cache_[idx] = std::move(vol);
    lru_.push_back(idx);
    while (cache_bytes_ > cache_cap_ && lru_.size() > 1) {
      int victim = lru_.front();
      lru_.pop_front();
      auto it = cache_.find(victim);
      if (it != cache_.end()) {
        cache_bytes_ -= it->second->nbytes();
        cache_.erase(it);
      }
    }
  }

  void touch(int idx) {
    lru_.remove(idx);
    lru_.push_back(idx);
  }

  std::vector<std::string> paths_;
  size_t cache_cap_;
  size_t cache_bytes_ = 0;
  std::unordered_map<int, std::shared_ptr<Volume>> cache_;
  std::list<int> lru_;
  std::queue<int> queue_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
  std::string last_error_;
};

// ---------------------------------------------------------------------
// Fused HU-window + separable trilinear resize
// ---------------------------------------------------------------------
// Mirrors medicalseg_tpu.ops.hu_norm_resize (pallas_kernels.py:108-122):
// window first (NaN->hu_nan, clip to [hu_min,hu_max], scale to [0,255]),
// then endpoint-aligned order-1 zoom (resize.py:_linear_matrix
// convention: src = i * (in-1)/(out-1), lo clamped to in-2).
//
// The wire-format shrink for remote TPU ingest: a 200x512x512 f32 CT
// scan (210 MB) becomes a 128^3 bf16 tensor (4.2 MB) before ever
// touching jax.device_put — through a ~32 MB/s tunnel that is the
// difference between 6.6 s and 0.13 s per volume.

struct LerpAxis {
  std::vector<int> lo;
  std::vector<float> frac;
};

LerpAxis make_axis(int in, int out) {
  LerpAxis ax;
  ax.lo.resize(out);
  ax.frac.resize(out);
  double scale = (out == 1) ? 0.0 : (double)(in - 1) / (double)(out - 1);
  int max_lo = in >= 2 ? in - 2 : 0;
  for (int i = 0; i < out; ++i) {
    double c = i * scale;
    int lo = (int)c;
    if (lo > max_lo) lo = max_lo;
    if (lo < 0) lo = 0;
    double f = c - lo;
    // match _linear_matrix: weight on min(lo+1, in-1); when in==1 the
    // +=frac lands back on lo so frac contributes to the same sample
    ax.lo[i] = lo;
    ax.frac[i] = (float)f;
  }
  return ax;
}

inline float hu_window(float x, float hu_min, float hu_max, float hu_nan,
                       float inv_range) {
  if (x != x) x = hu_nan;  // NaN
  x = (x - hu_min) * inv_range;
  if (x < 0.f) x = 0.f;
  if (x > 1.f) x = 1.f;
  return x * 255.f;
}

inline uint16_t f32_to_bf16(float v) {
  uint32_t x;
  memcpy(&x, &v, 4);
  x += 0x7fffu + ((x >> 16) & 1u);  // round to nearest even
  return (uint16_t)(x >> 16);
}

// One output-D slice. Downsampling-aware: instead of windowing the
// full h*w slab (the old D pass touched every input row even though
// the H pass reads only ~2*oh of them), each output row fuses
// D-lerp + H-lerp over exactly the 4 input rows it needs, in the SAME
// float op order as the separate passes (bit-identical at -O3; with
// -march=native the compiler may contract mul+add into FMA, shifting
// results by <=1e-4 on the windowed [0,1] scale):
//   a = (1-fd)*W(v00) + fd*W(v10)   // old D pass, row hlo
//   b = (1-fd)*W(v01) + fd*W(v11)   // old D pass, row hhi
//   t = (1-fh)*a + fh*b             // old H pass
// For int16 voxels the HU window is a 64K-entry LUT (exact: the
// window is a pure function of the voxel value). When 2*ow < w the
// W pass inverts too: only the tap columns are computed.
// scratch t1: 3*w floats (row a, row b, merged row).
template <typename InT>
void hu_resize_slice(const InT* in, int64_t d, int64_t h, int64_t w,
                     int a, const LerpAxis& axd, const LerpAxis& axh,
                     const LerpAxis& axw, float hu_min, float hu_max,
                     float hu_nan, float* t1, int oh, int ow,
                     void* out, int out_kind, bool window,
                     const float* lut) {
  const float inv_range = 1.0f / (hu_max - hu_min);
  const int64_t hw = h * w;
  const InT* s0 = in + (int64_t)axd.lo[a] * hw;
  const InT* s1 = in + (int64_t)std::min<int64_t>(axd.lo[a] + 1, d - 1) * hw;
  const float fd = axd.frac[a];
  const float one_fd = 1.f - fd;
  const bool cols = 2 * ow < w;  // downsampling: visit tap columns only
  float* ta = t1;
  float* tb = t1 + w;
  float* tm = t1 + 2 * w;
  const int64_t base = (int64_t)a * oh * ow;

  auto wv = [&](InT x) -> float {
    if (lut) return lut[(uint16_t)x];
    if (window) return hu_window((float)x, hu_min, hu_max, hu_nan,
                                 inv_range);
    return (float)x;
  };
  auto store = [&](int64_t o, float v) {
    if (out_kind == 0) ((float*)out)[o] = v;
    else if (out_kind == 1) ((uint16_t*)out)[o] = f32_to_bf16(v);
    else ((uint8_t*)out)[o] =
        (uint8_t)(v < 0.f ? 0.f : (v > 255.f ? 255.f : v + 0.5f));
  };

  for (int b = 0; b < oh; ++b) {
    const int64_t hlo = axh.lo[b];
    const int64_t hhi = std::min<int64_t>(hlo + 1, h - 1);
    const InT* r00 = s0 + hlo * w;
    const InT* r01 = s0 + hhi * w;
    const InT* r10 = s1 + hlo * w;
    const InT* r11 = s1 + hhi * w;
    const float fh = axh.frac[b];
    const float one_fh = 1.f - fh;
    if (cols) {
      for (int c = 0; c < ow; ++c) {
        const int lo = axw.lo[c];
        const int hi = (int)std::min<int64_t>(lo + 1, w - 1);
        const float fw = axw.frac[c];
        float al = one_fd * wv(r00[lo]) + fd * wv(r10[lo]);
        float bl = one_fd * wv(r01[lo]) + fd * wv(r11[lo]);
        float ah = one_fd * wv(r00[hi]) + fd * wv(r10[hi]);
        float bh = one_fd * wv(r01[hi]) + fd * wv(r11[hi]);
        float vlo = one_fh * al + fh * bl;
        float vhi = one_fh * ah + fh * bh;
        store(base + (int64_t)b * ow + c, (1.f - fw) * vlo + fw * vhi);
      }
    } else {
      if (lut) {
        for (int64_t c = 0; c < w; ++c)
          ta[c] = one_fd * lut[(uint16_t)r00[c]] +
                  fd * lut[(uint16_t)r10[c]];
        for (int64_t c = 0; c < w; ++c)
          tb[c] = one_fd * lut[(uint16_t)r01[c]] +
                  fd * lut[(uint16_t)r11[c]];
      } else if (window) {
        for (int64_t c = 0; c < w; ++c)
          ta[c] = one_fd * hu_window((float)r00[c], hu_min, hu_max,
                                     hu_nan, inv_range) +
                  fd * hu_window((float)r10[c], hu_min, hu_max, hu_nan,
                                 inv_range);
        for (int64_t c = 0; c < w; ++c)
          tb[c] = one_fd * hu_window((float)r01[c], hu_min, hu_max,
                                     hu_nan, inv_range) +
                  fd * hu_window((float)r11[c], hu_min, hu_max, hu_nan,
                                 inv_range);
      } else {
        for (int64_t c = 0; c < w; ++c)
          ta[c] = one_fd * (float)r00[c] + fd * (float)r10[c];
        for (int64_t c = 0; c < w; ++c)
          tb[c] = one_fd * (float)r01[c] + fd * (float)r11[c];
      }
      for (int64_t c = 0; c < w; ++c) tm[c] = one_fh * ta[c] + fh * tb[c];
      for (int c = 0; c < ow; ++c) {
        const int lo = axw.lo[c];
        const int hi = (int)std::min<int64_t>(lo + 1, w - 1);
        const float fw = axw.frac[c];
        store(base + (int64_t)b * ow + c,
              (1.f - fw) * tm[lo] + fw * tm[hi]);
      }
    }
  }
}

template <typename InT>
void hu_resize_run(const InT* in, int64_t d, int64_t h, int64_t w,
                   int od, int oh, int ow, float hu_min, float hu_max,
                   float hu_nan, void* out, int out_kind, bool window,
                   int nthreads) {
  LerpAxis axd = make_axis((int)d, od);
  LerpAxis axh = make_axis((int)h, oh);
  LerpAxis axw = make_axis((int)w, ow);
  // int16 HU window as an exact value->windowed LUT
  std::vector<float> lut;
  if (window && sizeof(InT) == 2) {
    const float inv_range = 1.0f / (hu_max - hu_min);
    lut.resize(65536);
    for (int i = 0; i < 65536; ++i) {
      int16_t s;
      uint16_t u = (uint16_t)i;
      memcpy(&s, &u, 2);
      lut[i] = hu_window((float)s, hu_min, hu_max, hu_nan, inv_range);
    }
  }
  const float* lut_p = lut.empty() ? nullptr : lut.data();
  if (nthreads < 1) nthreads = 1;
  if (nthreads > od) nthreads = od;
  std::atomic<int> next(0);
  auto work = [&] {
    std::vector<float> t1((size_t)3 * w);
    for (;;) {
      int a = next.fetch_add(1);
      if (a >= od) return;
      hu_resize_slice(in, d, h, w, a, axd, axh, axw, hu_min, hu_max,
                      hu_nan, t1.data(), oh, ow, out,
                      out_kind, window, lut_p);
    }
  };
  if (nthreads == 1) {
    work();
  } else {
    std::vector<std::thread> ts;
    for (int i = 0; i < nthreads; ++i) ts.emplace_back(work);
    for (auto& t : ts) t.join();
  }
}

// ---------------------------------------------------------------------
// gzip inflate + minimal NIfTI-1 decode (the .nii.gz ingest fast path)
// ---------------------------------------------------------------------
// The reference preprocessing baseline decodes .nii.gz via SimpleITK
// (reference tools/prepare.py:154-198); the repo's pure-Python reader
// (medicalseg_tpu/io/nifti.py) inflates through the gzip module at
// ~115 MB/s, which made the same-format e2e number 0.91 vol/s
// (BENCH_r03 niigz_e2e_vps). This path does a one-shot libdeflate
// inflate straight into a reusable buffer and fuses the HU window +
// trilinear resize on the decoded voxels without materializing an
// intermediate numpy array.

bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz < 0) { fclose(f); return false; }
  out->resize((size_t)sz);
  bool ok = sz == 0 || fread(out->data(), 1, (size_t)sz, f) == (size_t)sz;
  fclose(f);
  return ok;
}

inline bool is_gzip(const uint8_t* p, size_t n) {
  return n >= 2 && p[0] == 0x1f && p[1] == 0x8b;
}

// Inflate a whole (possibly multi-member) gzip buffer into out.
// Returns bytes written, -2 insufficient space, -3 no backend,
// -4 corrupt stream.
long long gzip_inflate_buf(const uint8_t* in, size_t in_n, uint8_t* out,
                           size_t cap) {
#if defined(ML_WITH_DEFLATE)
  struct libdeflate_decompressor* d = libdeflate_alloc_decompressor();
  if (!d) return -4;
  size_t in_off = 0, out_off = 0;
  while (in_off < in_n) {
    if (in_n - in_off < 18) break;  // trailing garbage / padding
    size_t actual_in = 0, actual_out = 0;
    enum libdeflate_result r = libdeflate_gzip_decompress_ex(
        d, in + in_off, in_n - in_off, out + out_off, cap - out_off,
        &actual_in, &actual_out);
    if (r == LIBDEFLATE_INSUFFICIENT_SPACE) {
      libdeflate_free_decompressor(d);
      return -2;
    }
    if (r != LIBDEFLATE_SUCCESS) {
      libdeflate_free_decompressor(d);
      return -4;
    }
    in_off += actual_in;
    out_off += actual_out;
  }
  libdeflate_free_decompressor(d);
  return (long long)out_off;
#elif defined(ML_WITH_ZLIB)
  z_stream s;
  memset(&s, 0, sizeof(s));
  if (inflateInit2(&s, 16 + MAX_WBITS) != Z_OK) return -4;
  s.next_in = const_cast<uint8_t*>(in);
  s.avail_in = (uInt)in_n;
  s.next_out = out;
  s.avail_out = (uInt)cap;
  long long written = 0;
  for (;;) {
    int r = inflate(&s, Z_NO_FLUSH);
    if (r == Z_STREAM_END) {
      written = (long long)s.total_out;
      if (s.avail_in > 18) {  // concatenated members
        if (inflateReset2(&s, 16 + MAX_WBITS) != Z_OK) break;
        continue;
      }
      break;
    }
    if (r == Z_BUF_ERROR && s.avail_out == 0) {
      inflateEnd(&s);
      return -2;
    }
    if (r != Z_OK) {
      inflateEnd(&s);
      return s.avail_out == 0 ? -2 : -4;
    }
    if (s.avail_out == 0) { inflateEnd(&s); return -2; }
  }
  inflateEnd(&s);
  return written;
#else
  (void)in; (void)in_n; (void)out; (void)cap;
  return -3;
#endif
}

// NIfTI-1 header fields the fast path needs. Little-endian files only
// (the x86 common case); anything else falls back to the Python reader.
struct NiftiInfo {
  int64_t dims[3];   // (z, y, x) voxel-array order
  int dtype;         // NIfTI datatype code
  int64_t vox_offset;
  float scl_slope, scl_inter;
};

bool parse_nifti_header(const uint8_t* p, size_t n, NiftiInfo* out) {
  if (n < 352) return false;
  int32_t sizeof_hdr;
  memcpy(&sizeof_hdr, p, 4);
  if (sizeof_hdr != 348) return false;  // big-endian or not NIfTI-1
  if (memcmp(p + 344, "n+1", 3) != 0 && memcmp(p + 344, "ni1", 3) != 0)
    return false;
  int16_t dim[8];
  memcpy(dim, p + 40, 16);
  int ndim = dim[0];
  if (ndim < 3 || ndim > 7) return false;
  for (int i = 4; i <= ndim; ++i)  // trailing singleton dims only
    if (dim[i] > 1) return false;
  // file stores x fastest; voxel array is (z, y, x)
  out->dims[0] = std::max<int64_t>(1, dim[3]);
  out->dims[1] = std::max<int64_t>(1, dim[2]);
  out->dims[2] = std::max<int64_t>(1, dim[1]);
  int16_t datatype;
  memcpy(&datatype, p + 70, 2);
  out->dtype = datatype;
  float vox_offset;
  memcpy(&vox_offset, p + 108, 4);
  out->vox_offset = (int64_t)vox_offset;
  memcpy(&out->scl_slope, p + 112, 4);
  memcpy(&out->scl_inter, p + 116, 4);
  return true;
}

}  // namespace

extern "C" {

void* ml_create(const char** paths, int n, int threads,
                long long cache_bytes) {
  std::vector<std::string> p(paths, paths + n);
  return new Loader(std::move(p), threads, (size_t)cache_bytes);
}

void ml_destroy(void* h) { delete static_cast<Loader*>(h); }

void ml_prefetch(void* h, const int* idxs, int n) {
  static_cast<Loader*>(h)->prefetch(idxs, n);
}

// Load volume `idx`, converted to float32, into out (out_len floats).
// Returns number of elements written, or -1 on error.
long long ml_load_f32(void* h, int idx, float* out, long long out_len) {
  std::string err;
  auto vol = static_cast<Loader*>(h)->get(idx, &err);
  if (!vol) return -1;
  long long count = 1;
  for (auto s : vol->shape) count *= s;
  if (count > out_len) return -1;
  switch (vol->dtype) {
    case 0:
      memcpy(out, vol->data.data(), count * 4);
      break;
    case 1: {
      const int32_t* src = (const int32_t*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = (float)src[i];
      break;
    }
    case 2: {
      const int16_t* src = (const int16_t*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = (float)src[i];
      break;
    }
    case 3: {
      const uint8_t* src = vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = (float)src[i];
      break;
    }
    case 4: {
      const double* src = (const double*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = (float)src[i];
      break;
    }
    case 5: {
      const int64_t* src = (const int64_t*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = (float)src[i];
      break;
    }
  }
  return count;
}

// Load volume `idx`, converted to int32.
long long ml_load_i32(void* h, int idx, int32_t* out, long long out_len) {
  std::string err;
  auto vol = static_cast<Loader*>(h)->get(idx, &err);
  if (!vol) return -1;
  long long count = 1;
  for (auto s : vol->shape) count *= s;
  if (count > out_len) return -1;
  switch (vol->dtype) {
    case 0: {
      const float* src = (const float*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = (int32_t)src[i];
      break;
    }
    case 1:
      memcpy(out, vol->data.data(), count * 4);
      break;
    case 2: {
      const int16_t* src = (const int16_t*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = src[i];
      break;
    }
    case 3: {
      const uint8_t* src = vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = src[i];
      break;
    }
    case 4: {
      const double* src = (const double*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = (int32_t)src[i];
      break;
    }
    case 5: {
      const int64_t* src = (const int64_t*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = (int32_t)src[i];
      break;
    }
  }
  return count;
}

// Load volume `idx`, converted to uint8 (clamped [0,255]; used for
// label volumes with < 256 classes so the tunnel ships 1 byte/voxel).
long long ml_load_u8(void* h, int idx, uint8_t* out, long long out_len) {
  std::string err;
  auto vol = static_cast<Loader*>(h)->get(idx, &err);
  if (!vol) return -1;
  long long count = 1;
  for (auto s : vol->shape) count *= s;
  if (count > out_len) return -1;
  auto clamp = [](double v) -> uint8_t {
    if (v < 0) return 0;
    if (v > 255) return 255;
    return (uint8_t)v;
  };
  switch (vol->dtype) {
    case 0: {
      const float* src = (const float*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = clamp(src[i]);
      break;
    }
    case 1: {
      const int32_t* src = (const int32_t*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = clamp(src[i]);
      break;
    }
    case 2: {
      const int16_t* src = (const int16_t*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = clamp(src[i]);
      break;
    }
    case 3:
      memcpy(out, vol->data.data(), count);
      break;
    case 4: {
      const double* src = (const double*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = clamp(src[i]);
      break;
    }
    case 5: {
      const int64_t* src = (const int64_t*)vol->data.data();
      for (long long i = 0; i < count; ++i) out[i] = clamp((double)src[i]);
      break;
    }
  }
  return count;
}

// Fused HU-window + trilinear resize of cached volume `idx` to
// (od, oh, ow). out_kind: 0=f32, 1=bf16 (uint16 payload), 2=uint8
// (rounded). window=0 skips HU windowing (plain endpoint-aligned zoom).
// Returns od*oh*ow, or -1 on error.
long long ml_load_hu_resize(void* h, int idx, void* out, int od, int oh,
                            int ow, float hu_min, float hu_max,
                            float hu_nan, int out_kind, int window,
                            int nthreads) {
  std::string err;
  auto vol = static_cast<Loader*>(h)->get(idx, &err);
  if (!vol || vol->shape.size() != 3) return -1;
  int64_t d = vol->shape[0], hh = vol->shape[1], w = vol->shape[2];
  switch (vol->dtype) {
    case 0:
      hu_resize_run((const float*)vol->data.data(), d, hh, w, od, oh, ow,
                    hu_min, hu_max, hu_nan, out, out_kind, window != 0,
                    nthreads);
      break;
    case 2:
      hu_resize_run((const int16_t*)vol->data.data(), d, hh, w, od, oh,
                    ow, hu_min, hu_max, hu_nan, out, out_kind,
                    window != 0, nthreads);
      break;
    default:
      return -1;  // CT raws are f32/i16; others unexpected here
  }
  return (long long)od * oh * ow;
}

// Same fused kernel on a caller-provided f32 [d, h, w] buffer (for
// volumes decoded outside the loader, e.g. NIfTI streams at serve time).
long long ml_hu_resize_f32(const float* in, int d, int hh, int w,
                           void* out, int od, int oh, int ow,
                           float hu_min, float hu_max, float hu_nan,
                           int out_kind, int window, int nthreads) {
  if (d < 1 || hh < 1 || w < 1) return -1;
  hu_resize_run(in, (int64_t)d, (int64_t)hh, (int64_t)w, od, oh, ow,
                hu_min, hu_max, hu_nan, out, out_kind, window != 0,
                nthreads);
  return (long long)od * oh * ow;
}

// int16 input variant (CT scanners emit int16 HU natively).
long long ml_hu_resize_i16(const int16_t* in, int d, int hh, int w,
                           void* out, int od, int oh, int ow,
                           float hu_min, float hu_max, float hu_nan,
                           int out_kind, int window, int nthreads) {
  if (d < 1 || hh < 1 || w < 1) return -1;
  hu_resize_run(in, (int64_t)d, (int64_t)hh, (int64_t)w, od, oh, ow,
                hu_min, hu_max, hu_nan, out, out_kind, window != 0,
                nthreads);
  return (long long)od * oh * ow;
}

// Uncompressed-size hint for a gzip file: the last member's ISIZE
// footer (exact for the single-member files scanners emit). Returns
// -1 on IO error, 0 for an empty/non-gzip file.
long long ml_gzip_isize(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t head[2] = {0, 0};
  if (fread(head, 1, 2, f) != 2 || head[0] != 0x1f || head[1] != 0x8b) {
    fclose(f);
    return 0;
  }
  if (fseek(f, -4, SEEK_END) != 0) { fclose(f); return -1; }
  uint8_t b[4];
  if (fread(b, 1, 4, f) != 4) { fclose(f); return -1; }
  fclose(f);
  return (long long)(b[0] | (b[1] << 8) | (b[2] << 16) |
                     ((uint32_t)b[3] << 24));
}

// Inflate a whole gzip file into out (cap bytes). Returns bytes
// written; -1 IO error, -2 insufficient space (retry with a bigger
// buffer), -3 built without a gzip backend, -4 corrupt stream.
// Releases the GIL for the duration (ctypes).
long long ml_gzip_read(const char* path, uint8_t* out, long long cap) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) return -1;
  if (!is_gzip(raw.data(), raw.size())) return -4;
  return gzip_inflate_buf(raw.data(), raw.size(), out, (size_t)cap);
}

// One-shot .nii / .nii.gz ingest: read + inflate + parse the NIfTI-1
// header + fused HU-window/trilinear-resize to (od, oh, ow), without
// materializing a Python-side intermediate. Supports little-endian
// int16/float32 voxels with no scl scaling (CT's native formats);
// anything else returns -5 and the caller falls back to the pure
// Python reader. in_dims (len >= 3, optional) receives the source
// (z, y, x) shape. Other returns match ml_gzip_read.
long long ml_load_nii_hu_resize(const char* path, void* out, int od,
                                int oh, int ow, float hu_min,
                                float hu_max, float hu_nan, int out_kind,
                                int window, int nthreads,
                                long long* in_dims) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) return -1;
  std::vector<uint8_t> inflated;
  const uint8_t* payload = raw.data();
  size_t payload_n = raw.size();
  if (is_gzip(raw.data(), raw.size())) {
    long long hint = 0;
    if (raw.size() >= 4) {
      const uint8_t* b = raw.data() + raw.size() - 4;
      hint = (long long)(b[0] | (b[1] << 8) | (b[2] << 16) |
                         ((uint32_t)b[3] << 24));
    }
    if (hint < (long long)raw.size()) hint = (long long)raw.size() * 4;
    for (int attempt = 0; attempt < 3; ++attempt) {
      inflated.resize((size_t)hint);
      long long got = gzip_inflate_buf(raw.data(), raw.size(),
                                       inflated.data(), (size_t)hint);
      if (got >= 0) {
        inflated.resize((size_t)got);
        break;
      }
      if (got != -2) return got;
      hint *= 4;
      if (attempt == 2) return -2;
    }
    payload = inflated.data();
    payload_n = inflated.size();
  }
  NiftiInfo info;
  if (!parse_nifti_header(payload, payload_n, &info)) return -5;
  if (info.scl_slope != 0.f && info.scl_slope != 1.f) return -5;
  if (info.scl_inter != 0.f) return -5;
  int64_t d = info.dims[0], hh = info.dims[1], w = info.dims[2];
  if (in_dims) { in_dims[0] = d; in_dims[1] = hh; in_dims[2] = w; }
  int item = info.dtype == 4 ? 2 : (info.dtype == 16 ? 4 : 0);
  if (item == 0) return -5;
  size_t need = (size_t)info.vox_offset + (size_t)d * hh * w * item;
  if (payload_n < need) return -4;
  const uint8_t* vox = payload + info.vox_offset;
  if (info.dtype == 4) {
    hu_resize_run((const int16_t*)vox, d, hh, w, od, oh, ow, hu_min,
                  hu_max, hu_nan, out, out_kind, window != 0, nthreads);
  } else {
    hu_resize_run((const float*)vox, d, hh, w, od, oh, ow, hu_min,
                  hu_max, hu_nan, out, out_kind, window != 0, nthreads);
  }
  return (long long)od * oh * ow;
}

// Shape query: writes up to 8 dims, returns ndim (or -1).
int ml_shape(void* h, int idx, long long* dims) {
  std::string err;
  auto vol = static_cast<Loader*>(h)->get(idx, &err);
  if (!vol) return -1;
  int nd = (int)vol->shape.size();
  for (int i = 0; i < nd && i < 8; ++i) dims[i] = vol->shape[i];
  return nd;
}

}  // extern "C"
