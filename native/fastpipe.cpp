// fastpipe: native host-side data pipeline for multimodal_neuroimage_tpu.
//
// The reference framework's input pipeline runs nitime FIR filtering, zscore
// and padding in Python per item per epoch on DataLoader workers (reference
// data_preprocess_and_load/datasets.py:272-307) — the #1 input-pipeline cost
// (SURVEY §7.2 step 5). This library is the C++ equivalent of that host
// stage, built for feeding a TPU: a worker pool parses .npy files, applies
// the zero-phase FIR band split (bit-compatible with scipy.signal.filtfilt:
// odd extension, padlen = 3*ntaps, steady-state initial conditions), per-ROI
// zscore, and symmetric padding, writing straight into a caller-provided
// pinned buffer so the Python layer only does one jax.device_put per batch.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        -o libfastpipe.so fastpipe.cpp

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// Minimal .npy parser (v1/v2 headers, little-endian f4/f8, C order).
// ---------------------------------------------------------------------------
struct NpyArray {
  std::vector<double> data;  // promoted to f64 for filtering
  std::vector<int64_t> shape;
};

bool parse_npy(const char* path, NpyArray* out, std::string* err) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { *err = std::string("open failed: ") + path; return false; }
  unsigned char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fclose(f); *err = "bad npy magic"; return false;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (std::fread(b, 1, 2, f) != 2) { std::fclose(f); *err = "trunc"; return false; }
    header_len = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (std::fread(b, 1, 4, f) != 4) { std::fclose(f); *err = "trunc"; return false; }
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
  }
  std::string header(header_len, '\0');
  if (std::fread(&header[0], 1, header_len, f) != header_len) {
    std::fclose(f); *err = "trunc header"; return false;
  }
  bool f32 = header.find("'<f4'") != std::string::npos ||
             header.find("'|f4'") != std::string::npos;
  bool f64 = header.find("'<f8'") != std::string::npos;
  bool fortran = header.find("'fortran_order': True") != std::string::npos;
  if ((!f32 && !f64) || fortran) {
    std::fclose(f); *err = "unsupported npy dtype/order: " + header;
    return false;
  }
  auto lp = header.find("'shape': (");
  if (lp == std::string::npos) { std::fclose(f); *err = "no shape"; return false; }
  lp += 10;
  auto rp = header.find(')', lp);
  std::string dims = header.substr(lp, rp - lp);
  out->shape.clear();
  int64_t cur = -1;
  for (char c : dims) {
    if (c >= '0' && c <= '9') cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
    else if (cur >= 0) { out->shape.push_back(cur); cur = -1; }
  }
  if (cur >= 0) out->shape.push_back(cur);
  int64_t count = 1;
  for (auto d : out->shape) count *= d;
  out->data.resize(count);
  if (f64) {
    if (std::fread(out->data.data(), 8, count, f) != size_t(count)) {
      std::fclose(f); *err = "trunc data"; return false;
    }
  } else {
    std::vector<float> tmp(count);
    if (std::fread(tmp.data(), 4, count, f) != size_t(count)) {
      std::fclose(f); *err = "trunc data"; return false;
    }
    for (int64_t i = 0; i < count; ++i) out->data[i] = tmp[i];
  }
  std::fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// Zero-phase FIR (scipy.signal.filtfilt semantics: odd extension,
// padlen = 3*ntaps, steady-state initial conditions == edge replication for
// a pure-FIR filter applied to the already-extended signal).
// ---------------------------------------------------------------------------
void fir_forward(const double* x, int64_t n, const double* taps, int ntaps,
                 double* y) {
  // y[i] = sum_k taps[k] * x[i - k], x[-j] treated as x[0] (steady state on
  // the extended signal; the extension makes edge values exact).
  int m = ntaps - 1;
  for (int64_t i = 0; i < n; ++i) {
    double acc = 0.0;
    int kmax = int(std::min<int64_t>(m, i));
    for (int k = 0; k <= kmax; ++k) acc += taps[k] * x[i - k];
    if (i < m) {
      double x0 = x[0];
      for (int k = int(i) + 1; k <= m; ++k) acc += taps[k] * x0;
    }
    y[i] = acc;
  }
}

void filtfilt_row(const double* x, int64_t T, const double* taps, int ntaps,
                  double* out, std::vector<double>* scratch) {
  int64_t padlen = 3 * int64_t(ntaps);
  int64_t ext = T + 2 * padlen;
  scratch->resize(size_t(3 * ext));
  double* e = scratch->data();
  double* fwd = e + ext;
  double* rev = fwd + ext;
  // odd extension
  for (int64_t j = 0; j < padlen; ++j)
    e[j] = 2.0 * x[0] - x[padlen - j];
  std::memcpy(e + padlen, x, sizeof(double) * T);
  for (int64_t j = 0; j < padlen; ++j)
    e[padlen + T + j] = 2.0 * x[T - 1] - x[T - 2 - j];
  fir_forward(e, ext, taps, ntaps, fwd);
  // reverse, filter, reverse
  for (int64_t j = 0; j < ext; ++j) rev[j] = fwd[ext - 1 - j];
  fir_forward(rev, ext, taps, ntaps, fwd);
  for (int64_t j = 0; j < T; ++j) out[j] = fwd[ext - 1 - (padlen + j)];
}

void zscore_row(double* x, int64_t n) {
  double mean = 0.0;
  for (int64_t i = 0; i < n; ++i) mean += x[i];
  mean /= double(n);
  double var = 0.0;
  for (int64_t i = 0; i < n; ++i) { double d = x[i] - mean; var += d * d; }
  double inv = var > 0 ? 1.0 / std::sqrt(var / double(n)) : 0.0;
  for (int64_t i = 0; i < n; ++i) x[i] = (x[i] - mean) * inv;
}

// ---------------------------------------------------------------------------
// Worker pool
// ---------------------------------------------------------------------------
class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      threads_.emplace_back([this] { loop(); });
  }
  ~Pool() {
    { std::lock_guard<std::mutex> g(mu_); stop_ = true; }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  void submit(std::function<void()> fn) {
    { std::lock_guard<std::mutex> g(mu_); work_.push(std::move(fn)); }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !work_.empty(); });
        if (stop_ && work_.empty()) return;
        fn = std::move(work_.front());
        work_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> work_;
  std::vector<std::thread> threads_;
  bool stop_;
};

Pool* pool(int nthreads) {
  static Pool* p = new Pool(nthreads > 0 ? nthreads
                                         : int(std::thread::hardware_concurrency()));
  return p;
}

struct Latch {
  explicit Latch(int n) : count(n) {}
  void done() {
    std::unique_lock<std::mutex> lk(mu);
    if (--count == 0) cv.notify_all();
  }
  void wait() {
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [this] { return count == 0; });
  }
  std::mutex mu;
  std::condition_variable cv;
  int count;
};

thread_local std::vector<double> tl_scratch;

// ---------------------------------------------------------------------------
// NIfTI-1 volume loader (.nii / .nii.gz) — native twin of
// multimodal_neuroimage_tpu/data/nifti.py:read_nifti (reference
// datasets.py:130-169 loads these via nibabel). Whole-file slurp with
// transparent zlib/gzip inflate, header parse (byteswap-aware), dtype
// widening through double with scl_slope/scl_inter, and Fortran-to-C
// reorder so the output matches what np.stack over the Python item path
// produces.
// ---------------------------------------------------------------------------
bool read_file_maybe_gz(const char* path, std::vector<unsigned char>* out,
                        std::string* err) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { *err = std::string("open failed: ") + path; return false; }
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (fsize <= 0) { std::fclose(f); *err = "empty file"; return false; }
  std::vector<unsigned char> comp((size_t(fsize)));
  if (std::fread(comp.data(), 1, comp.size(), f) != comp.size()) {
    std::fclose(f); *err = "short read"; return false;
  }
  std::fclose(f);
  if (comp.size() >= 2 && comp[0] == 0x1f && comp[1] == 0x8b) {
    z_stream s;
    std::memset(&s, 0, sizeof(s));
    if (inflateInit2(&s, 15 + 32) != Z_OK) {  // auto gzip/zlib
      *err = "inflateInit2 failed"; return false;
    }
    out->resize(std::max<size_t>(comp.size() * 4, size_t(1) << 20));
    s.next_in = comp.data();
    s.avail_in = uInt(comp.size());
    size_t have = 0;
    int ret = Z_OK;
    while (ret != Z_STREAM_END) {
      if (have == out->size()) out->resize(out->size() * 2);
      s.next_out = out->data() + have;
      s.avail_out = uInt(out->size() - have);
      ret = inflate(&s, Z_NO_FLUSH);
      if (ret != Z_OK && ret != Z_STREAM_END) {
        inflateEnd(&s);
        *err = std::string("gzip inflate failed: ") + path;
        return false;
      }
      have = out->size() - s.avail_out;
    }
    inflateEnd(&s);
    out->resize(have);
  } else {
    *out = std::move(comp);
  }
  return true;
}

void bswap_inplace(unsigned char* p, int64_t count, int itemsize) {
  for (int64_t i = 0; i < count; ++i, p += itemsize)
    for (int a = 0, b = itemsize - 1; a < b; ++a, --b)
      std::swap(p[a], p[b]);
}

template <typename T>
void nifti_f2c(const unsigned char* src, float* dst, const int64_t* shape,
               int ndim, int64_t count, double slope, double inter,
               bool scale) {
  // walk logical C order; fidx tracks the Fortran-order source offset
  const T* s = reinterpret_cast<const T*>(src);
  int64_t fstr[8], idx[8];
  fstr[0] = 1;
  for (int d = 1; d < ndim; ++d) fstr[d] = fstr[d - 1] * shape[d - 1];
  for (int d = 0; d < ndim; ++d) idx[d] = 0;
  int64_t fidx = 0;
  for (int64_t i = 0; i < count; ++i) {
    double v = double(s[fidx]);
    if (scale) v = v * slope + inter;
    dst[i] = float(v);
    for (int d = ndim - 1; d >= 0; --d) {
      ++idx[d];
      fidx += fstr[d];
      if (idx[d] < shape[d]) break;
      fidx -= fstr[d] * shape[d];
      idx[d] = 0;
    }
  }
}

int16_t rd_i16(const unsigned char* p, bool sw) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  if (sw) v = uint16_t((v >> 8) | (v << 8));
  int16_t out;
  std::memcpy(&out, &v, 2);
  return out;
}

float rd_f32(const unsigned char* p, bool sw) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  if (sw) v = __builtin_bswap32(v);
  float out;
  std::memcpy(&out, &v, 4);
  return out;
}

bool load_nifti(const char* path, const int64_t* want_shape, int want_ndim,
                float* dst, std::string* err) {
  std::vector<unsigned char> buf;
  if (!read_file_maybe_gz(path, &buf, err)) return false;
  if (buf.size() < 348) { *err = std::string("truncated header: ") + path;
                          return false; }
  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, buf.data(), 4);
  bool sw = false;
  if (sizeof_hdr != 348) {
    sw = true;
    int32_t v = int32_t(__builtin_bswap32(uint32_t(sizeof_hdr)));
    if (v != 348) { *err = std::string("not NIfTI-1: ") + path; return false; }
  }
  if (!(buf[344] == 'n' && (buf[345] == '+' || buf[345] == 'i'))) {
    *err = std::string("bad NIfTI magic: ") + path; return false;
  }
  int16_t dim[8];
  for (int d = 0; d < 8; ++d) dim[d] = rd_i16(buf.data() + 40 + 2 * d, sw);
  int ndim = dim[0];
  if (ndim < 1 || ndim > 7) { *err = "bad ndim"; return false; }
  int16_t datatype = rd_i16(buf.data() + 70, sw);
  double vox_offset = double(rd_f32(buf.data() + 108, sw));
  double slope = double(rd_f32(buf.data() + 112, sw));
  double inter = double(rd_f32(buf.data() + 116, sw));
  bool scale = !((slope == 0.0 || slope == 1.0) && inter == 0.0);
  if (slope == 0.0) slope = 1.0;

  int64_t shape[8];
  int64_t count = 1;
  for (int d = 0; d < ndim; ++d) { shape[d] = dim[1 + d]; count *= shape[d]; }
  if (ndim != want_ndim ||
      std::memcmp(shape, want_shape, sizeof(int64_t) * ndim) != 0) {
    *err = std::string("volume shape mismatch: ") + path;
    return false;
  }
  int itemsize;
  switch (datatype) {
    case 2: case 256: itemsize = 1; break;            // u8 / i8
    case 4: case 512: itemsize = 2; break;            // i16 / u16
    case 8: case 768: case 16: itemsize = 4; break;   // i32 / u32 / f32
    case 64: case 1024: case 1280: itemsize = 8; break;  // f64 / i64 / u64
    default:
      *err = "unsupported NIfTI datatype " + std::to_string(datatype);
      return false;
  }
  size_t off = size_t(vox_offset);
  if (buf.size() < off + size_t(count) * itemsize) {
    *err = std::string("truncated data: ") + path; return false;
  }
  unsigned char* data = buf.data() + off;
  if (sw && itemsize > 1) bswap_inplace(data, count, itemsize);
  switch (datatype) {
    case 2:    nifti_f2c<uint8_t>(data, dst, shape, ndim, count, slope, inter, scale); break;
    case 256:  nifti_f2c<int8_t>(data, dst, shape, ndim, count, slope, inter, scale); break;
    case 4:    nifti_f2c<int16_t>(data, dst, shape, ndim, count, slope, inter, scale); break;
    case 512:  nifti_f2c<uint16_t>(data, dst, shape, ndim, count, slope, inter, scale); break;
    case 8:    nifti_f2c<int32_t>(data, dst, shape, ndim, count, slope, inter, scale); break;
    case 768:  nifti_f2c<uint32_t>(data, dst, shape, ndim, count, slope, inter, scale); break;
    case 16:   nifti_f2c<float>(data, dst, shape, ndim, count, slope, inter, scale); break;
    case 64:   nifti_f2c<double>(data, dst, shape, ndim, count, slope, inter, scale); break;
    case 1024: nifti_f2c<int64_t>(data, dst, shape, ndim, count, slope, inter, scale); break;
    case 1280: nifti_f2c<uint64_t>(data, dst, shape, ndim, count, slope, inter, scale); break;
  }
  return true;
}

}  // namespace

extern "C" {

// Band-split a batch of ABCD fMRI .npy files.
//
// paths:      n null-terminated file paths (concatenated, offsets in
//             path_offsets[n+1])
// taps/ntaps: FIR highpass taps (designed in Python once)
// skip_tr:    leading TRs to drop (reference datasets.py:222 -> 20)
// t_max:      padded length (368)
// out_raw/low/ul: (n, t_max, n_rois) float32 C-order buffers. Layout matches
//             the reference per-item dicts: per-ROI zscore over the native
//             extent, symmetric zero pad, (time, ROI) transpose.
// lengths:    (n,) int32 native lengths (for the device path / diagnostics)
// Returns 0 on success; on error returns 1 and writes the first error to
// errbuf (errbuf_len bytes).
int fastpipe_bandsplit_batch(
    const char* paths, const int64_t* path_offsets, int n,
    const double* taps, int ntaps, int skip_tr, int t_max, int n_rois,
    float* out_raw, float* out_low, float* out_ul, int32_t* lengths,
    int nthreads, char* errbuf, int errbuf_len) {
  std::atomic<int> failed{0};
  std::mutex err_mu;
  std::string first_err;
  Latch latch(n);
  Pool* p = pool(nthreads);

  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      NpyArray arr;
      std::string err;
      std::string path(paths + path_offsets[i],
                       paths + path_offsets[i + 1] - 1);
      if (!parse_npy(path.c_str(), &arr, &err) || arr.shape.size() != 2) {
        failed.store(1);
        std::lock_guard<std::mutex> g(err_mu);
        if (first_err.empty()) first_err = err.empty() ? "bad shape" : err;
        latch.done();
        return;
      }
      // file layout (T_total, R); drop skip_tr, transpose to (R, T)
      int64_t t_total = arr.shape[0], R = arr.shape[1];
      int64_t T = t_total - skip_tr;
      if (R != n_rois || T <= 0 || T > t_max) {
        failed.store(1);
        std::lock_guard<std::mutex> g(err_mu);
        if (first_err.empty())
          first_err = "unexpected shape in " + path;
        latch.done();
        return;
      }
      lengths[i] = int32_t(T);
      int64_t front = (t_max - T) / 2;
      std::vector<double> row(T), low(T), ul(T);
      float* raw_out = out_raw + int64_t(i) * t_max * n_rois;
      float* low_out = out_low + int64_t(i) * t_max * n_rois;
      float* ul_out = out_ul + int64_t(i) * t_max * n_rois;
      std::memset(raw_out, 0, sizeof(float) * t_max * n_rois);
      std::memset(low_out, 0, sizeof(float) * t_max * n_rois);
      std::memset(ul_out, 0, sizeof(float) * t_max * n_rois);
      for (int64_t r = 0; r < R; ++r) {
        for (int64_t t = 0; t < T; ++t)
          row[t] = arr.data[(skip_tr + t) * R + r];
        filtfilt_row(row.data(), T, taps, ntaps, low.data(), &tl_scratch);
        for (int64_t t = 0; t < T; ++t) ul[t] = row[t] - low[t];
        zscore_row(row.data(), T);
        zscore_row(low.data(), T);
        zscore_row(ul.data(), T);
        for (int64_t t = 0; t < T; ++t) {
          raw_out[(front + t) * n_rois + r] = float(row[t]);
          low_out[(front + t) * n_rois + r] = float(low[t]);
          ul_out[(front + t) * n_rois + r] = float(ul[t]);
        }
      }
      latch.done();
    });
  }
  latch.wait();
  if (failed.load()) {
    std::snprintf(errbuf, errbuf_len, "%s", first_err.c_str());
    return 1;
  }
  return 0;
}

// Load a batch of 2-D matrix .npy files (DTI/sMRI/combined), global zscore,
// into a (n, rows, cols) float32 buffer (reference datasets.py:416, 474, 600).
int fastpipe_matrix_batch(
    const char* paths, const int64_t* path_offsets, int n,
    int rows, int cols, float* out, int nthreads,
    char* errbuf, int errbuf_len) {
  std::atomic<int> failed{0};
  std::mutex err_mu;
  std::string first_err;
  Latch latch(n);
  Pool* p = pool(nthreads);
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      NpyArray arr;
      std::string err;
      std::string path(paths + path_offsets[i],
                       paths + path_offsets[i + 1] - 1);
      if (!parse_npy(path.c_str(), &arr, &err) || arr.shape.size() != 2 ||
          arr.shape[0] != rows || arr.shape[1] != cols) {
        failed.store(1);
        std::lock_guard<std::mutex> g(err_mu);
        if (first_err.empty()) first_err = err.empty() ? ("bad shape " + path) : err;
        latch.done();
        return;
      }
      zscore_row(arr.data.data(), int64_t(rows) * cols);
      float* dst = out + int64_t(i) * rows * cols;
      for (int64_t j = 0; j < int64_t(rows) * cols; ++j)
        dst[j] = float(arr.data[j]);
      latch.done();
    });
  }
  latch.wait();
  if (failed.load()) {
    std::snprintf(errbuf, errbuf_len, "%s", first_err.c_str());
    return 1;
  }
  return 0;
}

// Load a batch of NIfTI-1 volumes (.nii / .nii.gz) into a
// (n, *shape) float32 C-order buffer (the 4-D fMRI_image path, reference
// datasets.py:130-169). Every volume must match the expected logical
// `shape` (ndim ints) — the caller peeks the first header for it.
int fastpipe_nifti_batch(
    const char* paths, const int64_t* path_offsets, int n,
    const int64_t* shape, int ndim, float* out, int nthreads,
    char* errbuf, int errbuf_len) {
  std::atomic<int> failed{0};
  std::mutex err_mu;
  std::string first_err;
  Latch latch(n);
  Pool* p = pool(nthreads);
  int64_t count = 1;
  for (int d = 0; d < ndim; ++d) count *= shape[d];
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      std::string err;
      std::string path(paths + path_offsets[i],
                       paths + path_offsets[i + 1] - 1);
      if (!load_nifti(path.c_str(), shape, ndim, out + int64_t(i) * count,
                      &err)) {
        failed.store(1);
        std::lock_guard<std::mutex> g(err_mu);
        if (first_err.empty()) first_err = err;
      }
      latch.done();
    });
  }
  latch.wait();
  if (failed.load()) {
    std::snprintf(errbuf, errbuf_len, "%s", first_err.c_str());
    return 1;
  }
  return 0;
}

}  // extern "C"
