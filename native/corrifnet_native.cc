// corrifnet_native — C++ data-loading runtime for the corrifnet_tpu
// framework.
//
// The reference pipeline's disk hot spot is ~3 x trainSetSize scipy
// loadmat() calls per run (F8_IMAGES4.py:20-34). This library provides:
//   * a MATLAB v5 .mat reader (uncompressed + zlib-compressed elements,
//     numeric classes) returning float32 C-order arrays — the subset the
//     DSTL patches use (double/single/uint8/uint16 'inputPatch' arrays);
//   * a threaded batch assembler that gathers sample indices from the
//     preloaded (N, M, C, H, W) arrays, applies per-channel training-fold
//     mean subtraction, pads ragged final batches, and double-buffers the
//     result so host batch prep overlaps device compute.
//
// C ABI only (consumed via ctypes from corrifnet_tpu.data.native).
// Build: make -C native   (produces libcorrifnet_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

// ---------------------------------------------------------------------------
// MAT v5 reader
// ---------------------------------------------------------------------------

// MAT data types
enum {
  miINT8 = 1, miUINT8 = 2, miINT16 = 3, miUINT16 = 4,
  miINT32 = 5, miUINT32 = 6, miSINGLE = 7, miDOUBLE = 9,
  miINT64 = 12, miUINT64 = 13, miMATRIX = 14, miCOMPRESSED = 15,
  miUTF8 = 16,
};

// mxArray classes
enum {
  mxDOUBLE_CLASS = 6, mxSINGLE_CLASS = 7, mxINT8_CLASS = 8,
  mxUINT8_CLASS = 9, mxINT16_CLASS = 10, mxUINT16_CLASS = 11,
  mxINT32_CLASS = 12, mxUINT32_CLASS = 13,
};

struct Cursor {
  const uint8_t* p;
  size_t len;
  size_t off = 0;
  bool ok() const { return off <= len; }
};

static bool read_tag(Cursor& c, uint32_t* type, uint32_t* nbytes,
                     const uint8_t** data, size_t* advance) {
  if (c.off + 8 > c.len) return false;
  uint32_t t;
  memcpy(&t, c.p + c.off, 4);
  if (t > 0xffff) {  // small element format: type in low 16, size in high 16
    *type = t & 0xffff;
    *nbytes = t >> 16;
    if (*nbytes > 4) return false;  // small elements hold at most 4 bytes
    *data = c.p + c.off + 4;
    *advance = 8;
  } else {
    *type = t;
    memcpy(nbytes, c.p + c.off + 4, 4);
    *data = c.p + c.off + 8;
    size_t padded = (*nbytes + 7) & ~size_t(7);
    *advance = 8 + padded;
    // Reject tags whose payload extends past the buffer (truncated file).
    if (c.off + 8 + (size_t)*nbytes > c.len) return false;
  }
  return true;
}

static size_t mi_elem_size(uint32_t type) {
  switch (type) {
    case miINT8: case miUINT8: case miUTF8: return 1;
    case miINT16: case miUINT16: return 2;
    case miINT32: case miUINT32: case miSINGLE: return 4;
    case miDOUBLE: case miINT64: case miUINT64: return 8;
    default: return 0;
  }
}

template <typename T>
static void convert_to_f32(const uint8_t* src, size_t n, float* dst) {
  const T* s = reinterpret_cast<const T*>(src);
  for (size_t i = 0; i < n; i++) dst[i] = static_cast<float>(s[i]);
}

// Parse a miMATRIX payload; on success allocates *out (malloc) with C-order
// float32 data and fills dims. Returns 0 on success.
static int parse_matrix(const uint8_t* buf, size_t len, const char* want_name,
                        float** out, int64_t* dims_out, int* ndims_out) {
  Cursor c{buf, len};
  uint32_t type, nbytes;
  const uint8_t* data;
  size_t adv;

  // array flags
  if (!read_tag(c, &type, &nbytes, &data, &adv)) return -2;
  if (nbytes < 4) return -2;
  uint32_t flags;
  memcpy(&flags, data, 4);
  uint8_t cls = flags & 0xff;
  c.off += adv;

  // dimensions
  if (!read_tag(c, &type, &nbytes, &data, &adv)) return -3;
  int nd = nbytes / 4;
  if (nd < 1 || nd > 8) return -4;
  std::vector<int32_t> dims(nd);
  memcpy(dims.data(), data, (size_t)nd * 4);
  c.off += adv;

  // name
  if (!read_tag(c, &type, &nbytes, &data, &adv)) return -5;
  std::string name(reinterpret_cast<const char*>(data), nbytes);
  c.off += adv;
  if (want_name && want_name[0] && name != want_name) return 1;  // skip

  // real part
  if (!read_tag(c, &type, &nbytes, &data, &adv)) return -6;
  size_t n = 1;
  for (int i = 0; i < nd; i++) {
    if (dims[i] <= 0) return -4;
    size_t d = (size_t)dims[i];
    if (n > SIZE_MAX / d / sizeof(double)) return -4;  // product overflow guard
    n *= d;
  }
  size_t esz = mi_elem_size(type);
  if (esz == 0) return -8;
  // The payload must actually hold n elements (truncated/corrupt files).
  if (n * esz > (size_t)nbytes) return -6;

  float* colmajor = (float*)malloc(n * sizeof(float));
  if (!colmajor) return -7;
  switch (type) {
    case miDOUBLE: convert_to_f32<double>(data, n, colmajor); break;
    case miSINGLE: convert_to_f32<float>(data, n, colmajor); break;
    case miUINT8:  convert_to_f32<uint8_t>(data, n, colmajor); break;
    case miINT8:   convert_to_f32<int8_t>(data, n, colmajor); break;
    case miUINT16: convert_to_f32<uint16_t>(data, n, colmajor); break;
    case miINT16:  convert_to_f32<int16_t>(data, n, colmajor); break;
    case miINT32:  convert_to_f32<int32_t>(data, n, colmajor); break;
    case miUINT32: convert_to_f32<uint32_t>(data, n, colmajor); break;
    default: free(colmajor); return -8;
  }
  (void)cls;

  // column-major (MATLAB) -> C-order, generic N-D transpose
  float* corder = (float*)malloc(n * sizeof(float));
  if (!corder) { free(colmajor); return -7; }
  std::vector<size_t> cstrides(nd), fstrides(nd);
  size_t acc = 1;
  for (int i = 0; i < nd; i++) { fstrides[i] = acc; acc *= dims[i]; }
  acc = 1;
  for (int i = nd - 1; i >= 0; i--) { cstrides[i] = acc; acc *= dims[i]; }
  std::vector<int64_t> idx(nd, 0);
  for (size_t flat = 0; flat < n; flat++) {
    size_t fsrc = 0;
    for (int i = 0; i < nd; i++) fsrc += idx[i] * fstrides[i];
    corder[flat] = colmajor[fsrc];
    for (int i = nd - 1; i >= 0; i--) {
      if (++idx[i] < dims[i]) break;
      idx[i] = 0;
    }
  }
  free(colmajor);

  *out = corder;
  for (int i = 0; i < nd; i++) dims_out[i] = dims[i];
  *ndims_out = nd;
  return 0;
}

extern "C" {

// Load variable `varname` (empty string = first numeric array) from a MAT v5
// file as float32 C-order. Returns 0 on success; caller frees with cif_free.
int cif_load_mat(const char* path, const char* varname, float** out,
                 int64_t* dims_out, int* ndims_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (fsize < 128) { fclose(f); return -1; }
  std::vector<uint8_t> buf(fsize);
  if (fread(buf.data(), 1, fsize, f) != (size_t)fsize) { fclose(f); return -1; }
  fclose(f);

  Cursor c{buf.data(), (size_t)fsize};
  c.off = 128;  // skip header (116 text + 8 subsys + 2 version + 2 endian)

  while (c.off + 8 <= c.len) {
    uint32_t type, nbytes;
    const uint8_t* data;
    size_t adv;
    if (!read_tag(c, &type, &nbytes, &data, &adv)) break;

    if (type == miCOMPRESSED) {
      // inflate, then parse the contained miMATRIX
      uLongf cap = (uLongf)nbytes * 8 + 1024;
      std::vector<uint8_t> raw;
      int zrc;
      do {
        raw.resize(cap);
        uLongf outlen = cap;
        zrc = uncompress(raw.data(), &outlen, data, nbytes);
        if (zrc == Z_OK) { raw.resize(outlen); break; }
        cap *= 2;
      } while (zrc == Z_BUF_ERROR && cap < (uLongf)1 << 31);
      if (zrc == Z_OK && raw.size() >= 8) {
        uint32_t itype, inb;
        memcpy(&itype, raw.data(), 4);
        memcpy(&inb, raw.data() + 4, 4);
        if (itype == miMATRIX && (size_t)inb <= raw.size() - 8) {
          int rc = parse_matrix(raw.data() + 8, inb, varname, out, dims_out,
                                ndims_out);
          if (rc == 0) return 0;
        }
      }
    } else if (type == miMATRIX) {
      int rc = parse_matrix(data, nbytes, varname, out, dims_out, ndims_out);
      if (rc == 0) return 0;
    }
    c.off += adv;
  }
  return -9;
}

void cif_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// Batch assembler: gather + normalize + pad, double-buffered worker thread
// ---------------------------------------------------------------------------

struct Batcher {
  const float* images;  // (N, M, C, H, W)
  const float* masks;   // (N, M, 1, H, W)
  std::vector<int64_t> indices;
  int64_t sample_floats_img, sample_floats_msk;
  int64_t batch_size, n_batches;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  struct Slot {
    std::vector<float> img, msk, valid;
    int64_t id = -1;
  };
  std::vector<Slot> slots;
  std::queue<int> ready;
  std::queue<int> free_slots;
  int64_t consumed = 0;
  bool stop = false;

  void run() {
    for (int64_t b = 0; b < n_batches && !stop; b++) {
      int slot;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_empty.wait(lk, [&] { return stop || !free_slots.empty(); });
        if (stop) return;
        slot = free_slots.front();
        free_slots.pop();
      }
      Slot& s = slots[slot];
      int64_t start = b * batch_size;
      for (int64_t i = 0; i < batch_size; i++) {
        float* dst_i = s.img.data() + i * sample_floats_img;
        float* dst_m = s.msk.data() + i * sample_floats_msk;
        if (start + i < (int64_t)indices.size()) {
          int64_t src = indices[start + i];
          memcpy(dst_i, images + src * sample_floats_img,
                 sample_floats_img * sizeof(float));
          memcpy(dst_m, masks + src * sample_floats_msk,
                 sample_floats_msk * sizeof(float));
          s.valid[i] = 1.0f;
        } else {
          memset(dst_i, 0, sample_floats_img * sizeof(float));
          memset(dst_m, 0, sample_floats_msk * sizeof(float));
          s.valid[i] = 0.0f;
        }
      }
      s.id = b;
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.push(slot);
      }
      cv_full.notify_one();
    }
  }
};

void* cif_batcher_create(const float* images, const float* masks,
                         const int64_t* indices, int64_t n_indices,
                         int64_t sample_floats_img, int64_t sample_floats_msk,
                         int64_t batch_size, int n_buffers) {
  Batcher* b = new Batcher();
  b->images = images;
  b->masks = masks;
  b->indices.assign(indices, indices + n_indices);
  b->sample_floats_img = sample_floats_img;
  b->sample_floats_msk = sample_floats_msk;
  b->batch_size = batch_size;
  b->n_batches = (n_indices + batch_size - 1) / batch_size;
  b->slots.resize(n_buffers);
  for (int i = 0; i < n_buffers; i++) {
    b->slots[i].img.resize(batch_size * sample_floats_img);
    b->slots[i].msk.resize(batch_size * sample_floats_msk);
    b->slots[i].valid.resize(batch_size);
    b->free_slots.push(i);
  }
  b->worker = std::thread([b] { b->run(); });
  return b;
}

int64_t cif_batcher_num_batches(void* handle) {
  return static_cast<Batcher*>(handle)->n_batches;
}

// Blocks until the next batch is ready; copies into caller buffers.
// Returns the batch id, or -1 when exhausted.
int64_t cif_batcher_next(void* handle, float* img_out, float* msk_out,
                         float* valid_out) {
  Batcher* b = static_cast<Batcher*>(handle);
  int slot;
  {
    std::unique_lock<std::mutex> lk(b->mu);
    if (b->consumed >= b->n_batches) return -1;
    b->cv_full.wait(lk, [&] { return b->stop || !b->ready.empty(); });
    if (b->ready.empty()) return -1;
    slot = b->ready.front();
    b->ready.pop();
    b->consumed++;
  }
  Batcher::Slot& s = b->slots[slot];
  int64_t id = s.id;
  memcpy(img_out, s.img.data(), s.img.size() * sizeof(float));
  memcpy(msk_out, s.msk.data(), s.msk.size() * sizeof(float));
  memcpy(valid_out, s.valid.data(), s.valid.size() * sizeof(float));
  {
    std::lock_guard<std::mutex> lk(b->mu);
    b->free_slots.push(slot);
  }
  b->cv_empty.notify_one();
  return id;
}

void cif_batcher_destroy(void* handle) {
  Batcher* b = static_cast<Batcher*>(handle);
  {
    std::lock_guard<std::mutex> lk(b->mu);
    b->stop = true;
  }
  b->cv_empty.notify_all();
  b->cv_full.notify_all();
  if (b->worker.joinable()) b->worker.join();
  delete b;
}

}  // extern "C"
