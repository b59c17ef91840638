// Async native data executor: file read -> JPEG/PNG decode -> bbox crop ->
// scale/crop/flip -> multi-scale pyramid -> CLIP normalize, fully off the
// Python thread.
//
// The reference feeds its models through torch DataLoader worker processes
// (main.py:176-182, pretrain_DAMSM.py:421-437) doing PIL decode + transform
// per sample (datasets.py:86-115).  This executor is the TPU-native
// equivalent of that host runtime: a C++ thread pool with a ring of
// pre-allocated batch slots.  Python submits a *plan* per batch (file paths,
// optional CUB bbox, crop fractions, flip bits); workers fill the slot's
// per-branch float32 buffers; Python blocks only on the oldest in-flight
// batch.  Decode uses libjpeg/libpng directly — the same codecs PIL wraps —
// so pixels match the PIL path exactly.
//
// Ownership protocol (mirrored by t2igan/native/__init__.py::AsyncExecutor):
//   submit(batch) -> blocks only if all slots are in flight
//   wait()        -> blocks for the OLDEST submitted batch; returns its
//                    buffers, which stay valid until release(batch_id)
//   release(id)   -> recycles the slot
//
// Build: g++ -O3 -shared -fPIC -std=c++17 image_exec.cc -o
//        libt2igan_exec.so -ljpeg -lpng -lpthread
// (done automatically by t2igan/native/__init__.py).

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

#include "image_core.h"

namespace {

// ---------------------------------------------------------------- decode

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>& rgb,
                 int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // grayscale -> RGB conversion in-codec
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_components != 3) {  // e.g. CMYK: let Python PIL handle it
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  rgb.resize(static_cast<size_t>(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb.data() +
        static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(const uint8_t* data, size_t len, std::vector<uint8_t>& rgb,
                int* h, int* w) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, len)) return false;
  image.format = PNG_FORMAT_RGB;  // palette/gray/alpha all converted
  *w = static_cast<int>(image.width);
  *h = static_cast<int>(image.height);
  rgb.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, rgb.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

// Sniff magic and decode.  Returns false on unsupported/corrupt input.
bool decode_image(const uint8_t* data, size_t len, std::vector<uint8_t>& rgb,
                  int* h, int* w) {
  if (len >= 2 && data[0] == 0xFF && data[1] == 0xD8)
    return decode_jpeg(data, len, rgb, h, w);
  if (len >= 4 && data[0] == 0x89 && data[1] == 0x50 && data[2] == 0x4E &&
      data[3] == 0x47)
    return decode_png(data, len, rgb, h, w);
  return false;
}

bool read_file(const std::string& path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n < 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(out.data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

// 75%-padded square crop around the bbox center (datasets.py:91-98).
// bbox = [x, y, w, h]; in-place replaces rgb/h/w with the cropped view.
void crop_to_bbox(std::vector<uint8_t>& rgb, int* h, int* w,
                  const int bbox[4]) {
  const int width = *w, height = *h;
  const int r = static_cast<int>(std::max(bbox[2], bbox[3]) * 0.75);
  const int cx = (2 * bbox[0] + bbox[2]) / 2;
  const int cy = (2 * bbox[1] + bbox[3]) / 2;
  const int y1 = std::max(0, cy - r), y2 = std::min(height, cy + r);
  const int x1 = std::max(0, cx - r), x2 = std::min(width, cx + r);
  const int nh = std::max(0, y2 - y1), nw = std::max(0, x2 - x1);
  if (nh <= 0 || nw <= 0) return;  // degenerate box: keep full image
  std::vector<uint8_t> out(static_cast<size_t>(nh) * nw * 3);
  for (int y = 0; y < nh; ++y) {
    std::memcpy(out.data() + static_cast<size_t>(y) * nw * 3,
                rgb.data() + (static_cast<size_t>(y1 + y) * width + x1) * 3,
                static_cast<size_t>(nw) * 3);
  }
  rgb.swap(out);
  *h = nh;
  *w = nw;
}

// ---------------------------------------------------------------- executor

// Per-sample error codes (OR-able at the batch level).
enum SampleErr {
  ERR_OK = 0,
  ERR_READ = 1,    // file missing/unreadable
  ERR_DECODE = 2,  // unsupported or corrupt image
  ERR_CROP = 4,    // crop window invalid (should not happen with fractions)
};

struct Slot {
  enum State { FREE, FILLING, DONE, OWNED };
  State state = FREE;
  int batch_id = -1;
  int n = 0;
  std::vector<std::string> paths;
  std::vector<int> bboxes;      // [n*4]; bboxes[4i+2] < 0 => no bbox
  std::vector<float> uv;        // [n*2] crop fractions in [0,1)
  std::vector<uint8_t> flips;   // [n]
  std::atomic<int> remaining{0};
  std::vector<int> sample_err;  // [n]
  // Per-branch output: [max_batch * s * s * 3] float32, sample-major.
  std::vector<std::vector<float>> branch;
};

struct Exec {
  int n_branches;
  std::vector<int> branch_sizes;
  int scale_size, crop;
  float mean[3], stdv[3];
  int max_batch;

  std::vector<std::unique_ptr<Slot>> slots;
  std::deque<std::pair<int, int>> tasks;  // (slot index, sample index)
  std::deque<int> order;                  // FIFO of submitted slot indices
  std::mutex mu;
  std::condition_variable cv_task;  // workers wait for tasks
  std::condition_variable cv_done;  // wait() waits for oldest DONE
  std::condition_variable cv_free;  // submit() waits for a FREE slot
  std::vector<std::thread> workers;
  bool stop = false;

  void worker_loop();
  void process(Slot& s, int i);
};

void Exec::process(Slot& s, int i) {
  int err = ERR_OK;
  std::vector<uint8_t> bytes, rgb;
  int h = 0, w = 0;
  if (!read_file(s.paths[i], bytes)) {
    err = ERR_READ;
  } else if (!decode_image(bytes.data(), bytes.size(), rgb, &h, &w)) {
    err = ERR_DECODE;
  } else {
    if (s.bboxes[4 * i + 2] >= 0) crop_to_bbox(rgb, &h, &w, &s.bboxes[4 * i]);
    int nh, nw;
    t2i::scaled_dims(h, w, scale_size, &nh, &nw);
    // floor(u * n) reproduces rng.integers(0, n) for uniform u in [0,1).
    const int rx = std::max(0, nw - crop), ry = std::max(0, nh - crop);
    const int x0 = std::min(rx, static_cast<int>(s.uv[2 * i] * (rx + 1)));
    const int y0 = std::min(ry, static_cast<int>(s.uv[2 * i + 1] * (ry + 1)));
    std::vector<float*> outs(n_branches);
    for (int b = 0; b < n_branches; ++b) {
      const size_t px = static_cast<size_t>(branch_sizes[b]) *
                        branch_sizes[b] * 3;
      outs[b] = s.branch[b].data() + static_cast<size_t>(i) * px;
    }
    if (t2i::pyramid_from_rgb(rgb.data(), h, w, scale_size, crop, x0, y0,
                              s.flips[i], branch_sizes.data(), n_branches,
                              outs.data(), mean, stdv))
      err = ERR_CROP;
  }
  if (err != ERR_OK) {
    // zero-fill so consumers never read stale pixels from a recycled slot
    for (int b = 0; b < n_branches; ++b) {
      const size_t px = static_cast<size_t>(branch_sizes[b]) *
                        branch_sizes[b] * 3;
      std::memset(s.branch[b].data() + static_cast<size_t>(i) * px, 0,
                  px * sizeof(float));
    }
  }
  s.sample_err[i] = err;
  if (s.remaining.fetch_sub(1) == 1) {
    std::lock_guard<std::mutex> lk(mu);
    s.state = Slot::DONE;
    cv_done.notify_all();
  }
}

void Exec::worker_loop() {
  for (;;) {
    std::pair<int, int> task;
    {
      std::unique_lock<std::mutex> lk(mu);
      cv_task.wait(lk, [&] { return stop || !tasks.empty(); });
      if (stop && tasks.empty()) return;
      task = tasks.front();
      tasks.pop_front();
    }
    process(*slots[task.first], task.second);
  }
}

}  // namespace

extern "C" {

void* t2i_exec_create(int n_threads, int n_slots, int max_batch,
                      const int* branch_sizes, int n_branches, int scale_size,
                      int crop, const float* mean, const float* stdv) {
  if (n_threads < 1 || n_slots < 1 || max_batch < 1 || n_branches < 1)
    return nullptr;
  Exec* e = new Exec();
  e->n_branches = n_branches;
  e->branch_sizes.assign(branch_sizes, branch_sizes + n_branches);
  e->scale_size = scale_size;
  e->crop = crop;
  std::memcpy(e->mean, mean, 3 * sizeof(float));
  std::memcpy(e->stdv, stdv, 3 * sizeof(float));
  e->max_batch = max_batch;
  e->slots.reserve(n_slots);
  for (int i = 0; i < n_slots; ++i) {
    auto s = std::make_unique<Slot>();
    s->branch.resize(n_branches);
    for (int b = 0; b < n_branches; ++b)
      s->branch[b].resize(static_cast<size_t>(max_batch) * branch_sizes[b] *
                          branch_sizes[b] * 3);
    e->slots.push_back(std::move(s));
  }
  for (int t = 0; t < n_threads; ++t)
    e->workers.emplace_back([e] { e->worker_loop(); });
  return e;
}

// Submit one batch plan.  paths: n C strings; bboxes: [n*4] (w<0 => none);
// uv: [n*2] crop fractions; flips: [n].  Blocks while all slots are in
// flight.  Returns 0, or -1 on invalid arguments.
int t2i_exec_submit(void* handle, int batch_id, int n, const char** paths,
                    const int* bboxes, const float* uv,
                    const uint8_t* flips) {
  Exec* e = static_cast<Exec*>(handle);
  if (!e || n < 1 || n > e->max_batch) return -1;
  int si;
  {
    std::unique_lock<std::mutex> lk(e->mu);
    e->cv_free.wait(lk, [&] {
      for (auto& s : e->slots)
        if (s->state == Slot::FREE) return true;
      return false;
    });
    si = -1;
    for (size_t i = 0; i < e->slots.size(); ++i)
      if (e->slots[i]->state == Slot::FREE) {
        si = static_cast<int>(i);
        break;
      }
    Slot& s = *e->slots[si];
    s.state = Slot::FILLING;
    s.batch_id = batch_id;
    s.n = n;
    s.paths.assign(paths, paths + n);
    s.bboxes.assign(bboxes, bboxes + 4 * n);
    s.uv.assign(uv, uv + 2 * n);
    s.flips.assign(flips, flips + n);
    s.sample_err.assign(n, ERR_OK);
    s.remaining.store(n);
    e->order.push_back(si);
    for (int i = 0; i < n; ++i) e->tasks.emplace_back(si, i);
  }
  e->cv_task.notify_all();
  return 0;
}

// Number of batches submitted but not yet released.
int t2i_exec_inflight(void* handle) {
  Exec* e = static_cast<Exec*>(handle);
  std::lock_guard<std::mutex> lk(e->mu);
  int n = static_cast<int>(e->order.size());
  for (auto& s : e->slots)
    if (s->state == Slot::OWNED) ++n;
  return n;
}

// Block for the oldest in-flight batch.  Fills batch_id, n, per-branch
// buffer pointers (n_branches of them) and per-sample error codes
// (sample_err may be NULL).  The buffers stay valid until
// t2i_exec_release(batch_id).  Returns 0, or -1 if nothing is in flight.
int t2i_exec_wait(void* handle, int* batch_id, int* n, float** branch_ptrs,
                  int* sample_err) {
  Exec* e = static_cast<Exec*>(handle);
  int si;
  {
    std::unique_lock<std::mutex> lk(e->mu);
    if (e->order.empty()) return -1;
    si = e->order.front();
    e->cv_done.wait(lk, [&] { return e->slots[si]->state == Slot::DONE; });
    e->order.pop_front();
    e->slots[si]->state = Slot::OWNED;
  }
  Slot& s = *e->slots[si];
  *batch_id = s.batch_id;
  *n = s.n;
  for (int b = 0; b < e->n_branches; ++b) branch_ptrs[b] = s.branch[b].data();
  if (sample_err)
    std::memcpy(sample_err, s.sample_err.data(), s.n * sizeof(int));
  return 0;
}

// Recycle the slot owned via t2i_exec_wait.  Returns 0, -1 if unknown id.
int t2i_exec_release(void* handle, int batch_id) {
  Exec* e = static_cast<Exec*>(handle);
  {
    std::lock_guard<std::mutex> lk(e->mu);
    for (auto& s : e->slots)
      if (s->state == Slot::OWNED && s->batch_id == batch_id) {
        s->state = Slot::FREE;
        s->batch_id = -1;
        e->cv_free.notify_one();
        return 0;
      }
  }
  return -1;
}

void t2i_exec_destroy(void* handle) {
  Exec* e = static_cast<Exec*>(handle);
  if (!e) return;
  {
    std::lock_guard<std::mutex> lk(e->mu);
    e->stop = true;
  }
  e->cv_task.notify_all();
  for (auto& t : e->workers) t.join();
  delete e;
}

// ------------------------------------------------- sync decode (for tests)

// Decode an image file to interleaved RGB uint8.  On success returns a
// malloc'd buffer (caller frees via t2i_decode_free) and fills h/w.
uint8_t* t2i_decode_file(const char* path, int* h, int* w) {
  std::vector<uint8_t> bytes, rgb;
  if (!read_file(path, bytes)) return nullptr;
  if (!decode_image(bytes.data(), bytes.size(), rgb, h, w)) return nullptr;
  uint8_t* out = static_cast<uint8_t*>(std::malloc(rgb.size()));
  if (!out) return nullptr;
  std::memcpy(out, rgb.data(), rgb.size());
  return out;
}

void t2i_decode_free(uint8_t* p) { std::free(p); }

}  // extern "C"
