// Threaded PNG decode + batch assembly for the training data pipeline.
//
// Role: the native data-loader of the framework (the reference feeds its GPU
// loop from torch DataLoader worker *processes*; here a C++ thread pool
// decodes layer PNGs and assembles float batches while the TPU computes,
// with no Python/PIL in the hot path).  Sampling order stays in Python
// (data/sampler.py InfiniteSampler) for determinism: Python submits batches
// of item indices, workers fill pinned host buffers, collect() returns them
// in FIFO order.
//
// ABI (ctypes, see data/native_loader.py):
//   mgt_loader_create(paths, num_items, images_per_item, H, W, C,
//                     num_threads)          -> handle
//   mgt_loader_submit(handle, indices, flips, batch)   -> 0 | -1
//   mgt_loader_collect(handle, out_float)              -> 0 | -1
//   mgt_loader_last_error(handle)                      -> const char*
//   mgt_loader_destroy(handle)
//
// Each item is images_per_item PNG files (the 9 RGBA layers of one sample;
// 1 for flat datasets).  Output layout: [batch, images_per_item, H, W, C]
// float32 in [0, 1], horizontally flipped where flips[b] != 0 (the
// dataset xflip convention).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Batch {
  std::vector<float> buf;
  std::atomic<int> remaining{0};
  std::mutex err_mu;
  std::string err;  // first failure wins
};

struct Task {
  long item;
  unsigned char flip;
  float* dst;  // [images_per_item, H, W, C]
  Batch* batch;
};

struct Loader {
  std::vector<std::string> paths;  // num_items * images_per_item
  long num_items = 0;
  int ipi = 1, H = 0, W = 0, C = 4;

  std::vector<std::thread> workers;
  std::deque<Task> tasks;
  std::deque<std::unique_ptr<Batch>> pending;  // submission order
  std::mutex mu;
  std::condition_variable cv_task;
  std::condition_variable cv_done;
  bool stop = false;
  std::string last_error;

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_task.notify_all();
    for (auto& t : workers) t.join();
  }
};

bool decode_png(const char* path, int H, int W, int C, bool flip, float* dst,
                std::string* err) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) {
    *err = std::string(path) + ": " + image.message;
    return false;
  }
  image.format = (C == 4)   ? PNG_FORMAT_RGBA
                 : (C == 3) ? PNG_FORMAT_RGB
                            : PNG_FORMAT_GRAY;
  if ((int)image.width != W || (int)image.height != H) {
    png_image_free(&image);
    *err = std::string(path) + ": size mismatch";
    return false;
  }
  std::vector<unsigned char> tmp((size_t)H * W * C);
  if (!png_image_finish_read(&image, nullptr, tmp.data(), 0, nullptr)) {
    *err = std::string(path) + ": " + image.message;
    return false;
  }
  // true division (not reciprocal multiply): bit-identical to numpy's
  // float32 `uint8 / 255.0`, so the native and Python paths are
  // interchangeable mid-run
  for (int y = 0; y < H; ++y) {
    const unsigned char* row = &tmp[(size_t)y * W * C];
    float* out_row = &dst[(size_t)y * W * C];
    if (!flip) {
      for (int i = 0; i < W * C; ++i) out_row[i] = row[i] / 255.0f;
    } else {
      for (int x = 0; x < W; ++x) {
        const unsigned char* p = &row[(size_t)(W - 1 - x) * C];
        float* q = &out_row[(size_t)x * C];
        for (int c = 0; c < C; ++c) q[c] = p[c] / 255.0f;
      }
    }
  }
  return true;
}

void worker_loop(Loader* L) {
  for (;;) {
    Task task;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_task.wait(lk, [&] { return L->stop || !L->tasks.empty(); });
      if (L->stop && L->tasks.empty()) return;
      task = L->tasks.front();
      L->tasks.pop_front();
    }
    const size_t img_elems = (size_t)L->H * L->W * L->C;
    std::string err;
    for (int j = 0; j < L->ipi; ++j) {
      const std::string& path = L->paths[(size_t)task.item * L->ipi + j];
      if (!decode_png(path.c_str(), L->H, L->W, L->C, task.flip != 0,
                      task.dst + (size_t)j * img_elems, &err)) {
        std::lock_guard<std::mutex> lk(task.batch->err_mu);
        if (task.batch->err.empty()) task.batch->err = err;
        break;
      }
    }
    if (task.batch->remaining.fetch_sub(1) == 1) L->cv_done.notify_all();
  }
}

}  // namespace

extern "C" {

void* mgt_loader_create(const char** paths, long num_paths,
                        int images_per_item, int height, int width,
                        int channels, int num_threads) {
  if (num_paths <= 0 || images_per_item <= 0 ||
      num_paths % images_per_item != 0)
    return nullptr;
  auto* L = new Loader();
  L->paths.reserve(num_paths);
  for (long i = 0; i < num_paths; ++i) L->paths.emplace_back(paths[i]);
  L->num_items = num_paths / images_per_item;
  L->ipi = images_per_item;
  L->H = height;
  L->W = width;
  L->C = channels;
  int n = num_threads > 0 ? num_threads : 4;
  for (int i = 0; i < n; ++i) L->workers.emplace_back(worker_loop, L);
  return L;
}

int mgt_loader_submit(void* handle, const long* indices,
                      const unsigned char* flips, int batch) {
  auto* L = static_cast<Loader*>(handle);
  if (batch <= 0) return -1;
  for (int b = 0; b < batch; ++b)
    if (indices[b] < 0 || indices[b] >= L->num_items) {
      std::lock_guard<std::mutex> lk(L->mu);
      L->last_error = "index out of range";
      return -1;
    }
  auto bt = std::make_unique<Batch>();
  const size_t item_elems = (size_t)L->ipi * L->H * L->W * L->C;
  bt->buf.resize((size_t)batch * item_elems);
  bt->remaining.store(batch);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    for (int b = 0; b < batch; ++b)
      L->tasks.push_back(Task{indices[b], flips ? flips[b] : (unsigned char)0,
                              bt->buf.data() + (size_t)b * item_elems,
                              bt.get()});
    L->pending.push_back(std::move(bt));
  }
  L->cv_task.notify_all();
  return 0;
}

int mgt_loader_collect(void* handle, float* out) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_ptr<Batch> bt;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    if (L->pending.empty()) {
      L->last_error = "collect without submit";
      return -1;
    }
    Batch* front = L->pending.front().get();
    L->cv_done.wait(lk, [&] { return front->remaining.load() == 0; });
    bt = std::move(L->pending.front());
    L->pending.pop_front();
  }
  if (!bt->err.empty()) {
    std::lock_guard<std::mutex> lk(L->mu);
    L->last_error = bt->err;
    return -1;
  }
  std::memcpy(out, bt->buf.data(), bt->buf.size() * sizeof(float));
  return 0;
}

const char* mgt_loader_last_error(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  std::lock_guard<std::mutex> lk(L->mu);
  static thread_local std::string copy;
  copy = L->last_error;
  return copy.c_str();
}

void mgt_loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
