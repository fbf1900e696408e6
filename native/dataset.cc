// Threaded RGB-D dataset prefetcher.
//
// Native replacement for the reference's synchronous per-frame cv::imread
// in the example main loop (reference: src/sg-slam/Examples/rgbd_tum.cc:
// 111-125) — the decode+convert work (PNG inflate, grayscale, depth
// scaling) runs in a worker pool several frames ahead of the consumer, so
// the SLAM step never waits on disk or zlib. Frames are delivered strictly
// in order through a bounded window (backpressure instead of unbounded
// queueing).

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "png_codec.h"

namespace {

struct Frame {
  std::vector<float> gray;    // [h*w] 0..1
  std::vector<float> depth;   // [h*w] meters
  std::vector<uint8_t> rgb;   // [h*w*3]
  int ok = 0;
};

struct Loader {
  std::vector<std::string> rgb_paths, depth_paths;
  float depth_factor = 5000.0f;
  int width = 0, height = 0;
  int window = 8;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::map<int, Frame> ready;
  std::atomic<int> next_job{0};
  int next_out = 0;
  bool stop = false;

  ~Loader() { shutdown(); }

  void shutdown() {
    {
      std::unique_lock<std::mutex> lk(mu);
      stop = true;
    }
    cv_ready.notify_all();
    cv_space.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
  }

  bool decode_one(int idx, Frame* f) {
    int w, h, c, bd;
    // color: RGB8 (or gray8)
    std::vector<uint8_t> buf(size_t(width) * height * 4 * 2);
    if (png_decode(rgb_paths[idx].c_str(), buf.data(), buf.size(), &w, &h,
                   &c, &bd) != 0 ||
        w != width || h != height || bd != 8)
      return false;
    const size_t n = size_t(w) * h;
    f->gray.resize(n);
    f->rgb.resize(n * 3);
    if (c >= 3) {
      for (size_t i = 0; i < n; ++i) {
        uint8_t r = buf[i * c], g = buf[i * c + 1], b = buf[i * c + 2];
        f->rgb[i * 3] = r;
        f->rgb[i * 3 + 1] = g;
        f->rgb[i * 3 + 2] = b;
        // ITU-R BT.601 luma, matching the Python loader (io/tum.py)
        f->gray[i] = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f;
      }
    } else {
      for (size_t i = 0; i < n; ++i) {
        f->rgb[i * 3] = f->rgb[i * 3 + 1] = f->rgb[i * 3 + 2] = buf[i];
        f->gray[i] = buf[i] / 255.0f;
      }
    }
    // depth: GRAY16
    if (png_decode(depth_paths[idx].c_str(), buf.data(), buf.size(), &w, &h,
                   &c, &bd) != 0 ||
        w != width || h != height || c != 1 || bd != 16)
      return false;
    const uint16_t* d16 = reinterpret_cast<const uint16_t*>(buf.data());
    f->depth.resize(n);
    const float inv = 1.0f / depth_factor;
    for (size_t i = 0; i < n; ++i) f->depth[i] = d16[i] * inv;
    f->ok = 1;
    return true;
  }

  void worker() {
    for (;;) {
      int idx = next_job.fetch_add(1);
      if (idx >= int(rgb_paths.size())) return;
      // bounded window: don't run more than `window` frames ahead
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] { return stop || idx < next_out + window; });
        if (stop) return;
      }
      Frame f;
      bool ok = decode_one(idx, &f);
      f.ok = ok ? 1 : 0;
      {
        std::unique_lock<std::mutex> lk(mu);
        ready.emplace(idx, std::move(f));
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// paths: 2*n C strings, rgb[i]=paths[2i], depth[i]=paths[2i+1].
// Returns nullptr if the first frame can't be decoded.
void* tum_open(const char** paths, int n, float depth_factor, int n_threads,
               int window) {
  auto* L = new Loader();
  L->depth_factor = depth_factor;
  L->window = window > 0 ? window : 8;
  L->rgb_paths.reserve(n);
  L->depth_paths.reserve(n);
  for (int i = 0; i < n; ++i) {
    L->rgb_paths.emplace_back(paths[2 * i]);
    L->depth_paths.emplace_back(paths[2 * i + 1]);
  }
  int w, h, c, bd;
  if (n == 0 ||
      png_info(L->rgb_paths[0].c_str(), &w, &h, &c, &bd) != 0) {
    delete L;
    return nullptr;
  }
  L->width = w;
  L->height = h;
  if (n_threads < 1) n_threads = 1;
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

int tum_width(void* h) { return static_cast<Loader*>(h)->width; }
int tum_height(void* h) { return static_cast<Loader*>(h)->height; }

// Blocking: fills gray [h*w] f32, depth [h*w] f32, rgb [h*w*3] u8 (any may
// be null). Returns the frame index, -1 at end of sequence, -2 on a decode
// error for this frame.
int tum_next(void* hp, float* gray, float* depth, uint8_t* rgb) {
  auto* L = static_cast<Loader*>(hp);
  if (L->next_out >= int(L->rgb_paths.size())) return -1;
  Frame f;
  int idx;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    idx = L->next_out;
    L->cv_ready.wait(lk, [&] {
      return L->stop || L->ready.count(idx) > 0;
    });
    if (L->stop) return -1;
    f = std::move(L->ready[idx]);
    L->ready.erase(idx);
    L->next_out = idx + 1;
  }
  L->cv_space.notify_all();
  if (!f.ok) return -2;
  const size_t n = size_t(L->width) * L->height;
  if (gray) std::memcpy(gray, f.gray.data(), n * sizeof(float));
  if (depth) std::memcpy(depth, f.depth.data(), n * sizeof(float));
  if (rgb) std::memcpy(rgb, f.rgb.data(), n * 3);
  return idx;
}

void tum_close(void* hp) { delete static_cast<Loader*>(hp); }

}  // extern "C"
