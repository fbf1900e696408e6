#include "runtime.h"

#include <condition_variable>
#include <cstring>
#include <deque>
#include <mutex>
#include <vector>

namespace {

struct ByteQueue {
  explicit ByteQueue(int cap) : capacity(cap) {}
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::deque<std::vector<uint8_t>> items;
  int capacity;
  bool closed = false;
};

}  // namespace

extern "C" {

void* bq_create(int capacity) {
  return new ByteQueue(capacity > 0 ? capacity : 1);
}

int bq_push(void* qp, const void* data, int64_t n) {
  auto* q = static_cast<ByteQueue*>(qp);
  std::unique_lock<std::mutex> lk(q->mu);
  q->cv_push.wait(lk, [&] {
    return q->closed || int(q->items.size()) < q->capacity;
  });
  if (q->closed) return -1;
  q->items.emplace_back(static_cast<const uint8_t*>(data),
                        static_cast<const uint8_t*>(data) + n);
  q->cv_pop.notify_one();
  return 0;
}

int bq_try_push(void* qp, const void* data, int64_t n) {
  auto* q = static_cast<ByteQueue*>(qp);
  std::unique_lock<std::mutex> lk(q->mu);
  if (q->closed) return -1;
  if (int(q->items.size()) >= q->capacity) return -2;
  q->items.emplace_back(static_cast<const uint8_t*>(data),
                        static_cast<const uint8_t*>(data) + n);
  q->cv_pop.notify_one();
  return 0;
}

int64_t bq_pop(void* qp, void* out, int64_t cap) {
  auto* q = static_cast<ByteQueue*>(qp);
  std::unique_lock<std::mutex> lk(q->mu);
  q->cv_pop.wait(lk, [&] { return q->closed || !q->items.empty(); });
  if (q->items.empty()) return -1;  // closed and drained
  auto& msg = q->items.front();
  if (int64_t(msg.size()) > cap) return -3;
  int64_t n = int64_t(msg.size());
  if (n) std::memcpy(out, msg.data(), size_t(n));
  q->items.pop_front();
  q->cv_push.notify_one();
  return n;
}

int64_t bq_peek_size(void* qp) {
  auto* q = static_cast<ByteQueue*>(qp);
  std::unique_lock<std::mutex> lk(q->mu);
  return q->items.empty() ? -1 : int64_t(q->items.front().size());
}

int bq_len(void* qp) {
  auto* q = static_cast<ByteQueue*>(qp);
  std::unique_lock<std::mutex> lk(q->mu);
  return int(q->items.size());
}

void bq_close(void* qp) {
  auto* q = static_cast<ByteQueue*>(qp);
  {
    std::unique_lock<std::mutex> lk(q->mu);
    q->closed = true;
  }
  q->cv_pop.notify_all();
  q->cv_push.notify_all();
}

void bq_destroy(void* qp) { delete static_cast<ByteQueue*>(qp); }

}  // extern "C"
