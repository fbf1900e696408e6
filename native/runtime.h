// Native host runtime: bounded blocking queues + a worker pool.
//
// Replaces the reference's inter-thread plumbing — std::list queues guarded
// by std::mutex with usleep polling (reference:
// src/sg-slam/src/LocalMapping.cc:114-126, src/Detector2D.cc:122-149,
// src/PointcloudMapping.cc:53-66) — with condition-variable queues exposed
// to Python over ctypes (calls release the GIL, so Python pipeline stages
// block in native code instead of spin-polling).
#pragma once

#include <cstdint>
#include <cstddef>

extern "C" {

// ---- bounded byte queue (MPMC, blocking) ----
void* bq_create(int capacity);
// Blocking push of a message (copies). Returns 0 on success, -1 if closed.
int bq_push(void* q, const void* data, int64_t n);
// Non-blocking push; returns -2 when full.
int bq_try_push(void* q, const void* data, int64_t n);
// Blocking pop into out (cap bytes). Returns message size, or -1 if the
// queue is closed AND drained, or -3 if the message exceeds cap (message is
// left in the queue; query with bq_peek_size).
int64_t bq_pop(void* q, void* out, int64_t cap);
// Size in bytes of the next message, -1 if empty.
int64_t bq_peek_size(void* q);
int bq_len(void* q);
void bq_close(void* q);
void bq_destroy(void* q);

}  // extern "C"
