// pfdata: native data-loading runtime for PocketFlow-TPU.
//
// The reference delegates all host-side data work to TensorFlow's C++
// tf.data runtime (parallel_interleave / shuffle_and_repeat / batch /
// prefetch, /root/reference/datasets/abstract_dataset.py:55-94).  This
// library is the equivalent native layer for the rebuild: record parsing and
// a threaded shuffling batch sampler with a bounded prefetch queue, exposed
// through a C ABI consumed via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpfdata.so pfdata.cc -lpthread

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CIFAR-10 .bin record parsing: [label, 3072 bytes CHW planar] per record ->
// labels int32 + images uint8 NHWC.  (cifar10_dataset.py's parse_fn, but
// vectorized native instead of per-record TF ops.)
// ---------------------------------------------------------------------------

void pfdata_parse_cifar10(const uint8_t* raw, int64_t nb_records,
                          uint8_t* images_out, int32_t* labels_out) {
  constexpr int kH = 32, kW = 32, kC = 3;
  constexpr int kRecord = 1 + kH * kW * kC;
  const int nb_threads = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> workers;
  const int64_t chunk = (nb_records + nb_threads - 1) / nb_threads;
  for (int t = 0; t < nb_threads; ++t) {
    workers.emplace_back([=]() {
      const int64_t beg = t * chunk;
      const int64_t end = std::min(nb_records, beg + chunk);
      for (int64_t r = beg; r < end; ++r) {
        const uint8_t* rec = raw + r * kRecord;
        labels_out[r] = rec[0];
        const uint8_t* chw = rec + 1;
        uint8_t* hwc = images_out + r * kH * kW * kC;
        for (int c = 0; c < kC; ++c)
          for (int y = 0; y < kH; ++y)
            for (int x = 0; x < kW; ++x)
              hwc[(y * kW + x) * kC + c] = chw[c * kH * kW + y * kW + x];
      }
    });
  }
  for (auto& w : workers) w.join();
}

// ---------------------------------------------------------------------------
// Threaded shuffling batch sampler with a bounded prefetch queue.
// ---------------------------------------------------------------------------

struct Batch {
  std::vector<uint8_t> images;
  std::vector<float> labels;
};

struct Sampler {
  const uint8_t* images = nullptr;   // [n, sample_bytes]
  const float* labels = nullptr;     // [n, label_floats]
  int64_t n = 0;
  int64_t sample_bytes = 0;
  int64_t label_floats = 0;
  int64_t batch = 0;
  bool shuffle = true;
  std::mt19937_64 rng;

  std::deque<Batch> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  size_t depth = 4;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;
  std::vector<int64_t> order;
  int64_t pos = 0;
  std::mutex order_mu;

  void next_indices(std::vector<int64_t>& idx) {
    std::lock_guard<std::mutex> lock(order_mu);
    idx.resize(batch);
    for (int64_t i = 0; i < batch; ++i) {
      if (pos >= n) {
        pos = 0;
        if (shuffle) std::shuffle(order.begin(), order.end(), rng);
      }
      idx[i] = order[pos++];
    }
  }

  void worker() {
    std::vector<int64_t> idx;
    while (!stop.load()) {
      next_indices(idx);
      Batch b;
      b.images.resize(batch * sample_bytes);
      b.labels.resize(batch * label_floats);
      for (int64_t i = 0; i < batch; ++i) {
        std::memcpy(b.images.data() + i * sample_bytes,
                    images + idx[i] * sample_bytes, sample_bytes);
        std::memcpy(b.labels.data() + i * label_floats,
                    labels + idx[i] * label_floats,
                    label_floats * sizeof(float));
      }
      std::unique_lock<std::mutex> lock(mu);
      cv_push.wait(lock, [&] { return queue.size() < depth || stop.load(); });
      if (stop.load()) return;
      queue.push_back(std::move(b));
      cv_pop.notify_one();
    }
  }
};

void* pfdata_sampler_create(const uint8_t* images, const float* labels,
                            int64_t n, int64_t sample_bytes,
                            int64_t label_floats, int64_t batch,
                            int32_t shuffle, int64_t seed,
                            int32_t nb_threads, int32_t queue_depth) {
  auto* s = new Sampler();
  s->images = images;
  s->labels = labels;
  s->n = n;
  s->sample_bytes = sample_bytes;
  s->label_floats = label_floats;
  s->batch = batch;
  s->shuffle = shuffle != 0;
  s->rng.seed(seed);
  s->depth = std::max(1, queue_depth);
  s->order.resize(n);
  for (int64_t i = 0; i < n; ++i) s->order[i] = i;
  if (s->shuffle) std::shuffle(s->order.begin(), s->order.end(), s->rng);
  const int nt = std::max(1, nb_threads);
  for (int t = 0; t < nt; ++t)
    s->workers.emplace_back([s] { s->worker(); });
  return s;
}

void pfdata_sampler_next(void* handle, uint8_t* images_out, float* labels_out) {
  auto* s = static_cast<Sampler*>(handle);
  Batch b;
  {
    std::unique_lock<std::mutex> lock(s->mu);
    s->cv_pop.wait(lock, [&] { return !s->queue.empty(); });
    b = std::move(s->queue.front());
    s->queue.pop_front();
    s->cv_push.notify_one();
  }
  std::memcpy(images_out, b.images.data(), b.images.size());
  std::memcpy(labels_out, b.labels.data(), b.labels.size() * sizeof(float));
}

void pfdata_sampler_destroy(void* handle) {
  auto* s = static_cast<Sampler*>(handle);
  s->stop.store(true);
  s->cv_push.notify_all();
  s->cv_pop.notify_all();
  for (auto& w : s->workers) w.join();
  delete s;
}

}  // extern "C"
