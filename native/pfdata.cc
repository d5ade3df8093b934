// pfdata: native data-loading runtime for PocketFlow-TPU.
//
// The reference delegates all host-side data work to TensorFlow's C++
// tf.data runtime (parallel_interleave / shuffle_and_repeat / batch /
// prefetch, /root/reference/datasets/abstract_dataset.py:55-94).  This
// library is the equivalent native layer for the rebuild: record parsing and
// a threaded shuffling batch sampler with a bounded prefetch queue, exposed
// through a C ABI consumed via ctypes (no pybind11 in the image).
//
// Two sources are supported:
//   * flat in-RAM buffers (small datasets: CIFAR-10, FMNIST, synthetic);
//   * a SHARD TABLE of on-disk .npy files read via pread() (ImageNet scale:
//     the reference streams TFRecord shards through parallel_interleave,
//     ilsvrc12_dataset.py:39-127; we stream rows out of per-shard files
//     with bounded resident memory — pread page cache is reclaimable and
//     does not count against process RSS, unlike mmap).
//
// DETERMINISM CONTRACT: the consumer-visible batch stream depends only on
// (seed, batch, shuffle, n) — never on nb_threads or scheduling.  Index
// draws are serialized under a lock in sequence order and completed batches
// are delivered strictly in draw order; worker threads only parallelize the
// row gather/copy work between draw and delivery.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o libpfdata.so pfdata.cc -lpthread

#include <fcntl.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Row sources.
// ---------------------------------------------------------------------------

struct RowSource {
  virtual ~RowSource() = default;
  // Copy row `row` (a global row id in [0, n_rows)) into dst[sample_bytes].
  // Returns false on IO failure.
  virtual bool fill(int64_t row, uint8_t* dst) = 0;
  virtual int64_t n_rows() const = 0;
};

struct FlatSource : RowSource {
  const uint8_t* base = nullptr;
  int64_t n = 0;
  int64_t sample_bytes = 0;
  bool fill(int64_t row, uint8_t* dst) override {
    std::memcpy(dst, base + row * sample_bytes, sample_bytes);
    return true;
  }
  int64_t n_rows() const override { return n; }
};

// Shard table over on-disk files.  Each shard i holds counts[i] rows of
// sample_bytes starting at byte data_offsets[i] (past the .npy header).
struct FileShardSource : RowSource {
  std::vector<int> fds;
  std::vector<int64_t> data_offsets;
  std::vector<int64_t> row_starts;  // prefix sums, size nb_shards+1
  int64_t sample_bytes = 0;

  ~FileShardSource() override {
    for (int fd : fds)
      if (fd >= 0) ::close(fd);
  }

  bool fill(int64_t row, uint8_t* dst) override {
    // binary search for the owning shard
    auto it = std::upper_bound(row_starts.begin(), row_starts.end(), row);
    const int64_t shard = (it - row_starts.begin()) - 1;
    const int64_t local = row - row_starts[shard];
    const int64_t off = data_offsets[shard] + local * sample_bytes;
    int64_t done = 0;
    while (done < sample_bytes) {
      const ssize_t got = ::pread(fds[shard], dst + done,
                                  sample_bytes - done, off + done);
      if (got <= 0) return false;
      done += got;
    }
    return true;
  }
  int64_t n_rows() const override { return row_starts.back(); }
};

// ---------------------------------------------------------------------------
// Threaded shuffling batch sampler: deterministic sequence-ordered delivery.
// ---------------------------------------------------------------------------

struct Batch {
  std::vector<uint8_t> images;
  std::vector<float> labels;
  bool ok = true;
};

struct Sampler {
  std::unique_ptr<RowSource> source;
  const float* labels = nullptr;       // in-RAM [n_index, label_floats]
  std::vector<float> labels_owned;     // optional owned copy
  std::vector<int64_t> index;          // selection: slot -> global row; size n
  int64_t n = 0;                       // number of selected samples
  int64_t sample_bytes = 0;
  int64_t label_floats = 0;
  int64_t batch = 0;
  bool shuffle = true;
  std::mt19937_64 rng;

  // Draw state (guarded by mu): the shuffled order over [0, n) and the
  // monotone sequence counter.  Draw order defines delivery order.
  std::vector<int64_t> order;
  int64_t pos = 0;
  int64_t seq_draw = 0;     // next sequence number to draw
  int64_t seq_deliver = 0;  // next sequence number the consumer receives
  std::map<int64_t, Batch> ready;
  size_t depth = 4;

  std::mutex mu;
  std::condition_variable cv_draw;     // workers wait for in-flight room
  std::condition_variable cv_deliver;  // consumer waits for ready[seq_deliver]
  std::condition_variable cv_idle;     // destructor waits for consumers to leave
  int64_t active_consumers = 0;        // consumers inside next() (guarded by mu)
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  void run_worker() {
    std::vector<int64_t> idx(batch);
    while (true) {
      int64_t my_seq;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv_draw.wait(lock, [&] {
          return stop.load() ||
                 seq_draw - seq_deliver < static_cast<int64_t>(depth);
        });
        if (stop.load()) return;
        my_seq = seq_draw++;
        for (int64_t i = 0; i < batch; ++i) {
          if (pos >= n) {
            pos = 0;
            if (shuffle) std::shuffle(order.begin(), order.end(), rng);
          }
          idx[i] = order[pos++];
        }
      }
      Batch b;
      b.images.resize(batch * sample_bytes);
      b.labels.resize(batch * label_floats);
      for (int64_t i = 0; i < batch; ++i) {
        const int64_t row = index.empty() ? idx[i] : index[idx[i]];
        if (!source->fill(row, b.images.data() + i * sample_bytes))
          b.ok = false;
        const int64_t lrow = idx[i];  // labels are indexed by SLOT (pre-gathered)
        std::memcpy(b.labels.data() + i * label_floats,
                    labels + lrow * label_floats,
                    label_floats * sizeof(float));
      }
      {
        std::lock_guard<std::mutex> lock(mu);
        ready.emplace(my_seq, std::move(b));
      }
      cv_deliver.notify_all();
    }
  }

  void start(int nb_threads, int queue_depth) {
    depth = std::max(1, queue_depth);
    order.resize(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    if (shuffle) std::shuffle(order.begin(), order.end(), rng);
    const int nt = std::max(1, nb_threads);
    for (int t = 0; t < nt; ++t)
      workers.emplace_back([this] { run_worker(); });
  }

  // Returns 1 on success, 0 on IO failure inside the batch or on shutdown
  // (a consumer blocked in next() while the sampler is destroyed from
  // another thread unblocks with an error instead of hanging forever).
  int next(uint8_t* images_out, float* labels_out) {
    Batch b;
    bool got = false;
    {
      std::unique_lock<std::mutex> lock(mu);
      ++active_consumers;
      const int64_t want = seq_deliver;
      cv_deliver.wait(lock,
                      [&] { return stop.load() || ready.count(want) != 0; });
      auto it = ready.find(want);
      if (it != ready.end()) {
        b = std::move(it->second);
        ready.erase(it);
        ++seq_deliver;
        got = true;
      }
      // handshake with ~Sampler: it may not free the object until every
      // consumer has left this critical section (a bare join of workers
      // would let `delete` complete while a woken consumer still touches
      // mu/ready between wake-up and return)
      if (--active_consumers == 0) cv_idle.notify_all();
      if (!got) return 0;  // stopped with nothing ready
    }
    cv_draw.notify_all();
    std::memcpy(images_out, b.images.data(), b.images.size());
    std::memcpy(labels_out, b.labels.data(), b.labels.size() * sizeof(float));
    return b.ok ? 1 : 0;
  }

  ~Sampler() {
    {
      std::unique_lock<std::mutex> lock(mu);
      stop.store(true);
      cv_draw.notify_all();
      cv_deliver.notify_all();
      cv_idle.wait(lock, [&] { return active_consumers == 0; });
    }
    for (auto& w : workers) w.join();
  }
};

}  // namespace

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
// Samplers.
// ---------------------------------------------------------------------------

void* pfdata_sampler_create(const uint8_t* images, const float* labels,
                            int64_t n, int64_t sample_bytes,
                            int64_t label_floats, int64_t batch,
                            int32_t shuffle, int64_t seed,
                            int32_t nb_threads, int32_t queue_depth) {
  auto* s = new Sampler();
  auto src = std::make_unique<FlatSource>();
  src->base = images;
  src->n = n;
  src->sample_bytes = sample_bytes;
  s->source = std::move(src);
  s->labels = labels;
  s->n = n;
  s->sample_bytes = sample_bytes;
  s->label_floats = label_floats;
  s->batch = batch;
  s->shuffle = shuffle != 0;
  s->rng.seed(seed);
  s->start(nb_threads, queue_depth);
  return s;
}

// Sharded on-disk sampler.  `paths` are NUL-terminated file paths;
// `data_offsets[i]` is the byte offset of row 0 in shard i (past the .npy
// header); `counts[i]` rows per shard.  `index` selects/reorders global rows
// (process sharding, train/val splits) and may be null for identity;
// `labels` has n_index rows PRE-GATHERED to match the selection.
void* pfdata_file_sampler_create(const char** paths,
                                 const int64_t* data_offsets,
                                 const int64_t* counts, int64_t nb_shards,
                                 const float* labels, const int64_t* index,
                                 int64_t n_index, int64_t sample_bytes,
                                 int64_t label_floats, int64_t batch,
                                 int32_t shuffle, int64_t seed,
                                 int32_t nb_threads, int32_t queue_depth) {
  auto src = std::make_unique<FileShardSource>();
  src->sample_bytes = sample_bytes;
  src->row_starts.push_back(0);
  for (int64_t i = 0; i < nb_shards; ++i) {
    const int fd = ::open(paths[i], O_RDONLY);
    if (fd < 0) return nullptr;
    src->fds.push_back(fd);
    src->data_offsets.push_back(data_offsets[i]);
    src->row_starts.push_back(src->row_starts.back() + counts[i]);
  }
  auto* s = new Sampler();
  s->source = std::move(src);
  // own a copy of the (small) gathered label table
  s->labels_owned.assign(labels, labels + n_index * label_floats);
  s->labels = s->labels_owned.data();
  if (index != nullptr) s->index.assign(index, index + n_index);
  s->n = n_index;
  s->sample_bytes = sample_bytes;
  s->label_floats = label_floats;
  s->batch = batch;
  s->shuffle = shuffle != 0;
  s->rng.seed(seed);
  s->start(nb_threads, queue_depth);
  return s;
}

int32_t pfdata_sampler_next(void* handle, uint8_t* images_out,
                            float* labels_out) {
  return static_cast<Sampler*>(handle)->next(images_out, labels_out);
}

void pfdata_sampler_destroy(void* handle) {
  delete static_cast<Sampler*>(handle);
}

}  // extern "C"
