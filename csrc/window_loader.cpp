// Native windowed-trajectory loader for the TPU training pipeline.
//
// The reference's input pipeline is Python/h5py slicing inside the hot batch
// loop (/root/reference/dataloader.py:102-131, train.py:219-247). Here the
// host-side runtime is native: simulations are converted once into a flat
// binary cache (by data/native_loader.py), which this library mmaps and
// serves as training batches — multithreaded batch assembly plus a
// background double-buffered prefetch thread, so batch i+1 is built while
// the device runs step i.
//
// Cache layout (little-endian):
//   int64 magic = 0x43474E4E53494D31 ("CGNNSIM1")
//   int64 num_snapshots (T), int64 num_particles (N)
//   float64 box_size, float64 dt
//   float32 coordinates [T, N, 3]
//   float32 internal_energy [T, N, 1]
//
// A window sample (window W, start s) is served as:
//   positions      [W, N, 3]  (frames s .. s+W-1)   — one memcpy
//   temperatures   [W, N, 1]
//   target_pos     [N, 3]     (frame s+W)
//   target_temp    [N, 1]
//
// Exposed with a plain C ABI for ctypes.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int64_t kMagic = 0x43474E4E53494D31LL;

struct SimFile {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  int64_t T = 0;
  int64_t N = 0;
  double box_size = 0;
  double dt = 0;
  const float* coords = nullptr;  // [T, N, 3]
  const float* energy = nullptr;  // [T, N, 1]
};

struct Loader {
  std::vector<SimFile> sims;
  int window = 0;
  int64_t seq_per_sim = 0;
  int num_threads = 4;
};

struct Batch {
  std::vector<float> pos, temp, tpos, ttemp;
};

struct Prefetcher {
  Loader* loader = nullptr;
  std::vector<int64_t> order;
  int batch_size = 0;
  size_t cursor = 0;
  int depth = 2;
  std::queue<Batch> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<bool> stop{false};
  std::thread worker;
};

bool map_file(const char* path, SimFile* out) {
  // All validation happens on locals; *out is populated only on full
  // success, so every early return leaves it default-constructed and the
  // caller's wl_close cleanup is trivially safe (no double-release class).
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  void* base = MAP_FAILED;
  if (fstat(fd, &st) == 0 && st.st_size >= 40) {
    base = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  }
  if (base == MAP_FAILED) {
    ::close(fd);
    return false;
  }
  const uint8_t* p = static_cast<const uint8_t*>(base);
  int64_t magic, T, N;
  double box_size, dt;
  std::memcpy(&magic, p, 8);
  std::memcpy(&T, p + 8, 8);
  std::memcpy(&N, p + 16, 8);
  std::memcpy(&box_size, p + 24, 8);
  std::memcpy(&dt, p + 32, 8);
  // Bounds before multiplying: T*N*16 must not overflow and must fit the
  // file (a corrupt header with huge T/N would otherwise wrap the product,
  // pass validation, and SIGBUS on first access).
  constexpr size_t kHeader = 40;
  const size_t payload = size_t(st.st_size) - kHeader;
  bool valid = magic == kMagic && T > 0 && N > 0 &&
               uint64_t(T) <= payload / 16 / uint64_t(N > 0 ? N : 1) &&
               size_t(T) * size_t(N) * 16 <= payload;
  if (!valid) {
    ::munmap(base, st.st_size);
    ::close(fd);
    return false;
  }
  size_t coords_bytes = size_t(T) * size_t(N) * 3 * sizeof(float);
  out->fd = fd;
  out->base = p;
  out->size = st.st_size;
  out->T = T;
  out->N = N;
  out->box_size = box_size;
  out->dt = dt;
  out->coords = reinterpret_cast<const float*>(p + kHeader);
  out->energy = reinterpret_cast<const float*>(p + kHeader + coords_bytes);
  return true;
}

// Copy one sample into per-sample offsets of the batch buffers.
void copy_sample(const Loader& L, int64_t global_seq, int64_t slot, float* pos,
                 float* temp, float* tpos, float* ttemp) {
  const int64_t sim_idx = global_seq / L.seq_per_sim;
  const int64_t s = global_seq % L.seq_per_sim;
  const SimFile& f = L.sims[sim_idx];
  const int64_t N = f.N;
  const int W = L.window;
  std::memcpy(pos + slot * W * N * 3, f.coords + s * N * 3,
              size_t(W) * N * 3 * sizeof(float));
  std::memcpy(temp + slot * W * N, f.energy + s * N,
              size_t(W) * N * sizeof(float));
  std::memcpy(tpos + slot * N * 3, f.coords + (s + W) * N * 3,
              size_t(N) * 3 * sizeof(float));
  std::memcpy(ttemp + slot * N, f.energy + (s + W) * N,
              size_t(N) * sizeof(float));
}

void assemble_batch(const Loader& L, const int64_t* seqs, int batch, float* pos,
                    float* temp, float* tpos, float* ttemp) {
  const int threads =
      std::min<int>(L.num_threads, batch > 0 ? batch : 1);
  if (threads <= 1 || batch < 2) {
    for (int i = 0; i < batch; ++i)
      copy_sample(L, seqs[i], i, pos, temp, tpos, ttemp);
    return;
  }
  std::vector<std::thread> pool;
  std::atomic<int> next{0};
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&] {
      int i;
      while ((i = next.fetch_add(1)) < batch)
        copy_sample(L, seqs[i], i, pos, temp, tpos, ttemp);
    });
  }
  for (auto& th : pool) th.join();
}

void prefetch_loop(Prefetcher* pf) {
  Loader& L = *pf->loader;
  const int64_t N = L.sims[0].N;
  const int W = L.window;
  const int B = pf->batch_size;
  while (!pf->stop.load()) {
    if (pf->cursor + B > pf->order.size()) break;  // drop remainder
    Batch b;
    b.pos.resize(size_t(B) * W * N * 3);
    b.temp.resize(size_t(B) * W * N);
    b.tpos.resize(size_t(B) * N * 3);
    b.ttemp.resize(size_t(B) * N);
    assemble_batch(L, pf->order.data() + pf->cursor, B, b.pos.data(),
                   b.temp.data(), b.tpos.data(), b.ttemp.data());
    pf->cursor += B;
    std::unique_lock<std::mutex> lk(pf->mu);
    pf->cv_space.wait(lk, [&] {
      return pf->stop.load() || int(pf->ready.size()) < pf->depth;
    });
    if (pf->stop.load()) return;
    pf->ready.push(std::move(b));
    pf->cv_ready.notify_one();
  }
  std::lock_guard<std::mutex> lk(pf->mu);
  pf->stop.store(true);
  pf->cv_ready.notify_all();
}

}  // namespace

extern "C" {

void wl_close(void* handle);

// Open a loader over `num_files` binary-cache paths. Returns nullptr on any
// failure (bad magic, size mismatch across files, unopenable file).
void* wl_open(const char** paths, int num_files, int window, int num_threads) {
  if (num_files <= 0 || window < 1) return nullptr;
  auto* L = new Loader();
  L->window = window;
  L->num_threads = num_threads > 0 ? num_threads : 4;
  L->sims.resize(num_files);
  for (int i = 0; i < num_files; ++i) {
    if (!map_file(paths[i], &L->sims[i]) ||
        L->sims[i].T != L->sims[0].T || L->sims[i].N != L->sims[0].N) {
      wl_close(L);  // unmap everything mapped so far
      return nullptr;
    }
  }
  if (L->sims[0].T < window + 1) {
    wl_close(L);
    return nullptr;
  }
  L->seq_per_sim = L->sims[0].T - window;
  return L;
}

int64_t wl_num_sequences(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  return int64_t(L->sims.size()) * L->seq_per_sim;
}

int64_t wl_num_particles(void* handle) {
  return static_cast<Loader*>(handle)->sims[0].N;
}

int64_t wl_num_snapshots(void* handle) {
  return static_cast<Loader*>(handle)->sims[0].T;
}

double wl_box_size(void* handle) {
  return static_cast<Loader*>(handle)->sims[0].box_size;
}

double wl_dt(void* handle) { return static_cast<Loader*>(handle)->sims[0].dt; }

// Assemble one batch synchronously (multithreaded memcpy).
void wl_get_batch(void* handle, const int64_t* seqs, int batch, float* pos,
                  float* temp, float* tpos, float* ttemp) {
  auto* L = static_cast<Loader*>(handle);
  assemble_batch(*L, seqs, batch, pos, temp, tpos, ttemp);
}

void wl_close(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  for (auto& f : L->sims) {
    if (f.base) ::munmap(const_cast<uint8_t*>(f.base), f.size);
    if (f.fd >= 0) ::close(f.fd);
  }
  delete L;
}

// --- Background prefetcher -------------------------------------------------

void* wl_prefetch_start(void* handle, const int64_t* order, int64_t num,
                        int batch, int depth) {
  auto* pf = new Prefetcher();
  pf->loader = static_cast<Loader*>(handle);
  pf->order.assign(order, order + num);
  pf->batch_size = batch;
  pf->depth = depth > 0 ? depth : 2;
  pf->worker = std::thread(prefetch_loop, pf);
  return pf;
}

// Returns 1 and fills the buffers if a batch was produced; 0 at end of epoch.
int wl_prefetch_next(void* pfh, float* pos, float* temp, float* tpos,
                     float* ttemp) {
  auto* pf = static_cast<Prefetcher*>(pfh);
  std::unique_lock<std::mutex> lk(pf->mu);
  pf->cv_ready.wait(lk, [&] { return pf->stop.load() || !pf->ready.empty(); });
  if (pf->ready.empty()) return 0;
  Batch b = std::move(pf->ready.front());
  pf->ready.pop();
  pf->cv_space.notify_one();
  lk.unlock();
  std::memcpy(pos, b.pos.data(), b.pos.size() * sizeof(float));
  std::memcpy(temp, b.temp.data(), b.temp.size() * sizeof(float));
  std::memcpy(tpos, b.tpos.data(), b.tpos.size() * sizeof(float));
  std::memcpy(ttemp, b.ttemp.data(), b.ttemp.size() * sizeof(float));
  return 1;
}

void wl_prefetch_stop(void* pfh) {
  auto* pf = static_cast<Prefetcher*>(pfh);
  {
    // Take the mutex before setting stop + notifying: otherwise the store
    // can land between the worker's predicate check and its wait entry (a
    // missed wakeup), deadlocking the join below.
    std::lock_guard<std::mutex> lk(pf->mu);
    pf->stop.store(true);
  }
  pf->cv_ready.notify_all();
  pf->cv_space.notify_all();
  if (pf->worker.joinable()) pf->worker.join();
  delete pf;
}

}  // extern "C"
