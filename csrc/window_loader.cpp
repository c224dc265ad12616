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
// Cache layout v2 (little-endian), generalizing to every ndim>0 field of
// the reference HDF5 schema (dataloader.py:42-51 serves all of them):
//   int64 magic = 0x43474E4E53494D32 ("CGNNSIM2")
//   int64 num_snapshots (T), int64 num_particles (N)
//   float64 box_size, float64 dt
//   int64 num_fields (F)
//   F x { int64 name_len, bytes name, int64 feat_dim }
//   F x float32 payload [T, N, feat_dim] (field order; fields 0/1 are
//       Coordinates [.,.,3] and InternalEnergy [.,.,1] by converter
//       convention — the classic 2-field ABI serves exactly those)
//
// v1 caches (magic "CGNNSIM1", fixed Coordinates+InternalEnergy payloads)
// remain readable.
//
// A window sample (window W, start s) is served per field as:
//   window  [W, N, d]  (frames s .. s+W-1) — one memcpy
//   target  [N, d]     (frame s+W)
//
// Exposed with a plain C ABI for ctypes.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int64_t kMagicV1 = 0x43474E4E53494D31LL;
constexpr int64_t kMagicV2 = 0x43474E4E53494D32LL;

struct SimFile {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  int64_t T = 0;
  int64_t N = 0;
  double box_size = 0;
  double dt = 0;
  std::vector<std::string> names;
  std::vector<int64_t> dims;
  std::vector<const float*> fields;  // each [T, N, dims[i]]
};

struct Loader {
  std::vector<SimFile> sims;
  int window = 0;
  int64_t seq_per_sim = 0;
  int num_threads = 4;
};

struct Batch {
  std::vector<std::vector<float>> wins, tgts;  // per used field
};

struct Prefetcher {
  Loader* loader = nullptr;
  std::vector<int64_t> order;
  int batch_size = 0;
  int num_fields = 2;  // leading fields assembled per batch
  size_t cursor = 0;
  int depth = 2;
  std::queue<Batch> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<bool> stop{false};
  std::thread worker;
};

bool read_i64(const uint8_t* p, size_t size, size_t* off, int64_t* out) {
  if (*off + 8 > size) return false;
  std::memcpy(out, p + *off, 8);
  *off += 8;
  return true;
}

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
  const size_t size = size_t(st.st_size);
  auto fail = [&] {
    ::munmap(base, st.st_size);
    ::close(fd);
    return false;
  };
  size_t off = 0;
  int64_t magic, T, N;
  double box_size, dt;
  if (!read_i64(p, size, &off, &magic)) return fail();
  if (!read_i64(p, size, &off, &T)) return fail();
  if (!read_i64(p, size, &off, &N)) return fail();
  if (off + 16 > size) return fail();
  std::memcpy(&box_size, p + off, 8);
  std::memcpy(&dt, p + off + 8, 8);
  off += 16;
  if (T <= 0 || N <= 0) return fail();

  std::vector<std::string> names;
  std::vector<int64_t> dims;
  if (magic == kMagicV1) {
    names = {"Coordinates", "InternalEnergy"};
    dims = {3, 1};
  } else if (magic == kMagicV2) {
    int64_t nf;
    if (!read_i64(p, size, &off, &nf) || nf <= 0 || nf > 64) return fail();
    for (int64_t i = 0; i < nf; ++i) {
      int64_t name_len, d;
      if (!read_i64(p, size, &off, &name_len)) return fail();
      if (name_len <= 0 || name_len > 256 || off + size_t(name_len) > size)
        return fail();
      names.emplace_back(reinterpret_cast<const char*>(p + off),
                         size_t(name_len));
      off += size_t(name_len);
      if (!read_i64(p, size, &off, &d) || d <= 0 || d > 4096) return fail();
      dims.push_back(d);
    }
  } else {
    return fail();
  }

  // Bounds before multiplying: sum(T*N*d)*4 must not overflow and must fit
  // the file (a corrupt header with huge T/N would otherwise wrap the
  // product, pass validation, and SIGBUS on first access).
  const size_t payload = size - off;
  uint64_t total_dim = 0;
  for (int64_t d : dims) total_dim += uint64_t(d);
  if (total_dim == 0 ||
      uint64_t(T) > payload / 4 / total_dim / uint64_t(N) ||
      size_t(T) * size_t(N) * size_t(total_dim) * 4 > payload)
    return fail();

  out->fd = fd;
  out->base = p;
  out->size = size;
  out->T = T;
  out->N = N;
  out->box_size = box_size;
  out->dt = dt;
  out->names = std::move(names);
  out->dims = std::move(dims);
  size_t cursor = off;
  for (size_t i = 0; i < out->dims.size(); ++i) {
    out->fields.push_back(reinterpret_cast<const float*>(p + cursor));
    cursor += size_t(T) * size_t(N) * size_t(out->dims[i]) * sizeof(float);
  }
  return true;
}

// Copy one sample's leading `nf` fields into per-sample offsets of the
// batch buffers.
void copy_sample(const Loader& L, int64_t global_seq, int64_t slot, int nf,
                 float* const* wins, float* const* tgts) {
  const int64_t sim_idx = global_seq / L.seq_per_sim;
  const int64_t s = global_seq % L.seq_per_sim;
  const SimFile& f = L.sims[sim_idx];
  const int64_t N = f.N;
  const int W = L.window;
  for (int i = 0; i < nf; ++i) {
    const int64_t d = f.dims[i];
    std::memcpy(wins[i] + slot * W * N * d, f.fields[i] + s * N * d,
                size_t(W) * N * d * sizeof(float));
    std::memcpy(tgts[i] + slot * N * d, f.fields[i] + (s + W) * N * d,
                size_t(N) * d * sizeof(float));
  }
}

void assemble_batch(const Loader& L, const int64_t* seqs, int batch, int nf,
                    float* const* wins, float* const* tgts) {
  const int threads =
      std::min<int>(L.num_threads, batch > 0 ? batch : 1);
  if (threads <= 1 || batch < 2) {
    for (int i = 0; i < batch; ++i)
      copy_sample(L, seqs[i], i, nf, wins, tgts);
    return;
  }
  std::vector<std::thread> pool;
  std::atomic<int> next{0};
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&] {
      int i;
      while ((i = next.fetch_add(1)) < batch)
        copy_sample(L, seqs[i], i, nf, wins, tgts);
    });
  }
  for (auto& th : pool) th.join();
}

void prefetch_loop(Prefetcher* pf) {
  Loader& L = *pf->loader;
  const SimFile& f0 = L.sims[0];
  const int64_t N = f0.N;
  const int W = L.window;
  const int B = pf->batch_size;
  const int nf = pf->num_fields;
  while (!pf->stop.load()) {
    if (pf->cursor + B > pf->order.size()) break;  // drop remainder
    Batch b;
    b.wins.resize(nf);
    b.tgts.resize(nf);
    std::vector<float*> wins(nf), tgts(nf);
    for (int i = 0; i < nf; ++i) {
      const int64_t d = f0.dims[i];
      b.wins[i].resize(size_t(B) * W * N * d);
      b.tgts[i].resize(size_t(B) * N * d);
      wins[i] = b.wins[i].data();
      tgts[i] = b.tgts[i].data();
    }
    assemble_batch(L, pf->order.data() + pf->cursor, B, nf, wins.data(),
                   tgts.data());
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
// failure (bad magic, shape/field mismatch across files, unopenable file).
void* wl_open(const char** paths, int num_files, int window, int num_threads) {
  if (num_files <= 0 || window < 1) return nullptr;
  auto* L = new Loader();
  L->window = window;
  L->num_threads = num_threads > 0 ? num_threads : 4;
  L->sims.resize(num_files);
  for (int i = 0; i < num_files; ++i) {
    if (!map_file(paths[i], &L->sims[i]) ||
        L->sims[i].T != L->sims[0].T || L->sims[i].N != L->sims[0].N ||
        L->sims[i].names != L->sims[0].names ||
        L->sims[i].dims != L->sims[0].dims) {
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

int wl_num_fields(void* handle) {
  return int(static_cast<Loader*>(handle)->sims[0].dims.size());
}

int64_t wl_field_dim(void* handle, int i) {
  auto* L = static_cast<Loader*>(handle);
  if (i < 0 || size_t(i) >= L->sims[0].dims.size()) return -1;
  return L->sims[0].dims[i];
}

// Copies the field name into `buf` (nul-terminated, truncated to cap).
// Returns the full name length, or -1 for a bad index.
int wl_field_name(void* handle, int i, char* buf, int cap) {
  auto* L = static_cast<Loader*>(handle);
  if (i < 0 || size_t(i) >= L->sims[0].names.size()) return -1;
  const std::string& s = L->sims[0].names[i];
  if (cap > 0) {
    int n = std::min<int>(cap - 1, int(s.size()));
    std::memcpy(buf, s.data(), n);
    buf[n] = 0;
  }
  return int(s.size());
}

// Assemble one batch of the leading `num_fields` fields synchronously
// (multithreaded memcpy). wins[i]/tgts[i] are [B, W, N, d_i]/[B, N, d_i].
void wl_get_batch_fields(void* handle, const int64_t* seqs, int batch,
                         int num_fields, float* const* wins,
                         float* const* tgts) {
  auto* L = static_cast<Loader*>(handle);
  assemble_batch(*L, seqs, batch, num_fields, wins, tgts);
}

// Classic 2-field path (fields 0/1 = Coordinates/InternalEnergy).
void wl_get_batch(void* handle, const int64_t* seqs, int batch, float* pos,
                  float* temp, float* tpos, float* ttemp) {
  float* wins[2] = {pos, temp};
  float* tgts[2] = {tpos, ttemp};
  wl_get_batch_fields(handle, seqs, batch, 2, wins, tgts);
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

void* wl_prefetch_start_fields(void* handle, const int64_t* order, int64_t num,
                               int batch, int depth, int num_fields) {
  auto* L = static_cast<Loader*>(handle);
  if (num_fields < 1 || size_t(num_fields) > L->sims[0].dims.size())
    return nullptr;
  auto* pf = new Prefetcher();
  pf->loader = L;
  pf->order.assign(order, order + num);
  pf->batch_size = batch;
  pf->depth = depth > 0 ? depth : 2;
  pf->num_fields = num_fields;
  pf->worker = std::thread(prefetch_loop, pf);
  return pf;
}

void* wl_prefetch_start(void* handle, const int64_t* order, int64_t num,
                        int batch, int depth) {
  return wl_prefetch_start_fields(handle, order, num, batch, depth, 2);
}

// Returns 1 and fills the buffers if a batch was produced; 0 at end of
// epoch. wins/tgts must hold the prefetcher's num_fields pointers.
int wl_prefetch_next_fields(void* pfh, float* const* wins,
                            float* const* tgts) {
  auto* pf = static_cast<Prefetcher*>(pfh);
  std::unique_lock<std::mutex> lk(pf->mu);
  pf->cv_ready.wait(lk, [&] { return pf->stop.load() || !pf->ready.empty(); });
  if (pf->ready.empty()) return 0;
  Batch b = std::move(pf->ready.front());
  pf->ready.pop();
  pf->cv_space.notify_one();
  lk.unlock();
  for (int i = 0; i < pf->num_fields; ++i) {
    std::memcpy(wins[i], b.wins[i].data(), b.wins[i].size() * sizeof(float));
    std::memcpy(tgts[i], b.tgts[i].data(), b.tgts[i].size() * sizeof(float));
  }
  return 1;
}

int wl_prefetch_next(void* pfh, float* pos, float* temp, float* tpos,
                     float* ttemp) {
  // Only valid for a 2-field prefetcher (the _fields loop would read past
  // the two pointers otherwise).
  if (static_cast<Prefetcher*>(pfh)->num_fields != 2) return 0;
  float* wins[2] = {pos, temp};
  float* tgts[2] = {tpos, ttemp};
  return wl_prefetch_next_fields(pfh, wins, tgts);
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
