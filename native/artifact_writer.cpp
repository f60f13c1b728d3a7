// Async artifact writer: background-thread PLY / PNG / PPM encoding + IO.
//
// Native runtime component of gaussianip_tpu (the reference leans on native
// code for its runtime hot spots; here the host-side cost worth taking off
// the training loop is artifact writing — 500k-splat .ply checkpoints are
// ~130 MB and validation renders land every 100 steps, both of which the
// reference writes synchronously on the trainer thread via plyfile/cv2,
// reference: gaussiansplatting/scene/gaussian_model.py:199-216,
// threestudio/utils/saving.py:128-240).
//
// C API (ctypes-friendly), all functions return 0 on success:
//   aw_init()                      start the worker thread
//   aw_write_ply(path, data, n, n_props)   3DGS vertex table, float32 rows
//   aw_write_png(path, rgb, h, w)  8-bit RGB PNG (zlib, filter 0)
//   aw_write_ppm(path, rgb, h, w)  8-bit RGB binary PPM
//   aw_pending()                   jobs still queued/active
//   aw_flush()                     block until the queue drains
//   aw_shutdown()                  flush + stop the worker
//
// Data buffers are copied at enqueue time; the caller may free immediately.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Job {
  enum Kind { PLY, PNG, PPM } kind;
  std::string path;
  std::vector<uint8_t> bytes;   // raw pixel or float payload
  int64_t n = 0;                // rows (ply) or height (images)
  int64_t m = 0;                // props per row (ply) or width (images)
};

std::deque<Job> g_queue;
std::mutex g_mu;
std::condition_variable g_cv;
std::condition_variable g_done_cv;
std::thread g_worker;
bool g_running = false;
int g_active = 0;

void write_all(FILE* f, const void* p, size_t n) { fwrite(p, 1, n, f); }

void do_ply(const Job& j) {
  // header matches the reference's plyfile layout (x y z nx ny nz f_dc_*
  // f_rest_* opacity scale_* rot_*) — the caller passes the full property
  // list implicitly via n_props; names for the standard 3DGS layout.
  FILE* f = fopen(j.path.c_str(), "wb");
  if (!f) return;
  const int64_t n_props = j.m;
  const int64_t n_rest = n_props - 17;  // 3 xyz + 3 n + 3 dc + 1 op + 3 s + 4 r
  std::string head = "ply\nformat binary_little_endian 1.0\n";
  head += "element vertex " + std::to_string(j.n) + "\n";
  const char* base1[] = {"x", "y", "z", "nx", "ny", "nz",
                         "f_dc_0", "f_dc_1", "f_dc_2"};
  for (auto* p : base1) head += std::string("property float ") + p + "\n";
  for (int64_t i = 0; i < n_rest; i++)
    head += "property float f_rest_" + std::to_string(i) + "\n";
  head += "property float opacity\n";
  for (int i = 0; i < 3; i++)
    head += "property float scale_" + std::to_string(i) + "\n";
  for (int i = 0; i < 4; i++)
    head += "property float rot_" + std::to_string(i) + "\n";
  head += "end_header\n";
  write_all(f, head.data(), head.size());
  write_all(f, j.bytes.data(), j.bytes.size());
  fclose(f);
}

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24); v.push_back(x >> 16); v.push_back(x >> 8);
  v.push_back(x);
}

void png_chunk(FILE* f, const char* tag, const std::vector<uint8_t>& data) {
  std::vector<uint8_t> hdr;
  put_be32(hdr, (uint32_t)data.size());
  write_all(f, hdr.data(), 4);
  write_all(f, tag, 4);
  if (!data.empty()) write_all(f, data.data(), data.size());
  std::vector<uint8_t> crcbuf(tag, tag + 4);
  crcbuf.insert(crcbuf.end(), data.begin(), data.end());
  uint32_t c = crc32(0, crcbuf.data(), (uInt)crcbuf.size());
  std::vector<uint8_t> crc;
  put_be32(crc, c);
  write_all(f, crc.data(), 4);
}

void do_png(const Job& j) {
  const int64_t h = j.n, w = j.m;
  // filter byte 0 per row
  std::vector<uint8_t> raw;
  raw.reserve((size_t)h * (w * 3 + 1));
  for (int64_t y = 0; y < h; y++) {
    raw.push_back(0);
    raw.insert(raw.end(), j.bytes.begin() + y * w * 3,
               j.bytes.begin() + (y + 1) * w * 3);
  }
  uLongf comp_len = compressBound((uLong)raw.size());
  std::vector<uint8_t> comp(comp_len);
  if (compress2(comp.data(), &comp_len, raw.data(), (uLong)raw.size(), 6)
      != Z_OK)
    return;
  comp.resize(comp_len);

  FILE* f = fopen(j.path.c_str(), "wb");
  if (!f) return;
  const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  write_all(f, sig, 8);
  std::vector<uint8_t> ihdr;
  put_be32(ihdr, (uint32_t)w);
  put_be32(ihdr, (uint32_t)h);
  ihdr.push_back(8);   // bit depth
  ihdr.push_back(2);   // color type RGB
  ihdr.push_back(0); ihdr.push_back(0); ihdr.push_back(0);
  png_chunk(f, "IHDR", ihdr);
  png_chunk(f, "IDAT", comp);
  png_chunk(f, "IEND", {});
  fclose(f);
}

void do_ppm(const Job& j) {
  FILE* f = fopen(j.path.c_str(), "wb");
  if (!f) return;
  fprintf(f, "P6\n%lld %lld\n255\n", (long long)j.m, (long long)j.n);
  write_all(f, j.bytes.data(), j.bytes.size());
  fclose(f);
}

void worker_main() {
  for (;;) {
    Job job;
    {
      std::unique_lock<std::mutex> lk(g_mu);
      g_cv.wait(lk, [] { return !g_queue.empty() || !g_running; });
      if (g_queue.empty()) {
        if (!g_running) return;
        continue;
      }
      job = std::move(g_queue.front());
      g_queue.pop_front();
      g_active++;
    }
    switch (job.kind) {
      case Job::PLY: do_ply(job); break;
      case Job::PNG: do_png(job); break;
      case Job::PPM: do_ppm(job); break;
    }
    {
      std::lock_guard<std::mutex> lk(g_mu);
      g_active--;
      g_done_cv.notify_all();
    }
  }
}

void enqueue(Job&& j) {
  std::lock_guard<std::mutex> lk(g_mu);
  g_queue.push_back(std::move(j));
  g_cv.notify_one();
}

}  // namespace

extern "C" {

int aw_init() {
  std::lock_guard<std::mutex> lk(g_mu);
  if (g_running) return 0;
  g_running = true;
  g_worker = std::thread(worker_main);
  return 0;
}

int aw_write_ply(const char* path, const float* data, int64_t n,
                 int64_t n_props) {
  if (!g_running || n_props < 17) return 1;
  Job j;
  j.kind = Job::PLY;
  j.path = path;
  j.n = n;
  j.m = n_props;
  j.bytes.assign((const uint8_t*)data,
                 (const uint8_t*)data + (size_t)n * n_props * 4);
  enqueue(std::move(j));
  return 0;
}

int aw_write_png(const char* path, const uint8_t* rgb, int64_t h, int64_t w) {
  if (!g_running) return 1;
  Job j;
  j.kind = Job::PNG;
  j.path = path;
  j.n = h;
  j.m = w;
  j.bytes.assign(rgb, rgb + (size_t)h * w * 3);
  enqueue(std::move(j));
  return 0;
}

int aw_write_ppm(const char* path, const uint8_t* rgb, int64_t h, int64_t w) {
  if (!g_running) return 1;
  Job j;
  j.kind = Job::PPM;
  j.path = path;
  j.n = h;
  j.m = w;
  j.bytes.assign(rgb, rgb + (size_t)h * w * 3);
  enqueue(std::move(j));
  return 0;
}

int64_t aw_pending() {
  std::lock_guard<std::mutex> lk(g_mu);
  return (int64_t)g_queue.size() + g_active;
}

int aw_flush() {
  std::unique_lock<std::mutex> lk(g_mu);
  g_done_cv.wait(lk, [] { return g_queue.empty() && g_active == 0; });
  return 0;
}

int aw_shutdown() {
  aw_flush();
  {
    std::lock_guard<std::mutex> lk(g_mu);
    g_running = false;
    g_cv.notify_all();
  }
  if (g_worker.joinable()) g_worker.join();
  return 0;
}

}  // extern "C"
