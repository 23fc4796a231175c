// Native data loader: grayscale PNG decode + threaded in-order prefetch.
//
// TPU-native equivalent of the reference's C++ IO layer
// (src/io/data_loader.cc — cv::imread + per-frame host preprocessing on the
// tracking thread).  Here decode runs on a worker pool AHEAD of the
// consumer so host IO hides behind device compute: at the 500 f/s extractor
// operating point a ~2 ms PNG decode on the hot thread would dominate the
// frame budget, so the ring decodes ahead and the consumer memcpy's the
// next frame in order.
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   dataio_png_size(path, &w, &h)          -> 0 on success
//   dataio_png_gray(path, out, w, h)       -> 0 on success (out: w*h bytes)
//   dataio_prefetch_open(paths, n, w, h, ring, threads) -> handle or NULL
//   dataio_prefetch_next(handle, out)      -> frame index or <0 on error
//   dataio_prefetch_close(handle)
//
// Build: make -C native  (g++ -O2 -shared -fPIC dataio.cpp -lpng -lz)

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// Decode one PNG to 8-bit grayscale.  Returns 0 on success, negative codes
// on open/parse/shape errors.  Any color type is normalized to gray via
// libpng transforms (16->8, palette->rgb, rgb->gray, alpha stripped).
int decode_png_gray(const char *path, unsigned char *out, int expect_w,
                    int expect_h) {
  FILE *fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return -2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return -2;
  }
  if (setjmp(png_jmpbuf(png))) {  // libpng error trampoline
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  if (expect_w > 0 && (w != expect_w || h != expect_h)) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -4;
  }
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_COLOR)
    // ITU-R 601 coefficients (0.299/0.587/0.114) to match the reference's
    // cv::imread(...IMREAD_GRAYSCALE) and PIL convert("L") up to rounding
    png_set_rgb_to_gray_fixed(png, 1, 29900, 58700);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != static_cast<size_t>(w)) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -5;
  }
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out + static_cast<size_t>(y) * w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

struct Prefetcher {
  std::vector<std::string> paths;
  int w = 0, h = 0, ring = 4;
  std::atomic<int> next_claim{0};
  int next_emit = 0;
  bool closing = false;
  std::mutex mu;
  std::condition_variable cv_ready;  // consumer waits for next_emit
  std::condition_variable cv_space;  // workers wait for ring space
  // decoded frames waiting for in-order delivery: index -> (buf, status)
  std::map<int, std::pair<std::unique_ptr<unsigned char[]>, int>> ready;
  std::vector<std::thread> workers;

  void worker() {
    const size_t npx = static_cast<size_t>(w) * h;
    for (;;) {
      int i = next_claim.fetch_add(1);
      if (i >= static_cast<int>(paths.size())) return;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] { return closing || i < next_emit + ring; });
        if (closing) return;
      }
      auto buf = std::make_unique<unsigned char[]>(npx);
      int st = decode_png_gray(paths[i].c_str(), buf.get(), w, h);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace(i, std::make_pair(std::move(buf), st));
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int dataio_png_size(const char *path, int *w, int *h) {
  FILE *fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    std::fclose(fp);
    return -2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

int dataio_png_gray(const char *path, unsigned char *out, int w, int h) {
  return decode_png_gray(path, out, w, h);
}

void *dataio_prefetch_open(const char **paths, int n, int w, int h, int ring,
                           int threads) {
  if (n <= 0 || w <= 0 || h <= 0) return nullptr;
  auto *p = new Prefetcher();
  p->paths.reserve(n);
  for (int i = 0; i < n; ++i) p->paths.emplace_back(paths[i]);
  p->w = w;
  p->h = h;
  p->ring = ring > 0 ? ring : 4;
  int nt = threads > 0 ? threads : 2;
  if (nt > n) nt = n;
  for (int t = 0; t < nt; ++t)
    p->workers.emplace_back(&Prefetcher::worker, p);
  return p;
}

int dataio_prefetch_next(void *hp, unsigned char *out) {
  auto *p = static_cast<Prefetcher *>(hp);
  if (!p || p->next_emit >= static_cast<int>(p->paths.size())) return -1;
  const size_t npx = static_cast<size_t>(p->w) * p->h;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_ready.wait(lk, [&] { return p->ready.count(p->next_emit) > 0; });
  auto it = p->ready.find(p->next_emit);
  int st = it->second.second;
  if (st == 0) std::memcpy(out, it->second.first.get(), npx);
  p->ready.erase(it);
  int idx = p->next_emit++;
  lk.unlock();
  p->cv_space.notify_all();
  return st == 0 ? idx : -100 + st;
}

void dataio_prefetch_close(void *hp) {
  auto *p = static_cast<Prefetcher *>(hp);
  if (!p) return;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->closing = true;
  }
  p->cv_space.notify_all();
  for (auto &t : p->workers) t.join();
  delete p;
}

}  // extern "C"
