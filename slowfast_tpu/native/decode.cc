// Native host-side decode service: multi-threaded JPEG batch decoding.
//
// The reference delegates frame decoding to OpenCV/PyAV worker processes
// (SURVEY.md §2.10). This library is the TPU build's first-party native
// equivalent for the frame-JPEG path (AVA/SSv2/Charades): a persistent
// thread pool decodes a batch of JPEG files straight into one caller-owned
// contiguous RGB buffer (the future device_put source), avoiding Python
// object churn and per-image allocations.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
//
// Build: see slowfast_tpu/native/build.py (g++ -O3 -shared -ljpeg -lpthread).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file into dst (H*W*3, RGB). Returns 0 on success.
// If the decoded image does not match (h, w), performs nearest-neighbor
// resize into the destination (datasets pre-size frames, so this is rare).
int decode_one(const char* path, unsigned char* dst, int dst_h, int dst_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  const int row_bytes = w * 3;

  if (h == dst_h && w == dst_w) {
    std::vector<unsigned char*> rows(h);
    for (int r = 0; r < h; ++r) rows[r] = dst + (size_t)r * row_bytes;
    while (cinfo.output_scanline < cinfo.output_height) {
      jpeg_read_scanlines(&cinfo, rows.data() + cinfo.output_scanline,
                          cinfo.output_height - cinfo.output_scanline);
    }
  } else {
    std::vector<unsigned char> buf((size_t)h * row_bytes);
    std::vector<unsigned char*> rows(h);
    for (int r = 0; r < h; ++r) rows[r] = buf.data() + (size_t)r * row_bytes;
    while (cinfo.output_scanline < cinfo.output_height) {
      jpeg_read_scanlines(&cinfo, rows.data() + cinfo.output_scanline,
                          cinfo.output_height - cinfo.output_scanline);
    }
    // Nearest-neighbor resize into dst.
    for (int r = 0; r < dst_h; ++r) {
      const int sr = (int)((long long)r * h / dst_h);
      unsigned char* drow = dst + (size_t)r * dst_w * 3;
      const unsigned char* srow = buf.data() + (size_t)sr * row_bytes;
      for (int c = 0; c < dst_w; ++c) {
        const int sc = (int)((long long)c * w / dst_w);
        std::memcpy(drow + c * 3, srow + sc * 3, 3);
      }
    }
  }

  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

struct Task {
  const char* path;
  unsigned char* dst;
  int h, w;
  int* result;
  std::atomic<int>* remaining;
  std::condition_variable* done_cv;
  std::mutex* done_mu;
};

class Pool {
 public:
  explicit Pool(int n_threads) : stop_(false) {
    for (int i = 0; i < n_threads; ++i) {
      threads_.emplace_back([this] { Worker(); });
    }
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  void Submit(const Task& t) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(t);
    }
    cv_.notify_one();
  }

 private:
  void Worker() {
    for (;;) {
      Task t;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        t = q_.front();
        q_.pop();
      }
      *t.result = decode_one(t.path, t.dst, t.h, t.w);
      if (t.remaining->fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(*t.done_mu);
        t.done_cv->notify_all();
      }
    }
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<Task> q_;
  std::vector<std::thread> threads_;
  bool stop_;
};

Pool* g_pool = nullptr;
std::mutex g_pool_mu;

}  // namespace

extern "C" {

// Initialize the persistent decode pool.
void sf_decode_init(int n_threads) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (!g_pool) g_pool = new Pool(n_threads > 0 ? n_threads : 8);
}

// Decode `n` JPEG files into one contiguous (n, h, w, 3) uint8 buffer.
// paths: array of n C strings; out: caller-allocated buffer;
// results: per-image status (0 ok). Returns number of failures.
int sf_decode_batch(const char** paths, int n, unsigned char* out, int h,
                    int w, int* results) {
  if (!g_pool) sf_decode_init(0);
  std::atomic<int> remaining(n);
  std::condition_variable done_cv;
  std::mutex done_mu;
  const size_t img_bytes = (size_t)h * w * 3;
  for (int i = 0; i < n; ++i) {
    Task t{paths[i], out + i * img_bytes, h, w, &results[i], &remaining,
           &done_cv, &done_mu};
    g_pool->Submit(t);
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  int failures = 0;
  for (int i = 0; i < n; ++i) failures += (results[i] != 0);
  return failures;
}

// Probe a JPEG's dimensions without full decode.
int sf_probe(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

}  // extern "C"
