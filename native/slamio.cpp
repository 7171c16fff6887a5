// slamio: native host-side runtime for slam_robot_tpu.
//
// Rebuilds the reference's hardware I/O layer (video.cpp) as a small C
// library consumed from Python via ctypes:
//   - yuyv_to_bgr / yuyv_to_grey: the integer YUYV->BGR conversion the
//     reference does inline per frame (video.cpp:187-223 semantics)
//   - v4l2 capture: open / S_FMT 640x480 YUYV / S_PARM fps / mmap ring /
//     STREAMON, select()-gated DQBUF (video.cpp:255-340, 39-72)
//   - frame ring buffer with a reader thread: prefetch decode off the
//     device-feeding thread (replaces the blocking per-frame fetch)
//
// Build: make -C native   (produces libslamio.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <atomic>
#include <condition_variable>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// YUYV conversion (integer math, BT.601 coefficients as in the reference)
// ---------------------------------------------------------------------------

static inline int sat8(int c) { return c < 0 ? 0 : (c > 255 ? 255 : c); }

// YUYV (2 pixels / 4 bytes) -> BGR888. n_bytes must be a multiple of 4.
void yuyv_to_bgr(const uint8_t* in, int n_bytes, uint8_t* out) {
  for (int i = 0; i < n_bytes; i += 4) {
    const uint8_t* p = in + i;
    int y1 = p[0];
    int cb = ((p[1] - 128) * 454) >> 8;
    int cg = (p[1] - 128) * 88;
    int y2 = p[2];
    int cr = ((p[3] - 128) * 359) >> 8;
    cg = (cg + (p[3] - 128) * 183) >> 8;

    *out++ = (uint8_t)sat8(y1 + cb);
    *out++ = (uint8_t)sat8(y1 - cg);
    *out++ = (uint8_t)sat8(y1 + cr);
    *out++ = (uint8_t)sat8(y2 + cb);
    *out++ = (uint8_t)sat8(y2 - cg);
    *out++ = (uint8_t)sat8(y2 + cr);
  }
}

// YUYV -> grey f32 in [0,1]: the luma channel directly (the SLAM pipeline
// only consumes grey; skipping chroma halves the bandwidth).
void yuyv_to_grey(const uint8_t* in, int n_bytes, float* out) {
  const float k = 1.0f / 255.0f;
  for (int i = 0; i < n_bytes; i += 4) {
    *out++ = in[i] * k;
    *out++ = in[i + 2] * k;
  }
}

// BGR888 -> grey f32 with the CV_RGB2GRAY weights used by the tracker.
void bgr_to_grey(const uint8_t* in, int n_px, float* out) {
  const float kb = 0.114f / 255.0f, kg = 0.587f / 255.0f, kr = 0.299f / 255.0f;
  for (int i = 0; i < n_px; ++i) {
    out[i] = in[3 * i] * kb + in[3 * i + 1] * kg + in[3 * i + 2] * kr;
  }
}

// ---------------------------------------------------------------------------
// frame ring buffer with reader thread
// ---------------------------------------------------------------------------

typedef int (*frame_fill_fn)(void* ctx, float* dst);  // 1 ok, 0 end

struct FrameRing {
  int capacity;
  int frame_floats;
  std::vector<std::vector<float>> slots;
  std::vector<int> ids;
  int head = 0, tail = 0, count = 0;
  bool done = false;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::thread reader;
};

FrameRing* ring_create(int capacity, int frame_floats) {
  auto* r = new FrameRing();
  r->capacity = capacity;
  r->frame_floats = frame_floats;
  r->slots.assign(capacity, std::vector<float>(frame_floats));
  r->ids.assign(capacity, -1);
  return r;
}

void ring_start(FrameRing* r, frame_fill_fn fill, void* ctx) {
  r->reader = std::thread([r, fill, ctx]() {
    int id = 0;
    for (;;) {
      std::vector<float> buf(r->frame_floats);
      int ok = fill(ctx, buf.data());
      std::unique_lock<std::mutex> lk(r->mu);
      if (!ok) {
        r->done = true;
        r->cv_get.notify_all();
        return;
      }
      r->cv_put.wait(lk, [r] { return r->count < r->capacity; });
      r->slots[r->head].swap(buf);
      r->ids[r->head] = id++;
      r->head = (r->head + 1) % r->capacity;
      r->count++;
      r->cv_get.notify_one();
    }
  });
}

// Blocks for the next frame; returns its id or -1 at end of stream.
int ring_next(FrameRing* r, float* dst) {
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_get.wait(lk, [r] { return r->count > 0 || r->done; });
  if (r->count == 0 && r->done) return -1;
  std::memcpy(dst, r->slots[r->tail].data(), r->frame_floats * sizeof(float));
  int id = r->ids[r->tail];
  r->tail = (r->tail + 1) % r->capacity;
  r->count--;
  r->cv_put.notify_one();
  return id;
}

void ring_destroy(FrameRing* r) {
  {
    std::unique_lock<std::mutex> lk(r->mu);
    r->done = true;
    r->count = 0;
    r->cv_put.notify_all();
    r->cv_get.notify_all();
  }
  if (r->reader.joinable()) r->reader.join();
  delete r;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// V4L2 capture (Linux only; compiled in when the headers exist)
// ---------------------------------------------------------------------------
#ifdef __linux__
#include <fcntl.h>
#include <sys/ioctl.h>
#include <sys/mman.h>
#include <sys/select.h>
#include <unistd.h>

#include <linux/videodev2.h>

extern "C" {

struct V4L2Cap {
  int fd = -1;
  int width = 0, height = 0;
  struct MapBuf {
    void* start;
    size_t length;
  };
  std::vector<MapBuf> bufs;
};

static int xioctl(int fd, unsigned long req, void* arg) {
  int r;
  do {
    r = ioctl(fd, req, arg);
  } while (r == -1 && errno == EINTR);
  return r;
}

// Open + configure + start streaming. Returns NULL on failure.
V4L2Cap* v4l2_open(const char* device, int width, int height, int fps,
                   int num_buffers) {
  V4L2Cap* c = new V4L2Cap();
  c->fd = open(device, O_RDWR | O_NONBLOCK, 0);
  c->width = width;
  c->height = height;
  if (c->fd < 0) goto fail;

  {
    struct v4l2_capability cap;
    if (xioctl(c->fd, VIDIOC_QUERYCAP, &cap) == -1) goto fail;
    if (!(cap.capabilities & V4L2_CAP_VIDEO_CAPTURE)) goto fail;

    struct v4l2_format fmt;
    std::memset(&fmt, 0, sizeof(fmt));
    fmt.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    fmt.fmt.pix.width = width;
    fmt.fmt.pix.height = height;
    fmt.fmt.pix.pixelformat = V4L2_PIX_FMT_YUYV;
    fmt.fmt.pix.field = V4L2_FIELD_INTERLACED;
    if (xioctl(c->fd, VIDIOC_S_FMT, &fmt) == -1) goto fail;

    struct v4l2_streamparm parm;
    std::memset(&parm, 0, sizeof(parm));
    parm.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    parm.parm.capture.timeperframe.numerator = 1;
    parm.parm.capture.timeperframe.denominator = fps;
    xioctl(c->fd, VIDIOC_S_PARM, &parm);  // best-effort

    struct v4l2_requestbuffers req;
    std::memset(&req, 0, sizeof(req));
    req.count = num_buffers;
    req.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    req.memory = V4L2_MEMORY_MMAP;
    if (xioctl(c->fd, VIDIOC_REQBUFS, &req) == -1) goto fail;

    for (unsigned i = 0; i < req.count; ++i) {
      struct v4l2_buffer buf;
      std::memset(&buf, 0, sizeof(buf));
      buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
      buf.memory = V4L2_MEMORY_MMAP;
      buf.index = i;
      if (xioctl(c->fd, VIDIOC_QUERYBUF, &buf) == -1) goto fail;
      void* p = mmap(nullptr, buf.length, PROT_READ | PROT_WRITE, MAP_SHARED,
                     c->fd, buf.m.offset);
      if (p == MAP_FAILED) goto fail;
      c->bufs.push_back({p, buf.length});
      if (xioctl(c->fd, VIDIOC_QBUF, &buf) == -1) goto fail;
    }

    enum v4l2_buf_type type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    if (xioctl(c->fd, VIDIOC_STREAMON, &type) == -1) goto fail;
  }
  return c;

fail:
  if (c->fd >= 0) close(c->fd);
  delete c;
  return nullptr;
}

// Grab one frame as grey f32 [h*w]. Returns 1 ok, 0 failure.
int v4l2_read_grey(V4L2Cap* c, float* dst) {
  fd_set fds;
  FD_ZERO(&fds);
  FD_SET(c->fd, &fds);
  struct timeval tv;
  tv.tv_sec = 2;
  tv.tv_usec = 0;
  if (select(c->fd + 1, &fds, nullptr, nullptr, &tv) <= 0) return 0;

  struct v4l2_buffer buf;
  std::memset(&buf, 0, sizeof(buf));
  buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
  buf.memory = V4L2_MEMORY_MMAP;
  if (xioctl(c->fd, VIDIOC_DQBUF, &buf) == -1) return 0;
  if (buf.index >= c->bufs.size()) return 0;

  yuyv_to_grey((const uint8_t*)c->bufs[buf.index].start, buf.bytesused, dst);

  if (xioctl(c->fd, VIDIOC_QBUF, &buf) == -1) return 0;
  return 1;
}

void v4l2_close(V4L2Cap* c) {
  if (!c) return;
  enum v4l2_buf_type type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
  xioctl(c->fd, VIDIOC_STREAMOFF, &type);
  for (auto& b : c->bufs) munmap(b.start, b.length);
  if (c->fd >= 0) close(c->fd);
  delete c;
}

}  // extern "C"
#endif  // __linux__
