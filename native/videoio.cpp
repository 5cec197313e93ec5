// Host-side video decode runtime — the TPU-native replacement for the
// reference's decord C++ VideoReader + ffmpeg-python subprocess path
// (processing_cogreasoner.py:156-160,362-407 / SURVEY.md §2.2 N2-N3).
//
// Design: one ffmpeg child per stream decodes to raw RGB24 over a pipe;
// a reader thread drains the pipe into a preallocated frame ring so
// decode overlaps TPU compute (double buffering at the host boundary).
// The consumer copies frames out at its own pace; back-pressure is the
// ring itself (reader blocks when full). Zero Python in the hot path —
// the Python binding (cogstream_tpu/processor/native_video.py) is
// ctypes over this C API.
//
// Build: make -C native   (g++ -O2 -shared -fPIC -pthread)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <signal.h>
#include <sys/wait.h>
#include <unistd.h>

namespace {

struct FrameRing {
  std::vector<uint8_t> data;   // ring_size * frame_bytes
  std::vector<int> filled;     // 1 = frame ready
  size_t frame_bytes = 0;
  int ring_size = 0;
  int head = 0;                // next slot the reader writes
  int tail = 0;                // next slot the consumer reads
  int count = 0;               // frames currently buffered
  bool eof = false;
  bool error = false;
  std::mutex mu;
  std::condition_variable cv_space, cv_data;
};

struct VideoStream {
  pid_t child = -1;
  int pipe_fd = -1;
  int width = 0, height = 0;
  std::atomic<bool> stop{false};
  std::thread reader;
  FrameRing ring;
  long frames_decoded = 0;
};

// Spawn ffmpeg writing rawvideo rgb24 to a pipe we own.
pid_t spawn_ffmpeg(const char* path, double fps, int width, int height,
                   double start, double end, int apply_scale,
                   int* out_fd) {
  int fds[2];
  if (pipe(fds) != 0) return -1;

  pid_t pid = fork();
  if (pid < 0) {
    close(fds[0]); close(fds[1]);
    return -1;
  }
  if (pid == 0) {
    // child: stdout -> pipe write end, stderr -> /dev/null
    dup2(fds[1], STDOUT_FILENO);
    close(fds[0]); close(fds[1]);
    int devnull = open("/dev/null", O_WRONLY);
    if (devnull >= 0) dup2(devnull, STDERR_FILENO);

    // trim + filter args mirror processor/video_loader.load_video's
    // subprocess command exactly (input-side -ss/-t, fps round=up) so
    // the ring path is frame-identical to the buffered path
    std::vector<std::string> args = {"ffmpeg", "-nostdin", "-v", "error"};
    char buf[64];
    if (end > start || start > 0) {
      snprintf(buf, sizeof buf, "%.6f", start);
      args.push_back("-ss"); args.push_back(buf);
      if (end > start) {
        snprintf(buf, sizeof buf, "%.6f", end - start);
        args.push_back("-t"); args.push_back(buf);
      }
    }
    args.push_back("-i"); args.push_back(path);
    std::string vf;
    if (fps > 0) {
      snprintf(buf, sizeof buf, "fps=fps=%.4f:round=up", fps);
      vf = buf;
    }
    if (apply_scale && width > 0 && height > 0) {
      snprintf(buf, sizeof buf, "scale=%d:%d", width, height);
      if (!vf.empty()) vf += ",";
      vf += buf;
    }
    if (!vf.empty()) { args.push_back("-vf"); args.push_back(vf); }
    args.insert(args.end(), {"-f", "rawvideo", "-pix_fmt", "rgb24", "-"});

    std::vector<char*> argv;
    for (auto& a : args) argv.push_back(const_cast<char*>(a.c_str()));
    argv.push_back(nullptr);
    execvp("ffmpeg", argv.data());
    _exit(127);
  }
  close(fds[1]);
  *out_fd = fds[0];
  return pid;
}

bool read_exact(int fd, uint8_t* dst, size_t n, std::atomic<bool>& stop) {
  size_t got = 0;
  while (got < n && !stop.load()) {
    ssize_t r = read(fd, dst + got, n - got);
    if (r <= 0) return false;
    got += static_cast<size_t>(r);
  }
  return got == n;
}

void reader_main(VideoStream* vs) {
  FrameRing& rg = vs->ring;
  std::vector<uint8_t> tmp(rg.frame_bytes);
  while (!vs->stop.load()) {
    if (!read_exact(vs->pipe_fd, tmp.data(), rg.frame_bytes, vs->stop)) {
      std::lock_guard<std::mutex> lk(rg.mu);
      rg.eof = true;
      rg.cv_data.notify_all();
      return;
    }
    std::unique_lock<std::mutex> lk(rg.mu);
    rg.cv_space.wait(lk, [&] {
      return rg.count < rg.ring_size || vs->stop.load();
    });
    if (vs->stop.load()) return;
    std::memcpy(rg.data.data() + (size_t)rg.head * rg.frame_bytes,
                tmp.data(), rg.frame_bytes);
    rg.filled[rg.head] = 1;
    rg.head = (rg.head + 1) % rg.ring_size;
    rg.count++;
    vs->frames_decoded++;
    rg.cv_data.notify_all();
  }
}

}  // namespace

extern "C" {

// Open a decode stream. width/height must be the post-scale dims the
// caller wants (probe first from Python via ffprobe). fps<=0 keeps the
// native frame rate. apply_scale=0 skips the scale filter (pass the
// SOURCE dims then — the ring still needs them for frame sizing) so a
// no-resize decode stays bit-identical to an unfiltered pipe.
// Returns nullptr on failure.
void* vio_open(const char* path, double fps, int width, int height,
               double start, double end, int ring_frames,
               int apply_scale) {
  if (width <= 0 || height <= 0 || ring_frames <= 0) return nullptr;
  auto* vs = new VideoStream();
  vs->width = width;
  vs->height = height;
  vs->ring.frame_bytes = (size_t)width * height * 3;
  vs->ring.ring_size = ring_frames;
  vs->ring.data.resize((size_t)ring_frames * vs->ring.frame_bytes);
  vs->ring.filled.assign(ring_frames, 0);
  vs->child = spawn_ffmpeg(path, fps, width, height, start, end,
                           apply_scale, &vs->pipe_fd);
  if (vs->child < 0) { delete vs; return nullptr; }
  vs->reader = std::thread(reader_main, vs);
  return vs;
}

// Copy the next frame into out (size must be width*height*3).
// Returns 1 on success, 0 on EOF, -1 on error.
int vio_next(void* handle, uint8_t* out) {
  auto* vs = static_cast<VideoStream*>(handle);
  FrameRing& rg = vs->ring;
  std::unique_lock<std::mutex> lk(rg.mu);
  rg.cv_data.wait(lk, [&] { return rg.count > 0 || rg.eof || rg.error; });
  if (rg.count == 0) return rg.error ? -1 : 0;
  std::memcpy(out, rg.data.data() + (size_t)rg.tail * rg.frame_bytes,
              rg.frame_bytes);
  rg.filled[rg.tail] = 0;
  rg.tail = (rg.tail + 1) % rg.ring_size;
  rg.count--;
  rg.cv_space.notify_all();
  return 1;
}

// Number of frames currently buffered (for overlap diagnostics).
int vio_buffered(void* handle) {
  auto* vs = static_cast<VideoStream*>(handle);
  std::lock_guard<std::mutex> lk(vs->ring.mu);
  return vs->ring.count;
}

long vio_frames_decoded(void* handle) {
  return static_cast<VideoStream*>(handle)->frames_decoded;
}

void vio_close(void* handle) {
  auto* vs = static_cast<VideoStream*>(handle);
  vs->stop.store(true);
  vs->ring.cv_space.notify_all();
  vs->ring.cv_data.notify_all();
  // Kill the child BEFORE joining the reader: a stalled decoder (child
  // alive but writing nothing) leaves the reader blocked in read(2),
  // where neither the stop flag nor closing the fd from this thread
  // reliably wakes it — killing the child closes the pipe's write end,
  // so the blocked read returns 0 and the reader exits. (Found by the
  // stub-decoder runtime test, tests/test_native_video_runtime.py.)
  if (vs->child > 0) kill(vs->child, SIGKILL);
  if (vs->reader.joinable()) vs->reader.join();
  if (vs->pipe_fd >= 0) close(vs->pipe_fd);
  if (vs->child > 0) {
    int status;
    waitpid(vs->child, &status, 0);
  }
  delete vs;
}

}  // extern "C"
