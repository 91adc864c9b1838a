// fastdnn-io — native host-side CLI over the fastdnn_io data plane.
//
// The reference ships a native executable for its host data path
// (/root/reference/src/cpp/dnn.cc:20-84); scoring here happens on the TPU
// via the Python engine, so the native CLI covers the pure host-side jobs:
// inspecting and converting model/feature files without starting a Python
// process.
//
//   fastdnn-io info MODEL.bin              print topology + parameter count
//   fastdnn-io finfo FEATURES.bin          print frame count / dim / stats
//   fastdnn-io text2bin FEATS.txt OUT.bin  Kaldi text features -> binary
//                                          (first utterance, like
//                                          BatchData.loadFromText)
//   fastdnn-io dump FEATURES.bin [N]       print the first N frames as text
//
// Build: make -C native (produces native/fastdnn-io next to the .so).

#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {
void* fd_read_model(const char* path);
int32_t fd_model_layer_count(void* h);
int32_t fd_model_input_dim(void* h, int32_t i);
int32_t fd_model_output_dim(void* h, int32_t i);
void fd_model_free(void* h);
int32_t fd_read_features(const char* path, float** data, int32_t* frames, int32_t* dim);
int32_t fd_write_features(const char* path, const float* data, int32_t frames, int32_t dim);
void fd_buffer_free(float* p);
void* fd_read_features_text(const char* path);
int32_t fd_ftext_count(void* h);
const char* fd_ftext_id(void* h, int32_t i);
int32_t fd_ftext_frames(void* h, int32_t i);
int32_t fd_ftext_dim(void* h, int32_t i);
const float* fd_ftext_data(void* h, int32_t i);
void fd_ftext_free(void* h);
}

static int cmd_info(const char* path) {
  void* h = fd_read_model(path);
  if (!h) {
    std::fprintf(stderr, "error: cannot parse model file %s\n", path);
    return 2;
  }
  const int32_t layers = fd_model_layer_count(h);
  int64_t params = 0;
  std::printf("layers  = %d\n", layers);
  std::printf("topology= %d", fd_model_input_dim(h, 0));
  for (int32_t i = 0; i < layers; ++i) {
    std::printf("-%d", fd_model_output_dim(h, i));
    params += int64_t(fd_model_input_dim(h, i)) * fd_model_output_dim(h, i) +
              fd_model_output_dim(h, i);
  }
  std::printf("\nparams  = %" PRId64 "\n", params);
  fd_model_free(h);
  return 0;
}

static int cmd_finfo(const char* path) {
  float* data = nullptr;
  int32_t frames = 0, dim = 0;
  if (fd_read_features(path, &data, &frames, &dim) != 0) {
    std::fprintf(stderr, "error: cannot read feature file %s\n", path);
    return 2;
  }
  double mn = 1e30, mx = -1e30, sum = 0;
  const int64_t count = int64_t(frames) * dim;
  for (int64_t i = 0; i < count; ++i) {
    const double v = data[i];
    if (v < mn) mn = v;
    if (v > mx) mx = v;
    sum += v;
  }
  std::printf("frames = %d\ndim    = %d\nmin    = %.6f\nmax    = %.6f\nmean   = %.6f\n",
              frames, dim, mn, mx, count ? sum / double(count) : 0.0);
  fd_buffer_free(data);
  return 0;
}

static int cmd_text2bin(const char* in, const char* out) {
  void* h = fd_read_features_text(in);
  if (!h) {
    std::fprintf(stderr, "error: cannot parse text feature file %s\n", in);
    return 2;
  }
  // first utterance, like BatchData.loadFromText (BatchData.java:181-183)
  const int32_t frames = fd_ftext_frames(h, 0);
  const int32_t dim = fd_ftext_dim(h, 0);
  const int rc = fd_write_features(out, fd_ftext_data(h, 0), frames, dim);
  if (rc == 0)
    std::printf("wrote %s: %dx%d (utterance '%s' of %d)\n", out, frames, dim,
                fd_ftext_id(h, 0), fd_ftext_count(h));
  else
    std::fprintf(stderr, "error: cannot write %s\n", out);
  fd_ftext_free(h);
  return rc == 0 ? 0 : 2;
}

static int cmd_dump(const char* path, int32_t limit) {
  float* data = nullptr;
  int32_t frames = 0, dim = 0;
  if (fd_read_features(path, &data, &frames, &dim) != 0) {
    std::fprintf(stderr, "error: cannot read feature file %s\n", path);
    return 2;
  }
  if (limit <= 0 || limit > frames) limit = frames;
  for (int32_t r = 0; r < limit; ++r) {
    for (int32_t c = 0; c < dim; ++c)
      std::printf(c ? " %g" : "%g", data[int64_t(r) * dim + c]);
    std::printf("\n");
  }
  fd_buffer_free(data);
  return 0;
}

int main(int argc, char** argv) {
  if (argc >= 3 && !std::strcmp(argv[1], "info")) return cmd_info(argv[2]);
  if (argc >= 3 && !std::strcmp(argv[1], "finfo")) return cmd_finfo(argv[2]);
  if (argc >= 4 && !std::strcmp(argv[1], "text2bin")) return cmd_text2bin(argv[2], argv[3]);
  if (argc >= 3 && !std::strcmp(argv[1], "dump"))
    return cmd_dump(argv[2], argc >= 4 ? std::atoi(argv[3]) : 0);
  std::fprintf(stderr,
               "usage: fastdnn-io info MODEL.bin | finfo FEATS.bin | "
               "text2bin FEATS.txt OUT.bin | dump FEATS.bin [N]\n");
  return 1;
}
