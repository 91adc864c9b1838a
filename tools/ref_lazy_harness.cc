// Lazy-path golden generator: drives the UNMODIFIED reference engine's
// masked output scorer (CalculationContext::LazyOutputActivations,
// /root/reference/src/cpp/dnn.cc:355-392) frame by frame, exactly as the
// JNI bridge does (jni_dnn.cc:97-117), and dumps the per-frame posteriors.
//
// The reference CLI only exposes the dense path, so until this harness the
// lazy path had never been cross-engine gated against the actual compiled
// reference — only against this repo's own dense oracle.  This file is OUR
// test harness (no reference code copied); it links the reference sources
// verbatim, compiled by tools/compare_engines.py with dnn.cc's main renamed
// out of the way:
//
//   g++ -O2 -msse4 -std=c++11 -Dmain=ref_cli_main -c dnn.cc
//   g++ -O2 -msse4 -std=c++11 -o ref-lazy ref_lazy_harness.cc dnn.o float_dnn.cc
//
// Usage: ref-lazy model.bin feats.bin masks.bin out.txt
//   masks.bin: the reference's binary feature format {count, dim, floats}
//   (one row per frame, nonzero = senone active), written by
//   fastdnn_tpu.formats.binary.write_features.
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "dnn.h"
#include "float_dnn.h"

int main(int argc, char *argv[]) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s model.bin feats.bin masks.bin out.txt\n", argv[0]);
    return 2;
  }
  dnn::FloatDnn floatDnn(argv[1]);
  dnn::BatchData input(argv[2]);
  dnn::BatchData maskRows(argv[3]);
  dnn::QuantizedDnn qDnn(floatDnn, 3);

  const size_t frames = input.vector_count();
  const size_t out = qDnn.output_dimension();
  if (maskRows.vector_count() != frames || maskRows.dimension() != out) {
    std::fprintf(stderr, "mask matrix %zux%zu does not match %zu frames x %zu outputs\n",
                 maskRows.vector_count(), maskRows.dimension(), frames, out);
    return 3;
  }

  // the JNI lazy path's exact call sequence: one context for the utterance,
  // hidden trunk once, then one masked output call per frame
  dnn::CalculationContext context(&qDnn, frames, 8);
  context.CalculateUntilLastHiddenLayer(input);

  std::FILE *f = std::fopen(argv[4], "w");
  if (!f) {
    std::perror("fopen");
    return 4;
  }
  std::vector<char> mask(out);
  for (size_t i = 0; i < frames; ++i) {
    const float *row = maskRows.data() + i * out;
    for (size_t j = 0; j < out; ++j) mask[j] = row[j] != 0.0f ? 1 : 0;
    const float *post = context.LazyOutputActivations(i, mask.data());
    for (size_t j = 0; j < out; ++j)
      std::fprintf(f, "%.8f%c", post[j], j + 1 == out ? '\n' : ' ');
  }
  std::fclose(f);
  return 0;
}
