// AddressSanitizer/UBSan harness for the native host runtime
// (SURVEY.md §5.2: the reference has no sanitizers anywhere; this repo
// keeps ASan on its C++ shims). Exercises every public entry point —
// whole-file decode, streaming decode, MP3 encode, the swr oracle — plus
// the error paths, under -fsanitize=address,undefined. Exit 0 = clean.
//
// Built by the nodey_host_asan_check CMake target (EXCLUDE_FROM_ALL) and
// run by tests/test_native_sanitize.py.

#include "nodey_host.h"

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#define CHECK(cond)                                               \
  do {                                                            \
    if (!(cond)) {                                                \
      std::fprintf(stderr, "CHECK failed at %s:%d: %s\n",         \
                   __FILE__, __LINE__, #cond);                    \
      return 1;                                                   \
    }                                                             \
  } while (0)

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: asan_check <in.wav> <out.mp3>\n");
    return 2;
  }
  const char* wav = argv[1];
  const char* mp3 = argv[2];
  char err[512];

  // Whole-file decode.
  na_decoded dec{};
  CHECK(na_decode_file(wav, &dec, err, sizeof(err)) == 0);
  CHECK(dec.sample_rate > 0 && dec.channels > 0 && dec.num_samples > 0);
  CHECK(dec.data != nullptr);

  // Streaming decode: concatenated reads must reproduce the same count.
  na_decoded info{};
  na_decoder* sd = na_decoder_open(wav, &info, err, sizeof(err));
  CHECK(sd != nullptr);
  CHECK(info.sample_rate == dec.sample_rate);
  int64_t total = 0;
  std::vector<float> buf(static_cast<size_t>(4096) * info.channels);
  for (;;) {
    int64_t n = na_decoder_read(sd, buf.data(), 4096);
    CHECK(n >= 0);
    if (n == 0) break;
    total += n;
  }
  na_decoder_close(sd);
  CHECK(total == dec.num_samples);

  // MP3 encode through both sample APIs.
  na_mp3* enc = na_mp3_open(mp3, dec.sample_rate, dec.channels, 192, 48000,
                            err, sizeof(err));
  CHECK(enc != nullptr);
  const int64_t half = dec.num_samples / 2;
  CHECK(na_mp3_write_flt(enc, dec.data, half) == 0);
  std::vector<int16_t> ints(static_cast<size_t>(dec.num_samples - half) *
                            dec.channels);
  const float* tail = dec.data + half * dec.channels;
  for (size_t i = 0; i < ints.size(); ++i) {
    float v = tail[i] * 32768.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    ints[i] = static_cast<int16_t>(v);
  }
  CHECK(na_mp3_write_s16(enc, ints.data(), dec.num_samples - half) == 0);
  CHECK(na_mp3_close(enc) == 0);

  // swr oracle: full drain into a library-allocated buffer.
  float* swr_out = nullptr;
  int64_t got = na_swr_convert_full(dec.data, dec.num_samples,
                                    dec.sample_rate, dec.channels, 48000, 2,
                                    &swr_out, err, sizeof(err));
  CHECK(got > 0 && swr_out != nullptr);
  na_free_buffer(swr_out);

  na_free_decoded(&dec);

  // Error paths must fail cleanly (no leaks/overflows under ASan).
  na_decoded bad{};
  CHECK(na_decode_file("/nonexistent/file.wav", &bad, err, sizeof(err)) != 0);
  CHECK(na_decoder_open("/nonexistent/file.wav", &bad, err, sizeof(err)) ==
        nullptr);
  CHECK(na_mp3_open("/nonexistent/dir/x.mp3", 48000, 2, 192, 48000, err,
                    sizeof(err)) == nullptr);
  CHECK(na_mp3_open(mp3, 48000, 7, 192, 48000, err, sizeof(err)) == nullptr);

  std::puts("asan_check OK");
  return 0;
}
