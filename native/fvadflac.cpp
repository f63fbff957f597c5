// FLAC codec component for formula_vad_tpu's native I/O runtime.
//
// The reference accepts ANY container libsndfile decodes — FLAC included
// (reference src/audio_utils/AudioFileStream.zig:22-83 opens via sf_open,
// which sniffs the format). Until round 4 this repo decoded WAV + Ogg
// Vorbis only; this module closes the container-breadth gap for FLAC with
// the same posture as fvadogg.cpp: a native C++ driver over a system
// libFLAC loaded at runtime via dlopen, so the shared object builds and
// loads even on hosts without the codec (callers check
// fvad_flac_available()).
//
// No FLAC headers are installed in this image, so the public C API is
// declared here from the documented, decades-stable libFLAC ABI
// (include/FLAC/stream_decoder.h + format.h; layout unchanged since
// FLAC 1.x). The only struct layout declared for real is the LEADING
// fields of FLAC__FrameHeader that the write callback must read
// (blocksize/channels/bits/number) — everything else is opaque pointers.
//
// Library discovery: $FVAD_LIBFLAC (explicit path — the Python wrapper
// points it at any vendored copy it finds, e.g. pygame.libs ships
// libFLAC-*.so.8), then the standard sonames.
//
// Exposed C ABI (consumed by formula_vad_tpu/io_/flac.py via ctypes):
//   fvad_flac_abi_version / fvad_flac_available
//   decode: fvad_flac_open / rate / channels / total_frames /
//           read_planar / seek / close
//   encode: fvad_flac_encode_file  (float planar PCM -> FLAC, for tests
//           and round-trips; the reference itself never writes FLAC)

#include <dlfcn.h>
#include <stddef.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// libFLAC public ABI surface (declared locally; see file comment).
// ---------------------------------------------------------------------------

typedef void FLAC_Decoder;  // FLAC__StreamDecoder: fully opaque here
typedef void FLAC_Encoder;  // FLAC__StreamEncoder: fully opaque here

// FLAC__FrameHeader leading fields (format.h): we read blocksize, channels,
// bits_per_sample and the frame-number union; nothing past `number`.
struct flac_frame_header_head {
  uint32_t blocksize;
  uint32_t sample_rate;
  uint32_t channels;
  int32_t channel_assignment;  // enum
  uint32_t bits_per_sample;
  int32_t number_type;  // 0 = frame number, 1 = sample number
  union {
    uint32_t frame_number;
    uint64_t sample_number;
  } number;  // 8-aligned => offset 24
  // uint8_t crc follows; never accessed.
};

// FLAC__Frame starts with its header; subframes follow (never accessed).
struct flac_frame_head {
  flac_frame_header_head header;
};

typedef int (*flac_write_cb)(const FLAC_Decoder *, const flac_frame_head *,
                             const int32_t *const buffer[], void *client);
typedef void (*flac_metadata_cb)(const FLAC_Decoder *, const void *, void *);
typedef void (*flac_error_cb)(const FLAC_Decoder *, int status, void *client);

}  // extern "C"

namespace {

// Decoder write-status / state enums (format.h / stream_decoder.h).
constexpr int kWriteContinue = 0;  // FLAC__STREAM_DECODER_WRITE_STATUS_CONTINUE
constexpr int kInitOk = 0;         // FLAC__STREAM_DECODER_INIT_STATUS_OK
constexpr int kStateEndOfStream = 4;  // FLAC__STREAM_DECODER_END_OF_STREAM

struct Api {
  // decoder
  FLAC_Decoder *(*decoder_new)();
  void (*decoder_delete)(FLAC_Decoder *);
  int (*decoder_init_file)(FLAC_Decoder *, const char *, flac_write_cb,
                           flac_metadata_cb, flac_error_cb, void *);
  // Ogg-embedded FLAC (the 'OggS' + 0x7f"FLAC" mapping libsndfile also
  // accepts). Optional: null when the loaded libFLAC was built without
  // Ogg support.
  int (*decoder_init_ogg_file)(FLAC_Decoder *, const char *, flac_write_cb,
                               flac_metadata_cb, flac_error_cb, void *);
  int (*decoder_process_until_end_of_metadata)(FLAC_Decoder *);
  int (*decoder_process_single)(FLAC_Decoder *);
  int (*decoder_seek_absolute)(FLAC_Decoder *, uint64_t);
  int (*decoder_get_state)(const FLAC_Decoder *);
  int (*decoder_finish)(FLAC_Decoder *);
  unsigned (*decoder_get_channels)(const FLAC_Decoder *);
  unsigned (*decoder_get_sample_rate)(const FLAC_Decoder *);
  unsigned (*decoder_get_bits_per_sample)(const FLAC_Decoder *);
  uint64_t (*decoder_get_total_samples)(const FLAC_Decoder *);
  // encoder
  FLAC_Encoder *(*encoder_new)();
  void (*encoder_delete)(FLAC_Encoder *);
  int (*encoder_set_channels)(FLAC_Encoder *, unsigned);
  int (*encoder_set_bits_per_sample)(FLAC_Encoder *, unsigned);
  int (*encoder_set_sample_rate)(FLAC_Encoder *, unsigned);
  int (*encoder_set_compression_level)(FLAC_Encoder *, unsigned);
  int (*encoder_init_file)(FLAC_Encoder *, const char *, void *, void *);
  int (*encoder_init_ogg_file)(FLAC_Encoder *, const char *, void *, void *);
  int (*encoder_process_interleaved)(FLAC_Encoder *, const int32_t *, unsigned);
  int (*encoder_finish)(FLAC_Encoder *);
};

Api g_api;
bool g_loaded = false;
bool g_tried = false;
// Explicit library path supplied by the host (fvad_flac_set_libpath) —
// preferred over $FVAD_LIBFLAC so discovery does not have to mutate the
// process environment (which leaks into children; ADVICE r4).
char g_libpath[4096] = {0};

template <typename T>
bool sym(void *lib, const char *name, T *out) {
  *out = reinterpret_cast<T>(dlsym(lib, name));
  return *out != nullptr;
}

bool ensure_loaded() {
  if (g_tried) return g_loaded;
  g_tried = true;
  void *lib = nullptr;
  if (g_libpath[0]) lib = dlopen(g_libpath, RTLD_NOW | RTLD_LOCAL);
  const char *env = getenv("FVAD_LIBFLAC");
  if (!lib && env && env[0]) lib = dlopen(env, RTLD_NOW | RTLD_LOCAL);
  const char *names[] = {"libFLAC.so.12", "libFLAC.so.8", "libFLAC.so"};
  for (int i = 0; !lib && i < 3; ++i) lib = dlopen(names[i], RTLD_NOW | RTLD_LOCAL);
  if (!lib) return false;
  bool ok =
      sym(lib, "FLAC__stream_decoder_new", &g_api.decoder_new) &&
      sym(lib, "FLAC__stream_decoder_delete", &g_api.decoder_delete) &&
      sym(lib, "FLAC__stream_decoder_init_file", &g_api.decoder_init_file) &&
      sym(lib, "FLAC__stream_decoder_process_until_end_of_metadata",
          &g_api.decoder_process_until_end_of_metadata) &&
      sym(lib, "FLAC__stream_decoder_process_single",
          &g_api.decoder_process_single) &&
      sym(lib, "FLAC__stream_decoder_seek_absolute",
          &g_api.decoder_seek_absolute) &&
      sym(lib, "FLAC__stream_decoder_get_state", &g_api.decoder_get_state) &&
      sym(lib, "FLAC__stream_decoder_finish", &g_api.decoder_finish) &&
      sym(lib, "FLAC__stream_decoder_get_channels",
          &g_api.decoder_get_channels) &&
      sym(lib, "FLAC__stream_decoder_get_sample_rate",
          &g_api.decoder_get_sample_rate) &&
      sym(lib, "FLAC__stream_decoder_get_bits_per_sample",
          &g_api.decoder_get_bits_per_sample) &&
      sym(lib, "FLAC__stream_decoder_get_total_samples",
          &g_api.decoder_get_total_samples) &&
      sym(lib, "FLAC__stream_encoder_new", &g_api.encoder_new) &&
      sym(lib, "FLAC__stream_encoder_delete", &g_api.encoder_delete) &&
      sym(lib, "FLAC__stream_encoder_set_channels",
          &g_api.encoder_set_channels) &&
      sym(lib, "FLAC__stream_encoder_set_bits_per_sample",
          &g_api.encoder_set_bits_per_sample) &&
      sym(lib, "FLAC__stream_encoder_set_sample_rate",
          &g_api.encoder_set_sample_rate) &&
      sym(lib, "FLAC__stream_encoder_set_compression_level",
          &g_api.encoder_set_compression_level) &&
      sym(lib, "FLAC__stream_encoder_init_file", &g_api.encoder_init_file) &&
      sym(lib, "FLAC__stream_encoder_process_interleaved",
          &g_api.encoder_process_interleaved) &&
      sym(lib, "FLAC__stream_encoder_finish", &g_api.encoder_finish);
  if (!ok) {
    dlclose(lib);
    return false;
  }
  // Optional (Ogg-FLAC): absence just disables that container.
  sym(lib, "FLAC__stream_decoder_init_ogg_file", &g_api.decoder_init_ogg_file);
  sym(lib, "FLAC__stream_encoder_init_ogg_file", &g_api.encoder_init_ogg_file);
  g_loaded = true;
  return true;
}

struct Decoder {
  FLAC_Decoder *dec = nullptr;
  unsigned channels = 0;
  unsigned rate = 0;
  unsigned bits = 0;
  uint64_t total = 0;
  // Planar FIFO of decoded-but-undelivered samples, per channel.
  std::vector<std::vector<float>> pending;
  size_t pending_read = 0;   // consumed frames at the FIFO front
  bool seeking = false;      // next write_cb trims to seek_target
  uint64_t seek_target = 0;  // absolute sample the caller asked for
  bool error = false;

  size_t avail() const {
    return pending.empty() ? 0 : pending[0].size() - pending_read;
  }
};

int write_cb(const FLAC_Decoder *, const flac_frame_head *frame,
             const int32_t *const buffer[], void *client) {
  Decoder *d = static_cast<Decoder *>(client);
  const auto &h = frame->header;
  if (d->pending.size() != h.channels) d->pending.resize(h.channels);
  unsigned bits = h.bits_per_sample ? h.bits_per_sample : d->bits;
  if (bits < 4 || bits > 32) {  // unresolved/corrupt sample size
    d->error = true;
    return 1;  // FLAC__STREAM_DECODER_WRITE_STATUS_ABORT
  }
  const float scale = 1.0f / static_cast<float>(1u << (bits - 1));
  uint64_t skip = 0;
  if (d->seeking) {
    // seek_absolute delivers the frame CONTAINING the target; trim the
    // pre-target samples. libFLAC normalizes number_type to sample-number
    // in practice (fixed-blocksize frame numbers are converted using the
    // stream's fixed blocksize before the callback); the frame-number
    // fallback uses this frame's blocksize, exact except for a seek into
    // the final partial frame of a fixed-blocksize stream.
    uint64_t start = h.number_type == 1
                         ? h.number.sample_number
                         : static_cast<uint64_t>(h.number.frame_number) *
                               h.blocksize;
    if (d->seek_target > start) skip = d->seek_target - start;
    if (skip > h.blocksize) skip = h.blocksize;
    d->seeking = false;
  }
  for (unsigned c = 0; c < h.channels; ++c) {
    auto &q = d->pending[c];
    q.reserve(q.size() + h.blocksize - skip);
    for (uint32_t i = static_cast<uint32_t>(skip); i < h.blocksize; ++i)
      q.push_back(static_cast<float>(buffer[c][i]) * scale);
  }
  return kWriteContinue;
}

void error_cb(const FLAC_Decoder *, int, void *client) {
  static_cast<Decoder *>(client)->error = true;
}

}  // namespace

extern "C" {

int fvad_flac_abi_version() { return 3; }

// Must be called before the first open/available (i.e. before dlopen is
// attempted); a call after that is a silent no-op. NULL clears the path.
void fvad_flac_set_libpath(const char *path) {
  if (g_tried) return;
  if (path && path[0]) {
    strncpy(g_libpath, path, sizeof(g_libpath) - 1);
    g_libpath[sizeof(g_libpath) - 1] = '\0';
  } else {
    g_libpath[0] = '\0';
  }
}

int fvad_flac_available() { return ensure_loaded() ? 1 : 0; }

// use_ogg != 0 decodes the Ogg-FLAC container mapping (caller sniffs).
void *fvad_flac_open(const char *path, int use_ogg) {
  const bool dbg = getenv("FVAD_FLAC_DEBUG") != nullptr;
  if (!ensure_loaded()) return nullptr;
  if (use_ogg && !g_api.decoder_init_ogg_file) {
    if (dbg) fprintf(stderr, "fvadflac: libFLAC lacks Ogg support\n");
    return nullptr;
  }
  Decoder *d = new Decoder();
  d->dec = g_api.decoder_new();
  if (!d->dec) {
    delete d;
    return nullptr;
  }
  int init_rc = (use_ogg ? g_api.decoder_init_ogg_file
                         : g_api.decoder_init_file)(
      d->dec, path, write_cb, nullptr, error_cb, d);
  if (init_rc != kInitOk) {
    if (dbg) fprintf(stderr, "fvadflac: init_file rc=%d\n", init_rc);
    g_api.decoder_delete(d->dec);
    delete d;
    return nullptr;
  }
  // Decode metadata plus ONE audio frame: the get_channels/get_sample_rate/
  // get_bits accessors reflect the most recently decoded FRAME header (the
  // STREAMINFO block only feeds the metadata callback, which we skip). The
  // frame's samples stay in the FIFO and are delivered by the first read.
  if (!g_api.decoder_process_until_end_of_metadata(d->dec) ||
      !g_api.decoder_process_single(d->dec) || d->error) {
    if (dbg)
      fprintf(stderr, "fvadflac: metadata/first-frame fail (error=%d state=%d)\n",
              d->error, g_api.decoder_get_state(d->dec));
    g_api.decoder_finish(d->dec);
    g_api.decoder_delete(d->dec);
    delete d;
    return nullptr;
  }
  d->channels = g_api.decoder_get_channels(d->dec);
  d->rate = g_api.decoder_get_sample_rate(d->dec);
  d->bits = g_api.decoder_get_bits_per_sample(d->dec);
  d->total = g_api.decoder_get_total_samples(d->dec);
  if (d->channels == 0 || d->rate == 0 || d->bits < 4 || d->bits > 32) {
    if (dbg)
      fprintf(stderr, "fvadflac: bad streaminfo ch=%u rate=%u bits=%u\n",
              d->channels, d->rate, d->bits);
    g_api.decoder_finish(d->dec);
    g_api.decoder_delete(d->dec);
    delete d;
    return nullptr;
  }
  return d;
}

long fvad_flac_rate(void *h) { return static_cast<Decoder *>(h)->rate; }

int fvad_flac_channels(void *h) { return static_cast<Decoder *>(h)->channels; }

long long fvad_flac_total_frames(void *h) {
  Decoder *d = static_cast<Decoder *>(h);
  // 0 in STREAMINFO means "unknown" — report as error like the Ogg driver.
  return d->total ? static_cast<long long>(d->total) : -1;
}

// Decode up to max_frames into planar out[channels][max_frames].
// Returns frames produced (0 at EOF), or -1 on decode error.
long long fvad_flac_read_planar(void *h, float *out, long long max_frames) {
  Decoder *d = static_cast<Decoder *>(h);
  while (static_cast<long long>(d->avail()) < max_frames) {
    // On a mid-stream decode error, deliver the already-decoded frames in
    // the FIFO first and report -1 on the FOLLOWING call — libsndfile
    // (the reference's decoder) returns the valid prefix before erroring,
    // so a corrupt tail must not discard buffered good audio (ADVICE r4).
    if (d->error) break;
    if (g_api.decoder_get_state(d->dec) == kStateEndOfStream) break;
    if (!g_api.decoder_process_single(d->dec)) {
      d->error = true;
      break;
    }
  }
  if (d->error && d->avail() == 0) return -1;
  long long got = static_cast<long long>(d->avail());
  if (got > max_frames) got = max_frames;
  for (unsigned c = 0; c < d->channels; ++c) {
    long long n = 0;
    if (c < d->pending.size()) {
      const std::vector<float> &q = d->pending[c];
      long long have = static_cast<long long>(q.size()) -
                       static_cast<long long>(d->pending_read);
      n = got < have ? got : have;
      if (n > 0) memcpy(out + c * max_frames, q.data() + d->pending_read,
                        static_cast<size_t>(n) * sizeof(float));
    }
    if (n < 0) n = 0;
    if (n < got)  // defensive: a mid-stream channel-count change
      memset(out + c * max_frames + n, 0,
             static_cast<size_t>(got - n) * sizeof(float));
  }
  d->pending_read += static_cast<size_t>(got);
  // Compact once the FIFO front grows past 1 MB of consumed samples.
  if (d->pending_read > (1u << 18)) {
    for (auto &q : d->pending)
      q.erase(q.begin(),
              q.begin() + static_cast<ptrdiff_t>(
                              d->pending_read < q.size() ? d->pending_read
                                                         : q.size()));
    d->pending_read = 0;
  }
  return got;
}

int fvad_flac_seek(void *h, long long frame) {
  Decoder *d = static_cast<Decoder *>(h);
  d->pending.clear();
  d->pending_read = 0;
  d->error = false;
  d->seeking = true;
  d->seek_target = static_cast<uint64_t>(frame);
  if (!g_api.decoder_seek_absolute(d->dec, d->seek_target)) {
    d->seeking = false;
    return -1;
  }
  d->seeking = false;  // write_cb consumed it (or target is at a boundary)
  return 0;
}

void fvad_flac_close(void *h) {
  Decoder *d = static_cast<Decoder *>(h);
  if (d->dec) {
    g_api.decoder_finish(d->dec);
    g_api.decoder_delete(d->dec);
  }
  delete d;
}

// Encode float planar PCM -> FLAC (16- or 24-bit). Mainly for tests and
// round-trips; the reference never writes FLAC. Returns 0 on success.
// use_ogg != 0 writes the Ogg-FLAC container (round-trip tests).
int fvad_flac_encode_file(const char *path, const float *planar,
                          int n_channels, long long n_frames, long rate,
                          int bits, int use_ogg) {
  if (!ensure_loaded()) return -1;
  if (bits != 16 && bits != 24) return -2;
  if (use_ogg && !g_api.encoder_init_ogg_file) return -8;
  FLAC_Encoder *enc = g_api.encoder_new();
  if (!enc) return -3;
  int rc = 0;
  if (!g_api.encoder_set_channels(enc, static_cast<unsigned>(n_channels)) ||
      !g_api.encoder_set_bits_per_sample(enc, static_cast<unsigned>(bits)) ||
      !g_api.encoder_set_sample_rate(enc, static_cast<unsigned>(rate)) ||
      !g_api.encoder_set_compression_level(enc, 5))
    rc = -4;
  if (rc == 0 &&
      (use_ogg ? g_api.encoder_init_ogg_file
               : g_api.encoder_init_file)(enc, path, nullptr, nullptr) !=
          kInitOk)
    rc = -5;
  if (rc == 0) {
    const double scale = static_cast<double>(1u << (bits - 1));
    const double lo = -scale, hi = scale - 1.0;
    const long long kChunk = 65536;
    std::vector<int32_t> buf(static_cast<size_t>(kChunk) * n_channels);
    for (long long at = 0; at < n_frames && rc == 0; at += kChunk) {
      long long n = n_frames - at < kChunk ? n_frames - at : kChunk;
      for (long long i = 0; i < n; ++i)
        for (int c = 0; c < n_channels; ++c) {
          double v = static_cast<double>(planar[c * n_frames + at + i]) * scale;
          if (v < lo) v = lo;
          if (v > hi) v = hi;
          buf[static_cast<size_t>(i) * n_channels + c] =
              static_cast<int32_t>(v >= 0 ? v + 0.5 : v - 0.5);
        }
      if (!g_api.encoder_process_interleaved(enc, buf.data(),
                                             static_cast<unsigned>(n)))
        rc = -6;
    }
  }
  if (!g_api.encoder_finish(enc) && rc == 0) rc = -7;
  g_api.encoder_delete(enc);
  return rc;
}

}  // extern "C"
