// Ogg Vorbis codec component for formula_vad_tpu's native I/O runtime.
//
// The reference links the *system* codec library (libsndfile) for its
// WAV/OGG paths (reference build.zig:185-189; AudioBuffer.zig:61-116 writes
// OGG Vorbis VBR, AudioFileStream.zig decodes any libsndfile format). This
// module is the TPU-framework equivalent: a native C++ driver over the
// system Xiph libraries (libvorbisfile / libvorbisenc / libvorbis / libogg),
// loaded with dlopen so the shared object builds and loads even on hosts
// without the codec installed (callers check fvad_ogg_available()).
//
// No Xiph headers are installed in this image, so the public C API is
// declared here from the documented, decades-stable Vorbis/Ogg ABI. To be
// robust we treat every caller-allocated library struct as an oversized
// opaque blob: the library reads/writes those structs through its own
// (correct) layout, and this code never touches their internals. The only
// layouts declared for real are `ogg_page` (four fields, frozen since 2000)
// and the leading {version, channels, rate} of `vorbis_info` that decode
// reads back.
//
// Exposed C ABI (consumed by formula_vad_tpu/io_/ogg.py via ctypes):
//   fvad_ogg_abi_version / fvad_ogg_available
//   decode: fvad_ogg_open / rate / channels / total_frames /
//           read_planar / seek / close
//   encode: fvad_ogg_encode_file  (float planar PCM -> Ogg Vorbis VBR)

#include <dlfcn.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Xiph public ABI surface (declared locally; see file comment).
// ---------------------------------------------------------------------------

typedef int64_t ogg_int64_t;

// ogg_page: public layout (libogg ogg.h) — we must read these four fields to
// write the byte stream to disk.
struct ogg_page_abi {
  unsigned char *header;
  long header_len;
  unsigned char *body;
  long body_len;
};

// vorbis_info: we only read the leading fields after ov_info().
struct vorbis_info_head {
  int version;
  int channels;
  long rate;
  // ... bitrate fields + codec_setup follow; never accessed here.
};

// Generously-sized opaque blobs for caller-allocated library structs.
// Real sizes on LP64 are: vorbis_info ~48 B, vorbis_comment ~32 B,
// vorbis_dsp_state ~160 B, vorbis_block ~200 B, ogg_stream_state ~408 B,
// ogg_packet ~40 B, OggVorbis_File ~944 B. Tail padding is harmless: the
// library only dereferences the fields it knows.
struct blob256 { unsigned char b[256]; };
struct blob512 { unsigned char b[512]; };
struct blob1k  { unsigned char b[1024]; };
struct blob2k  { unsigned char b[2048]; };
struct blob4k  { unsigned char b[4096]; };

}  // extern "C"

namespace {

// --- dlsym'd entry points ---------------------------------------------------
// vorbisfile (decode)
int (*p_ov_fopen)(const char *, void *);
void *(*p_ov_info)(void *, int);
ogg_int64_t (*p_ov_pcm_total)(void *, int);
long (*p_ov_read_float)(void *, float ***, int, int *);
int (*p_ov_pcm_seek)(void *, ogg_int64_t);
int (*p_ov_clear)(void *);
// libvorbis + libvorbisenc (encode)
void (*p_vorbis_info_init)(void *);
int (*p_vorbis_encode_init_vbr)(void *, long, long, float);
void (*p_vorbis_comment_init)(void *);
void (*p_vorbis_comment_add_tag)(void *, const char *, const char *);
int (*p_vorbis_analysis_init)(void *, void *);
int (*p_vorbis_block_init)(void *, void *);
int (*p_vorbis_analysis_headerout)(void *, void *, void *, void *, void *);
float **(*p_vorbis_analysis_buffer)(void *, int);
int (*p_vorbis_analysis_wrote)(void *, int);
int (*p_vorbis_analysis_blockout)(void *, void *);
int (*p_vorbis_analysis)(void *, void *);
int (*p_vorbis_bitrate_addblock)(void *);
int (*p_vorbis_bitrate_flushpacket)(void *, void *);
int (*p_vorbis_block_clear)(void *);
void (*p_vorbis_dsp_clear)(void *);
void (*p_vorbis_comment_clear)(void *);
void (*p_vorbis_info_clear)(void *);
// libogg (paging)
int (*p_ogg_stream_init)(void *, int);
int (*p_ogg_stream_packetin)(void *, void *);
int (*p_ogg_stream_pageout)(void *, void *);
int (*p_ogg_stream_flush)(void *, void *);
int (*p_ogg_page_eos)(const void *);
int (*p_ogg_stream_clear)(void *);

int g_loaded = 0;  // 0 = not tried, 1 = ok, -1 = unavailable

void *try_dlopen(const char *const *names) {
  for (const char *const *n = names; *n; ++n) {
    void *h = dlopen(*n, RTLD_NOW | RTLD_GLOBAL);
    if (h) return h;
  }
  return nullptr;
}

template <typename T>
bool sym(void *lib, T &fn, const char *name) {
  fn = reinterpret_cast<T>(dlsym(lib, name));
  return fn != nullptr;
}

bool ensure_loaded() {
  if (g_loaded) return g_loaded > 0;
  g_loaded = -1;

  static const char *ogg_names[] = {"libogg.so.0", "libogg.so", nullptr};
  static const char *vorbis_names[] = {"libvorbis.so.0", "libvorbis.so", nullptr};
  static const char *enc_names[] = {"libvorbisenc.so.2", "libvorbisenc.so", nullptr};
  static const char *file_names[] = {"libvorbisfile.so.3", "libvorbisfile.so", nullptr};

  void *logg = try_dlopen(ogg_names);
  void *lvor = try_dlopen(vorbis_names);
  void *lenc = try_dlopen(enc_names);
  void *lfil = try_dlopen(file_names);
  if (!logg || !lvor || !lenc || !lfil) return false;

  bool ok = sym(lfil, p_ov_fopen, "ov_fopen") &&
            sym(lfil, p_ov_info, "ov_info") &&
            sym(lfil, p_ov_pcm_total, "ov_pcm_total") &&
            sym(lfil, p_ov_read_float, "ov_read_float") &&
            sym(lfil, p_ov_pcm_seek, "ov_pcm_seek") &&
            sym(lfil, p_ov_clear, "ov_clear") &&
            sym(lvor, p_vorbis_info_init, "vorbis_info_init") &&
            sym(lenc, p_vorbis_encode_init_vbr, "vorbis_encode_init_vbr") &&
            sym(lvor, p_vorbis_comment_init, "vorbis_comment_init") &&
            sym(lvor, p_vorbis_comment_add_tag, "vorbis_comment_add_tag") &&
            sym(lvor, p_vorbis_analysis_init, "vorbis_analysis_init") &&
            sym(lvor, p_vorbis_block_init, "vorbis_block_init") &&
            sym(lvor, p_vorbis_analysis_headerout, "vorbis_analysis_headerout") &&
            sym(lvor, p_vorbis_analysis_buffer, "vorbis_analysis_buffer") &&
            sym(lvor, p_vorbis_analysis_wrote, "vorbis_analysis_wrote") &&
            sym(lvor, p_vorbis_analysis_blockout, "vorbis_analysis_blockout") &&
            sym(lvor, p_vorbis_analysis, "vorbis_analysis") &&
            sym(lvor, p_vorbis_bitrate_addblock, "vorbis_bitrate_addblock") &&
            sym(lvor, p_vorbis_bitrate_flushpacket, "vorbis_bitrate_flushpacket") &&
            sym(lvor, p_vorbis_block_clear, "vorbis_block_clear") &&
            sym(lvor, p_vorbis_dsp_clear, "vorbis_dsp_clear") &&
            sym(lvor, p_vorbis_comment_clear, "vorbis_comment_clear") &&
            sym(lvor, p_vorbis_info_clear, "vorbis_info_clear") &&
            sym(logg, p_ogg_stream_init, "ogg_stream_init") &&
            sym(logg, p_ogg_stream_packetin, "ogg_stream_packetin") &&
            sym(logg, p_ogg_stream_pageout, "ogg_stream_pageout") &&
            sym(logg, p_ogg_stream_flush, "ogg_stream_flush") &&
            sym(logg, p_ogg_page_eos, "ogg_page_eos") &&
            sym(logg, p_ogg_stream_clear, "ogg_stream_clear");
  if (!ok) return false;
  g_loaded = 1;
  return true;
}

struct Decoder {
  blob2k vf;  // OggVorbis_File
  int channels;
  long rate;
  ogg_int64_t total;
};

constexpr long OV_HOLE = -3;

bool write_page(FILE *f, const ogg_page_abi *og) {
  return fwrite(og->header, 1, (size_t)og->header_len, f) == (size_t)og->header_len &&
         fwrite(og->body, 1, (size_t)og->body_len, f) == (size_t)og->body_len;
}

}  // namespace

extern "C" {

int fvad_ogg_abi_version() { return 1; }

int fvad_ogg_available() { return ensure_loaded() ? 1 : 0; }

void *fvad_ogg_open(const char *path) {
  if (!ensure_loaded()) return nullptr;
  Decoder *d = new Decoder();
  memset(&d->vf, 0, sizeof(d->vf));
  if (p_ov_fopen(path, &d->vf) != 0) {
    delete d;
    return nullptr;
  }
  const vorbis_info_head *vi =
      static_cast<const vorbis_info_head *>(p_ov_info(&d->vf, -1));
  if (!vi || vi->channels <= 0 || vi->rate <= 0) {
    p_ov_clear(&d->vf);
    delete d;
    return nullptr;
  }
  d->channels = vi->channels;
  d->rate = vi->rate;
  d->total = p_ov_pcm_total(&d->vf, -1);  // -1 on unseekable; caller handles
  return d;
}

long fvad_ogg_rate(void *h) { return static_cast<Decoder *>(h)->rate; }
int fvad_ogg_channels(void *h) { return static_cast<Decoder *>(h)->channels; }
long long fvad_ogg_total_frames(void *h) {
  return (long long)static_cast<Decoder *>(h)->total;
}

// Fill `out` (planar, per-channel stride = max_frames floats) with up to
// max_frames decoded frames; returns frames written (0 at EOF, <0 on error).
// Chained streams whose channel count or rate changes at a link boundary
// stop at the boundary (treated as EOF) — reading a different channel
// layout into the caller's planar buffer would be out of bounds.
long long fvad_ogg_read_planar(void *h, float *out, long long max_frames) {
  Decoder *d = static_cast<Decoder *>(h);
  long long done = 0;
  while (done < max_frames) {
    float **pcm = nullptr;
    int bitstream = 0;
    int want = (int)std::min<long long>(max_frames - done, 4096);
    long r = p_ov_read_float(&d->vf, &pcm, want, &bitstream);
    if (r == OV_HOLE) continue;  // corrupt/missing page: resync and keep going
    if (r == 0) break;           // EOF
    if (r < 0) return done > 0 ? done : (long long)r;
    const vorbis_info_head *vi =
        static_cast<const vorbis_info_head *>(p_ov_info(&d->vf, -1));
    if (!vi || vi->channels != d->channels || vi->rate != d->rate) break;
    for (int c = 0; c < d->channels; ++c)
      memcpy(out + (long long)c * max_frames + done, pcm[c], (size_t)r * 4);
    done += r;
  }
  return done;
}

int fvad_ogg_seek(void *h, long long frame) {
  Decoder *d = static_cast<Decoder *>(h);
  return p_ov_pcm_seek(&d->vf, (ogg_int64_t)frame);
}

void fvad_ogg_close(void *h) {
  Decoder *d = static_cast<Decoder *>(h);
  p_ov_clear(&d->vf);
  delete d;
}

// Encode planar float PCM ([n_channels][n_frames], per-channel stride =
// n_frames) to an Ogg Vorbis VBR file. base_quality follows
// vorbis_encode_init_vbr: [-0.1, 1.0]; libsndfile (the reference's path)
// passes its 0..1 quality knob straight through, so quality=1.0 reproduces
// the reference simulator's clip encoding (SimulationInstance.zig:62).
int fvad_ogg_encode_file(const char *path, const float *planar, int n_channels,
                         long long n_frames, long rate, float base_quality) {
  if (!ensure_loaded()) return -1;
  if (n_channels <= 0 || n_frames < 0 || rate <= 0) return -2;

  blob256 vi_b, vc_b;
  blob1k vd_b, vb_b;
  blob2k os_b;
  memset(&vi_b, 0, sizeof(vi_b));
  memset(&vc_b, 0, sizeof(vc_b));
  memset(&vd_b, 0, sizeof(vd_b));
  memset(&vb_b, 0, sizeof(vb_b));
  memset(&os_b, 0, sizeof(os_b));
  void *vi = &vi_b, *vc = &vc_b, *vd = &vd_b, *vb = &vb_b, *os = &os_b;

  p_vorbis_info_init(vi);
  if (p_vorbis_encode_init_vbr(vi, n_channels, rate, base_quality) != 0) {
    p_vorbis_info_clear(vi);
    return -3;
  }
  p_vorbis_comment_init(vc);
  p_vorbis_comment_add_tag(vc, "ENCODER", "formula_vad_tpu");
  p_vorbis_analysis_init(vd, vi);
  p_vorbis_block_init(vd, vb);

  static int serial_counter = 0x46564144;  // "FVAD"; deterministic across runs
  p_ogg_stream_init(os, serial_counter++);

  FILE *f = fopen(path, "wb");
  int rc = 0;
  if (!f) {
    rc = -4;
  } else {
    blob256 h1, h2, h3;
    memset(&h1, 0, sizeof(h1));
    memset(&h2, 0, sizeof(h2));
    memset(&h3, 0, sizeof(h3));
    p_vorbis_analysis_headerout(vd, vc, &h1, &h2, &h3);
    p_ogg_stream_packetin(os, &h1);
    p_ogg_stream_packetin(os, &h2);
    p_ogg_stream_packetin(os, &h3);
    ogg_page_abi og;
    // Headers must land on their own pages before audio data.
    while (rc == 0 && p_ogg_stream_flush(os, &og) != 0)
      if (!write_page(f, &og)) rc = -5;

    long long pos = 0;
    int eos = 0;
    while (rc == 0 && !eos) {
      long long n = std::min<long long>(n_frames - pos, 4096);
      if (n > 0) {
        float **buf = p_vorbis_analysis_buffer(vd, (int)n);
        for (int c = 0; c < n_channels; ++c)
          memcpy(buf[c], planar + (long long)c * n_frames + pos, (size_t)n * 4);
        p_vorbis_analysis_wrote(vd, (int)n);
        pos += n;
      } else {
        p_vorbis_analysis_wrote(vd, 0);  // end of stream marker
      }
      while (rc == 0 && p_vorbis_analysis_blockout(vd, vb) == 1) {
        p_vorbis_analysis(vb, nullptr);
        p_vorbis_bitrate_addblock(vb);
        blob256 op;
        memset(&op, 0, sizeof(op));
        while (rc == 0 && p_vorbis_bitrate_flushpacket(vd, &op) == 1) {
          p_ogg_stream_packetin(os, &op);
          while (rc == 0 && !eos && p_ogg_stream_pageout(os, &og) != 0) {
            if (!write_page(f, &og)) rc = -5;
            if (p_ogg_page_eos(&og)) eos = 1;
          }
        }
      }
    }
    if (fclose(f) != 0 && rc == 0) rc = -5;
  }

  p_ogg_stream_clear(os);
  p_vorbis_block_clear(vb);
  p_vorbis_dsp_clear(vd);
  p_vorbis_comment_clear(vc);
  p_vorbis_info_clear(vi);
  return rc;
}

}  // extern "C"
