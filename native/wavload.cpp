// Native int16-PCM RIFF/WAVE reader for the data loader.
//
// The reference hides wav decode behind torch DataLoader worker
// *processes* (src/train.py:125-129, num_workers=16); this framework
// uses a thread pool (data/dataset.py _assemble_batch), so the decode
// path must not hold the Python GIL — ctypes releases it around this
// call, and the whole header-parse + fread runs native.  Python-side
// binding: adyolo_tpu/data/io.py (scipy fallback kept as the oracle and
// for non-PCM16 files).
//
// Build: g++ -O2 -shared -fPIC -o libwavload.so wavload.cpp
#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

struct WavMeta {
  long data_off = -1;   // byte offset of the sample data
  long data_len = 0;    // bytes of sample data
  int channels = 0;
  int sample_rate = 0;
  int bits = 0;
  int format = 0;       // 1 = PCM
};

// Parse the RIFF chunk list; returns 0 on success, negative error code.
int parse(FILE* f, WavMeta* m) {
  unsigned char hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return -2;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
    return -3;
  unsigned char ch[8];
  while (fread(ch, 1, 8, f) == 8) {
    uint32_t sz = (uint32_t)ch[4] | ((uint32_t)ch[5] << 8) |
                  ((uint32_t)ch[6] << 16) | ((uint32_t)ch[7] << 24);
    if (memcmp(ch, "fmt ", 4) == 0) {
      unsigned char fmt[16];
      if (sz < 16 || fread(fmt, 1, 16, f) != 16) return -4;
      m->format = fmt[0] | (fmt[1] << 8);
      m->channels = fmt[2] | (fmt[3] << 8);
      m->sample_rate = (uint32_t)fmt[4] | ((uint32_t)fmt[5] << 8) |
                       ((uint32_t)fmt[6] << 16) | ((uint32_t)fmt[7] << 24);
      m->bits = fmt[14] | (fmt[15] << 8);
      if (fseek(f, (long)sz - 16 + (sz & 1), SEEK_CUR) != 0) return -5;
    } else if (memcmp(ch, "data", 4) == 0) {
      m->data_off = ftell(f);
      m->data_len = (long)sz;
      return 0;  // fmt always precedes data in DCASE/scipy files
    } else {
      if (fseek(f, (long)sz + (sz & 1), SEEK_CUR) != 0) return -5;
    }
  }
  return -6;  // no data chunk
}

}  // namespace

extern "C" {

// Returns n_frames (>= 0) and fills *n_ch / *sr, or a negative error:
//   -1 open failed, -2/-3 not a RIFF/WAVE, -4/-5/-6 malformed,
//   -7 not 16-bit PCM.
long wav_info_i16(const char* path, int* n_ch, int* sr) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavMeta m;
  int rc = parse(f, &m);
  fclose(f);
  if (rc != 0) return rc;
  if (m.format != 1 || m.bits != 16 || m.channels <= 0) return -7;
  *n_ch = m.channels;
  *sr = m.sample_rate;
  return m.data_len / (2L * m.channels);
}

// Reads exactly frames*n_ch int16 samples into out (interleaved, i.e.
// row-major (frames, channels) — the layout scipy returns).  Returns 0
// on success or a negative error (-8 short read / shape mismatch).
int wav_read_i16(const char* path, int16_t* out, long frames, int n_ch) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavMeta m;
  int rc = parse(f, &m);
  if (rc != 0) { fclose(f); return rc; }
  if (m.format != 1 || m.bits != 16 || m.channels != n_ch ||
      m.data_len / (2L * n_ch) != frames) {
    fclose(f);
    return -8;
  }
  size_t want = (size_t)frames * n_ch;
  size_t got = fread(out, 2, want, f);
  fclose(f);
  return got == want ? 0 : -8;
}

}  // extern "C"
