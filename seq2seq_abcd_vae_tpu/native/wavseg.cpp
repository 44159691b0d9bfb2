// Native data-loading runtime: wav decoding + centered-batch assembly.
//
// The reference's data path is single-threaded Python that re-reads and
// re-decodes the whole wav for every segment
// (reference: ABCD-VAE/modules/data_utils.py:88-103, DataLoader
// :150-185).  This component decodes RIFF/WAVE PCM once and assembles
// padded, reflection-centered batch buffers with a thread pool, keeping
// the host side off the critical path while the TPU runs the previous
// step.  Exposed through a C ABI consumed via ctypes
// (seq2seq_abcd_vae_tpu/native/__init__.py); the pure-Python path remains
// as fallback.
//
// Only the formats the workload uses are supported: PCM 16-bit int and
// 32-bit float, any channel count.  Build: `make` in this directory.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <thread>
#include <vector>

extern "C" {

struct WavInfo {
  int32_t sample_rate;
  int32_t channels;
  int32_t bits_per_sample;
  int32_t format;        // 1 = PCM int, 3 = IEEE float
  int64_t num_frames;    // samples per channel
};

// Parse header only. Returns 0 on success, negative error code otherwise.
int wavseg_info(const char* path, WavInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0 ||
      fread(&riff_size, 4, 1, f) != 1 ||
      fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) {
    fclose(f);
    return -2;
  }
  bool have_fmt = false;
  int64_t data_bytes = -1;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (size < 16 || fread(buf, 1, 16, f) != 16) { fclose(f); return -3; }
      memcpy(&fmt, buf + 0, 2);
      memcpy(&channels, buf + 2, 2);
      memcpy(&rate, buf + 4, 4);
      memcpy(&bits, buf + 14, 2);
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      data_bytes = size;
      break;  // data chunk found; stop scanning
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (!have_fmt || data_bytes < 0 || channels == 0 || bits == 0) return -4;
  info->sample_rate = (int32_t)rate;
  info->channels = (int32_t)channels;
  info->bits_per_sample = (int32_t)bits;
  info->format = (int32_t)fmt;
  info->num_frames = data_bytes / (channels * (bits / 8));
  return 0;
}

// Decode one channel to float32 (int16 values kept as raw magnitudes, the
// reference's astype(float32) semantics — no normalization).
// out must hold num_frames floats. Returns 0 on success.
int wavseg_read(const char* path, int channel, float* out,
                int64_t capacity) {
  WavInfo info;
  int rc = wavseg_info(path, &info);
  if (rc != 0) return rc;
  if (info.num_frames > capacity) return -5;
  if (channel >= info.channels) return -6;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  // Re-scan to the data chunk.
  fseek(f, 12, SEEK_SET);
  int64_t data_off = -1;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (memcmp(id, "data", 4) == 0) {
      data_off = ftell(f);
      break;
    }
    fseek(f, size + (size & 1), SEEK_CUR);
  }
  if (data_off < 0) { fclose(f); return -4; }
  int bytes = info.bits_per_sample / 8;
  int64_t n = info.num_frames;
  std::vector<uint8_t> raw((size_t)(n * info.channels * bytes));
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    fclose(f);
    return -7;
  }
  fclose(f);
  if (info.format == 1 && bytes == 2) {
    const int16_t* p = (const int16_t*)raw.data();
    for (int64_t i = 0; i < n; ++i)
      out[i] = (float)p[i * info.channels + channel];
  } else if (info.format == 3 && bytes == 4) {
    const float* p = (const float*)raw.data();
    for (int64_t i = 0; i < n; ++i) out[i] = p[i * info.channels + channel];
  } else {
    return -8;
  }
  return 0;
}

// Extract one channel as raw int16 (PCM16 only). Keeping samples in
// int16 halves the host->device transfer; the device frontend casts to
// float32, which is exact for 16-bit data. Returns 0 on success.
int wavseg_read_i16(const char* path, int channel, int16_t* out,
                    int64_t capacity) {
  WavInfo info;
  int rc = wavseg_info(path, &info);
  if (rc != 0) return rc;
  if (info.format != 1 || info.bits_per_sample != 16) return -8;
  if (info.num_frames > capacity) return -5;
  if (channel >= info.channels) return -6;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 12, SEEK_SET);
  int64_t data_off = -1;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (memcmp(id, "data", 4) == 0) {
      data_off = ftell(f);
      break;
    }
    fseek(f, size + (size & 1), SEEK_CUR);
  }
  if (data_off < 0) { fclose(f); return -4; }
  int64_t n = info.num_frames;
  std::vector<int16_t> raw((size_t)(n * info.channels));
  if (fread(raw.data(), 2, raw.size(), f) != raw.size()) {
    fclose(f);
    return -7;
  }
  fclose(f);
  for (int64_t i = 0; i < n; ++i) out[i] = raw[i * info.channels + channel];
  return 0;
}

// Fill one centered row: out[0:pad]=reflect, out[pad:pad+len]=x,
// out[pad+len:2pad+len]=reflect, rest untouched (caller zero-fills).
static void fill_row(const float* wav, int64_t onset, int64_t offset,
                     int64_t pad, float* out) {
  int64_t len = offset - onset;
  const float* x = wav + onset;
  for (int64_t i = 0; i < pad; ++i) out[i] = x[pad - i];
  memcpy(out + pad, x, (size_t)len * sizeof(float));
  for (int64_t i = 0; i < pad; ++i) {
    int64_t src = len - 2 - i;
    out[pad + len + i] = (src >= 0) ? x[src] : 0.0f;
  }
}

static void fill_row_i16(const int16_t* wav, int64_t onset, int64_t offset,
                         int64_t pad, int16_t* out) {
  int64_t len = offset - onset;
  const int16_t* x = wav + onset;
  for (int64_t i = 0; i < pad; ++i) out[i] = x[pad - i];
  memcpy(out + pad, x, (size_t)len * sizeof(int16_t));
  for (int64_t i = 0; i < pad; ++i) {
    int64_t src = len - 2 - i;
    out[pad + len + i] = (src >= 0) ? x[src] : (int16_t)0;
  }
}

// int16 batch assembly (same layout as wavseg_assemble).
void wavseg_assemble_i16(const int16_t** wavs, const int64_t* onsets,
                         const int64_t* offsets, int32_t n_rows,
                         int64_t pad, int16_t* out, int64_t row_stride,
                         int32_t num_threads) {
  if (num_threads < 1) num_threads = 1;
  auto work = [&](int t) {
    for (int i = t; i < n_rows; i += num_threads) {
      int16_t* row = out + (int64_t)i * row_stride;
      if (pad > 0) {
        fill_row_i16(wavs[i], onsets[i], offsets[i], pad, row);
      } else {
        memcpy(row, wavs[i] + onsets[i],
               (size_t)(offsets[i] - onsets[i]) * sizeof(int16_t));
      }
    }
  };
  if (num_threads == 1 || n_rows < 2) {
    work(0);
    return;
  }
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(work, t);
  for (auto& th : threads) th.join();
}

// Assemble a centered batch from pre-decoded wavs, multithreaded by row.
// wavs: array of n_rows pointers to decoded channel data;
// onsets/offsets in samples; out is (n_rows, row_stride) float32,
// pre-zeroed by the caller. pad == 0 => plain copy (no centering).
void wavseg_assemble(const float** wavs, const int64_t* onsets,
                     const int64_t* offsets, int32_t n_rows, int64_t pad,
                     float* out, int64_t row_stride, int32_t num_threads) {
  if (num_threads < 1) num_threads = 1;
  auto work = [&](int t) {
    for (int i = t; i < n_rows; i += num_threads) {
      float* row = out + (int64_t)i * row_stride;
      if (pad > 0) {
        fill_row(wavs[i], onsets[i], offsets[i], pad, row);
      } else {
        memcpy(row, wavs[i] + onsets[i],
               (size_t)(offsets[i] - onsets[i]) * sizeof(float));
      }
    }
  };
  if (num_threads == 1 || n_rows < 2) {
    work(0);
    return;
  }
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(work, t);
  for (auto& th : threads) th.join();
}

}  // extern "C"
