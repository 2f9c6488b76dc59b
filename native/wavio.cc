// Native data-loader core: threaded WAV decoding + batch assembly.
//
// The host-side hot path of corpus preprocessing (decode thousands of WAV
// files, convert PCM to float32, downmix, reflect-pad, pack into padded
// batches) runs here as a C++ thread pool instead of the Python loop the
// reference uses (reference: preprocess.py:31-55 does this one file at a
// time through librosa).  Exposed as a C ABI consumed via ctypes
// (tacotron2_tpu/data/native_loader.py).
//
// Supported WAV encodings: PCM 8/16/32-bit and IEEE float32, any channel
// count (downmixed to mono), arbitrary extra chunks.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;  // mono float32 in [-1, 1]
  int32_t sample_rate = 0;
  bool ok = false;
};

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

WavData decode_wav(const char* path) {
  WavData out;
  FILE* f = std::fopen(path, "rb");
  if (!f) return out;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (fsize < 44) {
    std::fclose(f);
    return out;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(fsize));
  if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    return out;
  }
  std::fclose(f);

  if (std::memcmp(buf.data(), "RIFF", 4) != 0 ||
      std::memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return out;

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;

  size_t pos = 12;
  while (pos + 8 <= buf.size()) {
    const uint8_t* hdr = buf.data() + pos;
    uint32_t chunk_len = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (pos + 8 + chunk_len > buf.size())
      chunk_len = static_cast<uint32_t>(buf.size() - pos - 8);
    if (std::memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16) {
      format = rd_u16(body);
      channels = rd_u16(body + 2);
      rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (format == 0xFFFE && chunk_len >= 40)  // WAVE_FORMAT_EXTENSIBLE
        format = rd_u16(body + 24);
    } else if (std::memcmp(hdr, "data", 4) == 0) {
      data = body;
      data_len = chunk_len;
    }
    pos += 8 + chunk_len + (chunk_len & 1);  // chunks are 2-byte aligned
  }
  if (!data || channels == 0 || rate == 0) return out;

  size_t frame_bytes = static_cast<size_t>(channels) * (bits / 8);
  if (frame_bytes == 0) return out;
  size_t n_frames = data_len / frame_bytes;
  out.samples.resize(n_frames);
  const float inv_ch = 1.0f / channels;

  if (format == 1 && bits == 16) {
    for (size_t i = 0; i < n_frames; ++i) {
      float acc = 0.0f;
      for (int c = 0; c < channels; ++c) {
        int16_t v;
        std::memcpy(&v, data + (i * channels + c) * 2, 2);
        acc += static_cast<float>(v) * (1.0f / 32768.0f);
      }
      out.samples[i] = acc * inv_ch;
    }
  } else if (format == 1 && bits == 32) {
    for (size_t i = 0; i < n_frames; ++i) {
      float acc = 0.0f;
      for (int c = 0; c < channels; ++c) {
        int32_t v;
        std::memcpy(&v, data + (i * channels + c) * 4, 4);
        acc += static_cast<float>(v) * (1.0f / 2147483648.0f);
      }
      out.samples[i] = acc * inv_ch;
    }
  } else if (format == 1 && bits == 8) {  // unsigned 8-bit
    for (size_t i = 0; i < n_frames; ++i) {
      float acc = 0.0f;
      for (int c = 0; c < channels; ++c) {
        uint8_t v = data[i * channels + c];
        acc += (static_cast<float>(v) - 128.0f) * (1.0f / 128.0f);
      }
      out.samples[i] = acc * inv_ch;
    }
  } else if (format == 3 && bits == 32) {  // IEEE float
    for (size_t i = 0; i < n_frames; ++i) {
      float acc = 0.0f;
      for (int c = 0; c < channels; ++c) {
        float v;
        std::memcpy(&v, data + (i * channels + c) * 4, 4);
        acc += v;
      }
      out.samples[i] = acc * inv_ch;
    }
  } else {
    return out;  // unsupported encoding
  }
  out.sample_rate = static_cast<int32_t>(rate);
  out.ok = true;
  return out;
}

}  // namespace

extern "C" {

// Decode one WAV into caller-provided buffer (max_samples capacity).
// Returns the mono sample count written, 0 on failure, or -needed when the
// buffer is too small (nothing written) so callers can retry exactly sized
// — truncation is never silent.
int64_t t2x_decode_wav(const char* path, float* out, int64_t max_samples,
                       int32_t* sample_rate) {
  WavData w = decode_wav(path);
  if (!w.ok) return 0;
  *sample_rate = w.sample_rate;
  int64_t n = static_cast<int64_t>(w.samples.size());
  if (n > max_samples) return -n;
  std::memcpy(out, w.samples.data(), static_cast<size_t>(n) * sizeof(float));
  return n;
}

// Threaded batch decode + reflect-pad + pack.
//
// paths:        n null-terminated strings, concatenated (offsets given)
// offsets:      n int64 byte offsets into `paths`
// out:          (n, total_len) float32, zero-initialized by caller
// lengths:      (n,) int64 — true sample counts (0 marks a failed file)
// rates:        (n,) int32 — file sample rates
// pad:          reflect padding added to both sides (librosa center=True)
// total_len:    row capacity; rows hold reflect-padded signals, zero tail
// n_threads:    worker threads (<=0: hardware concurrency)
void t2x_decode_batch(const char* paths, const int64_t* offsets, int64_t n,
                      float* out, int64_t* lengths, int32_t* rates,
                      int64_t pad, int64_t total_len, int32_t n_threads) {
  if (n_threads <= 0)
    n_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
  if (n_threads < 1) n_threads = 1;

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      const char* path = paths + offsets[i];
      WavData w = decode_wav(path);
      if (!w.ok) {
        lengths[i] = 0;
        rates[i] = 0;
        continue;
      }
      int64_t s = static_cast<int64_t>(w.samples.size());
      int64_t padded = s + 2 * pad;
      if (padded > total_len || s <= pad) {  // doesn't fit / too short
        lengths[i] = 0;
        rates[i] = w.sample_rate;
        continue;
      }
      float* row = out + i * total_len;
      // reflect-pad: row[pad + j] = x[j]; row[pad - 1 - j] = x[1 + j];
      // row[pad + s + j] = x[s - 2 - j]
      std::memcpy(row + pad, w.samples.data(),
                  static_cast<size_t>(s) * sizeof(float));
      for (int64_t j = 0; j < pad; ++j) {
        row[pad - 1 - j] = w.samples[static_cast<size_t>(1 + j)];
        row[pad + s + j] = w.samples[static_cast<size_t>(s - 2 - j)];
      }
      lengths[i] = s;
      rates[i] = w.sample_rate;
    }
  };

  std::vector<std::thread> threads;
  int32_t spawn = n_threads - 1;
  for (int32_t t = 0; t < spawn; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
}

}  // extern "C"
