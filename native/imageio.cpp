// Native PNG encoder for the present path.
//
// The reference presents through the Vulkan WSI (swapchain.rs:425-441); the
// rebuild's present is a host readback + PNG sink (SURVEY.md §2.9), which
// previously round-tripped through PIL. This is a dependency-free PNG
// writer (zlib for the IDAT deflate + crc32) exposed through a plain C ABI
// consumed via ctypes (utils/image_io.py), with the PIL fallback retained
// for platforms without the library.
//
// Build: make -C native  (produces libimageio.so)

#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xFF);
  out.push_back((v >> 16) & 0xFF);
  out.push_back((v >> 8) & 0xFF);
  out.push_back(v & 0xFF);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
  put_be32(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(4 + len));
  put_be32(out, crc);
}

}  // namespace

extern "C" {

// Encode [h, w, channels] uint8 (channels 3 = RGB, 4 = RGBA) into `out`.
// Returns the encoded byte count, or -1 when out_cap is too small / the
// input is invalid. Scanlines use filter type 1 ("Sub") — cheap and
// effective on rendered gradients.
int64_t encode_png(const uint8_t* data, int64_t h, int64_t w,
                   int64_t channels, uint8_t* out, int64_t out_cap) {
  if (h <= 0 || w <= 0 || (channels != 3 && channels != 4)) return -1;
  const int64_t stride = w * channels;

  // filtered scanlines: 1 filter byte + Sub-filtered pixels
  std::vector<uint8_t> raw(static_cast<size_t>(h) * (stride + 1));
  for (int64_t y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + y * (stride + 1);
    const uint8_t* src = data + y * stride;
    row[0] = 1;  // Sub filter
    for (int64_t x = 0; x < stride; ++x) {
      uint8_t left = (x >= channels) ? src[x - channels] : 0;
      row[1 + x] = static_cast<uint8_t>(src[x] - left);
    }
  }

  uLongf zcap = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> z(zcap);
  if (compress2(z.data(), &zcap, raw.data(), static_cast<uLong>(raw.size()),
                6) != Z_OK) {
    return -1;
  }

  std::vector<uint8_t> png;
  png.reserve(zcap + 1024);
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
  png.insert(png.end(), sig, sig + 8);

  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xFF; ihdr[1] = (w >> 16) & 0xFF;
  ihdr[2] = (w >> 8) & 0xFF;  ihdr[3] = w & 0xFF;
  ihdr[4] = (h >> 24) & 0xFF; ihdr[5] = (h >> 16) & 0xFF;
  ihdr[6] = (h >> 8) & 0xFF;  ihdr[7] = h & 0xFF;
  ihdr[8] = 8;                          // bit depth
  ihdr[9] = (channels == 4) ? 6 : 2;    // color type: RGBA / RGB
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", z.data(), zcap);
  put_chunk(png, "IEND", nullptr, 0);

  if (static_cast<int64_t>(png.size()) > out_cap) return -1;
  std::memcpy(out, png.data(), png.size());
  return static_cast<int64_t>(png.size());
}

// Decode new-style RLE Radiance (.hdr) scanlines into [h, w, 4] RGBE bytes.
// `data` points at the pixel stream (immediately after the text header and
// resolution line); semantics match resources/hdr.py's Python fallback
// (each scanline: a (2, 2, hi, lo) marker, then four run-length-encoded
// component planes; runs are n>128 repeats, else n literal bytes). The
// reference decodes .hdr natively through Rust's `image` crate — this keeps
// the rebuild's asset path native too (a 4k equirect is ~2k scanlines of
// Python loop otherwise). Returns the number of input bytes consumed, or
// -1 on malformed/truncated input.
int64_t decode_hdr_rle(const uint8_t* data, int64_t len, int64_t h,
                       int64_t w, uint8_t* out) {
  if (h <= 0 || w < 8 || w > 32767) return -1;
  int64_t p = 0;
  for (int64_t y = 0; y < h; ++y) {
    if (p + 4 > len || data[p] != 2 || data[p + 1] != 2 ||
        ((static_cast<int64_t>(data[p + 2]) << 8) | data[p + 3]) != w) {
      return -1;
    }
    p += 4;
    for (int c = 0; c < 4; ++c) {
      uint8_t* row = out + (y * w) * 4 + c;
      int64_t x = 0;
      while (x < w) {
        if (p >= len) return -1;
        int64_t n = data[p++];
        if (n > 128) {          // run of a repeated byte
          n -= 128;
          if (p >= len || x + n > w) return -1;
          uint8_t v = data[p++];
          for (int64_t i = 0; i < n; ++i) row[(x + i) * 4] = v;
        } else {                // literal dump of n bytes
          if (p + n > len || x + n > w) return -1;
          for (int64_t i = 0; i < n; ++i) row[(x + i) * 4] = data[p + i];
          p += n;
        }
        x += n;
      }
    }
  }
  return p;
}

}  // extern "C"
