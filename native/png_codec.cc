// Minimal PNG codec: zlib inflate/deflate + scanline (de)filtering.
//
// Replaces the reference's OpenCV image IO (cv::imread in
// src/sg-slam/Examples/rgbd_tum.cc:111-125) for the native dataset loader.
// Only the PNG subset used by RGB-D datasets is implemented; everything
// else returns an error so callers can fall back to the Python path.

#include "png_codec.h"

#include <zlib.h>

#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int channels_of(int color_type) {
  switch (color_type) {
    case 0: return 1;  // gray
    case 2: return 3;  // rgb
    case 4: return 2;  // gray+alpha
    case 6: return 4;  // rgba
    default: return 0; // palette unsupported
  }
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = std::fopen(path, "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n > 0) {
    buf.resize(size_t(n));
    if (std::fread(buf.data(), 1, size_t(n), f) != size_t(n)) buf.clear();
  }
  std::fclose(f);
  return buf;
}

struct Header {
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = 0, channels = 0;
};

// Walk chunks; fill header; append IDAT payloads to `idat` if non-null.
int parse(const uint8_t* buf, size_t len, Header* hd,
          std::vector<uint8_t>* idat) {
  if (len < 8 + 25 || std::memcmp(buf, kSig, 8) != 0) return 1;
  size_t off = 8;
  bool saw_ihdr = false;
  while (off + 12 <= len) {
    uint32_t clen = be32(buf + off);
    const uint8_t* type = buf + off + 4;
    const uint8_t* data = buf + off + 8;
    if (off + 12 + clen > len) return 2;
    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (clen < 13) return 3;
      hd->w = be32(data);
      hd->h = be32(data + 4);
      hd->bit_depth = data[8];
      hd->color_type = data[9];
      int interlace = data[12];
      hd->channels = channels_of(hd->color_type);
      if (hd->channels == 0 || interlace != 0) return 4;
      if (hd->bit_depth != 8 && hd->bit_depth != 16) return 5;
      saw_ihdr = true;
      if (!idat) return 0;  // info-only
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      if (!saw_ihdr) return 6;
      idat->insert(idat->end(), data, data + clen);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    off += 12 + clen;
  }
  return saw_ihdr ? 0 : 7;
}

}  // namespace

extern "C" {

int png_info(const char* path, int* width, int* height, int* channels,
             int* bit_depth) {
  std::vector<uint8_t> buf = read_file(path);
  if (buf.empty()) return 10;
  Header hd;
  int rc = parse(buf.data(), buf.size(), &hd, nullptr);
  if (rc) return rc;
  *width = int(hd.w);
  *height = int(hd.h);
  *channels = hd.channels;
  *bit_depth = hd.bit_depth;
  return 0;
}

int png_decode_mem(const uint8_t* buf, size_t len, uint8_t* out,
                   size_t out_cap, int* width, int* height, int* channels,
                   int* bit_depth) {
  Header hd;
  std::vector<uint8_t> idat;
  int rc = parse(buf, len, &hd, &idat);
  if (rc) return rc;
  const size_t bytes = size_t(hd.bit_depth) / 8;
  const size_t bpp = size_t(hd.channels) * bytes;      // bytes per pixel
  const size_t stride = size_t(hd.w) * bpp;            // filtered row payload
  const size_t raw_size = size_t(hd.h) * (stride + 1);
  const size_t out_size = size_t(hd.h) * stride;
  if (out_cap < out_size) return 11;

  std::vector<uint8_t> raw(raw_size);
  uLongf dst = raw_size;
  if (uncompress(raw.data(), &dst, idat.data(), idat.size()) != Z_OK ||
      dst != raw_size)
    return 12;

  // defilter in place into `out`
  for (size_t y = 0; y < hd.h; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* cur = out + y * stride;
    const uint8_t* up = y ? out + (y - 1) * stride : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(cur, src, stride);
        break;
      case 1:  // Sub
        for (size_t i = 0; i < stride; ++i)
          cur[i] = uint8_t(src[i] + (i >= bpp ? cur[i - bpp] : 0));
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; ++i)
          cur[i] = uint8_t(src[i] + (up ? up[i] : 0));
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? cur[i - bpp] : 0;
          int b = up ? up[i] : 0;
          cur[i] = uint8_t(src[i] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? cur[i - bpp] : 0;
          int b = up ? up[i] : 0;
          int c = (up && i >= bpp) ? up[i - bpp] : 0;
          cur[i] = uint8_t(src[i] + paeth(a, b, c));
        }
        break;
      default:
        return 13;
    }
  }

  // PNG 16-bit samples are big-endian; flip to host little-endian uint16
  if (hd.bit_depth == 16) {
    for (size_t i = 0; i + 1 < out_size; i += 2) {
      uint8_t t = out[i];
      out[i] = out[i + 1];
      out[i + 1] = t;
    }
  }
  *width = int(hd.w);
  *height = int(hd.h);
  *channels = hd.channels;
  *bit_depth = hd.bit_depth;
  return 0;
}

int png_decode(const char* path, uint8_t* out, size_t out_cap, int* width,
               int* height, int* channels, int* bit_depth) {
  std::vector<uint8_t> buf = read_file(path);
  if (buf.empty()) return 10;
  return png_decode_mem(buf.data(), buf.size(), out, out_cap, width, height,
                        channels, bit_depth);
}

int png_encode_ex(const char* path, const uint8_t* data, int width,
                  int height, int channels, int bit_depth) {
  if (channels != 1 && channels != 3) return 1;
  if (bit_depth != 8 && bit_depth != 16) return 1;
  if (bit_depth == 16 && channels != 1) return 1;  // gray16 only
  const size_t bytes_pp = bit_depth / 8;
  const size_t stride = size_t(width) * channels * bytes_pp;
  std::vector<uint8_t> raw(size_t(height) * (stride + 1));
  for (int y = 0; y < height; ++y) {
    uint8_t* row = raw.data() + size_t(y) * (stride + 1);
    row[0] = 0;  // filter: none
    const uint8_t* src = data + size_t(y) * stride;
    if (bit_depth == 16) {
      // PNG stores 16-bit samples big-endian; input is host (little) endian
      for (int x = 0; x < width; ++x) {
        row[1 + 2 * x] = src[2 * x + 1];
        row[1 + 2 * x + 1] = src[2 * x];
      }
    } else {
      std::memcpy(row + 1, src, stride);
    }
  }
  uLongf bound = compressBound(raw.size());
  std::vector<uint8_t> comp(bound);
  if (compress2(comp.data(), &bound, raw.data(), raw.size(), 1) != Z_OK)
    return 2;
  comp.resize(bound);

  FILE* f = std::fopen(path, "wb");
  if (!f) return 3;
  auto w32 = [&](uint32_t v) {
    uint8_t b[4] = {uint8_t(v >> 24), uint8_t(v >> 16), uint8_t(v >> 8),
                    uint8_t(v)};
    std::fwrite(b, 1, 4, f);
  };
  auto chunk = [&](const char* type, const uint8_t* d, size_t n) {
    w32(uint32_t(n));
    std::fwrite(type, 1, 4, f);
    if (n) std::fwrite(d, 1, n, f);
    uLong crc = crc32(0, (const Bytef*)type, 4);
    if (n) crc = crc32(crc, d, uInt(n));
    w32(uint32_t(crc));
  };
  std::fwrite(kSig, 1, 8, f);
  uint8_t ihdr[13];
  ihdr[0] = uint8_t(uint32_t(width) >> 24);
  ihdr[1] = uint8_t(uint32_t(width) >> 16);
  ihdr[2] = uint8_t(uint32_t(width) >> 8);
  ihdr[3] = uint8_t(width);
  ihdr[4] = uint8_t(uint32_t(height) >> 24);
  ihdr[5] = uint8_t(uint32_t(height) >> 16);
  ihdr[6] = uint8_t(uint32_t(height) >> 8);
  ihdr[7] = uint8_t(height);
  ihdr[8] = uint8_t(bit_depth);
  ihdr[9] = channels == 1 ? 0 : 2;
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  chunk("IHDR", ihdr, 13);
  chunk("IDAT", comp.data(), comp.size());
  chunk("IEND", nullptr, 0);
  std::fclose(f);
  return 0;
}

int png_encode(const char* path, const uint8_t* data, int width, int height,
               int channels) {
  return png_encode_ex(path, data, width, height, channels, 8);
}

}  // extern "C"
