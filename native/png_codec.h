// Minimal PNG codec (decode + encode) for the dataset/runtime layer.
//
// TPU-native replacement for the image IO the reference gets from
// cv::imread / cv_bridge (reference: src/sg-slam/Examples/rgbd_tum.cc:111-125
// reads RGB8 color and GRAY16 depth PNGs; src/cv_bridge converts ROS
// images). Supports exactly what RGB-D SLAM datasets need:
//   decode: 8-bit gray / RGB / RGBA, 16-bit gray (TUM depth), no interlace
//   encode: 8-bit gray / RGB (viewer + exporter output)
#pragma once

#include <cstdint>
#include <cstddef>

extern "C" {

// Reads header only. Returns 0 on success.
int png_info(const char* path, int* width, int* height, int* channels,
             int* bit_depth);

// Decodes the full image into out (caller-allocated,
// width*height*channels*(bit_depth/8) bytes; 16-bit output is host-endian
// uint16). Returns 0 on success.
int png_decode(const char* path, uint8_t* out, size_t out_cap, int* width,
               int* height, int* channels, int* bit_depth);

// In-memory decode (buf = full PNG file contents).
int png_decode_mem(const uint8_t* buf, size_t len, uint8_t* out,
                   size_t out_cap, int* width, int* height, int* channels,
                   int* bit_depth);

// Encodes 8-bit gray (channels=1) or RGB (channels=3). Returns 0 on success.
int png_encode(const char* path, const uint8_t* data, int width, int height,
               int channels);

// bit_depth 8 (gray/RGB) or 16 (gray16, e.g. TUM depth maps; input samples
// host-endian uint16). Returns 0 on success.
int png_encode_ex(const char* path, const uint8_t* data, int width,
                  int height, int channels, int bit_depth);

}  // extern "C"
