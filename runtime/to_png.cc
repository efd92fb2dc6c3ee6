// Raw framebuffer dumps -> RGBA PNG conversion tool.
//
// TPU-framework counterpart of the reference's convertion_tools/to_png.cc
// debug tool (same capability, fresh implementation): converts raw RGB or
// RGBA framebuffer captures (fixed 752x576 by default, overridable) to RGBA
// PNGs via libpng. Accepts a single file or a shell glob expanded by the
// caller; with --dir, converts every *.raw in a directory.
//
// Build: make -C runtime  (or: g++ -O2 -std=c++17 to_png.cc -lpng -o to_png)
#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <string>
#include <vector>

namespace fs = std::filesystem;

static bool save_png(const std::string& path, const std::vector<uint8_t>& rgba,
                     int width, int height) {
  FILE* fp = std::fopen(path.c_str(), "wb");
  if (!fp) {
    std::fprintf(stderr, "cannot open %s for writing\n", path.c_str());
    return false;
  }
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    std::fclose(fp);
    if (png) png_destroy_write_struct(&png, &info);
    return false;
  }
  png_init_io(png, fp);
  png_set_IHDR(png, info, width, height, 8, PNG_COLOR_TYPE_RGBA,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; ++y)
    rows[y] = const_cast<png_bytep>(&rgba[static_cast<size_t>(y) * width * 4]);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return true;
}

static bool convert(const std::string& in_path, int width, int height) {
  std::ifstream in(in_path, std::ios::binary);
  if (!in) {
    std::fprintf(stderr, "cannot read %s\n", in_path.c_str());
    return false;
  }
  std::vector<uint8_t> raw((std::istreambuf_iterator<char>(in)),
                           std::istreambuf_iterator<char>());
  const size_t n_px = static_cast<size_t>(width) * height;
  std::vector<uint8_t> rgba(n_px * 4);
  if (raw.size() == n_px * 4) {
    std::memcpy(rgba.data(), raw.data(), rgba.size());
  } else if (raw.size() == n_px * 3) {
    for (size_t i = 0; i < n_px; ++i) {
      rgba[4 * i] = raw[3 * i];
      rgba[4 * i + 1] = raw[3 * i + 1];
      rgba[4 * i + 2] = raw[3 * i + 2];
      rgba[4 * i + 3] = 255;
    }
  } else {
    std::fprintf(stderr, "%s: %zu bytes is neither %zu (RGB) nor %zu (RGBA)\n",
                 in_path.c_str(), raw.size(), n_px * 3, n_px * 4);
    return false;
  }
  std::string out = in_path;
  const auto dot = out.find_last_of('.');
  if (dot != std::string::npos) out.erase(dot);
  out += ".png";
  if (!save_png(out, rgba, width, height)) return false;
  std::printf("%s -> %s\n", in_path.c_str(), out.c_str());
  return true;
}

int main(int argc, char** argv) {
  int width = 752, height = 576;
  std::vector<std::string> inputs;
  bool dir_mode = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--size" && i + 2 < argc) {
      width = std::atoi(argv[++i]);
      height = std::atoi(argv[++i]);
    } else if (a == "--dir") {
      dir_mode = true;
    } else {
      inputs.push_back(a);
    }
  }
  if (inputs.empty()) {
    std::fprintf(stderr,
                 "usage: to_png [--size W H] <file.raw ...>\n"
                 "       to_png [--size W H] --dir <directory>\n");
    return 2;
  }
  int failures = 0;
  if (dir_mode) {
    for (const auto& d : inputs) {
      std::error_code ec;
      fs::directory_iterator it(d, ec);
      if (ec) {
        std::fprintf(stderr, "cannot read directory %s: %s\n", d.c_str(),
                     ec.message().c_str());
        ++failures;
        continue;
      }
      for (const auto& e : it)
        if (e.path().extension() == ".raw")
          failures += convert(e.path().string(), width, height) ? 0 : 1;
    }
  } else {
    for (const auto& f : inputs) failures += convert(f, width, height) ? 0 : 1;
  }
  return failures ? 1 : 0;
}
