// miniio: native codec runtime for imagemagick_tpu.
//
// The reference's IO stack is native C (blob.c byte streams, quantum-import.c
// wire-format conversion, coders/jpeg.c + coders/png.c over libjpeg-turbo and
// libpng).  This module is the TPU framework's native equivalent: direct
// libjpeg/libpng decode/encode into contiguous float32/uint8 buffers that the
// Python layer hands straight to the device, bypassing PIL's Image object
// overhead.  Calls are GIL-free (ctypes releases the GIL), so a host-side
// thread pool decodes a corpus in parallel while the TPU runs the previous
// batch — the data-loader half of the 10k-thumbnailer pipeline.
//
// Build: g++ -O3 -fPIC -shared miniio.cpp -ljpeg -lpng -o libminiio.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct miniio_jpeg_error {
    struct jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

static void miniio_jpeg_error_exit(j_common_ptr cinfo) {
    miniio_jpeg_error* err = reinterpret_cast<miniio_jpeg_error*>(cinfo->err);
    longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG from memory.  Returns 0 on success.
// *out is malloc'd RGB8 (h*w*3); caller frees with miniio_free.
int miniio_decode_jpeg(const uint8_t* data, size_t size,
                       uint8_t** out, int* width, int* height, int* channels) {
    jpeg_decompress_struct cinfo;
    miniio_jpeg_error jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = miniio_jpeg_error_exit;
    uint8_t* buffer = nullptr;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        free(buffer);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int w = cinfo.output_width;
    const int h = cinfo.output_height;
    const int c = cinfo.output_components;  // 3 after JCS_RGB
    buffer = static_cast<uint8_t*>(malloc(static_cast<size_t>(w) * h * c));
    if (!buffer) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = buffer + static_cast<size_t>(cinfo.output_scanline) * w * c;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *out = buffer;
    *width = w;
    *height = h;
    *channels = c;
    return 0;
}

// Encode RGB8/gray8 to JPEG.  Returns 0 on success; *out malloc'd.
int miniio_encode_jpeg(const uint8_t* pixels, int width, int height,
                       int channels, int quality,
                       uint8_t** out, size_t* out_size) {
    jpeg_compress_struct cinfo;
    miniio_jpeg_error jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = miniio_jpeg_error_exit;
    unsigned char* mem = nullptr;
    unsigned long mem_size = 0;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_compress(&cinfo);
        free(mem);
        return 1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &mem, &mem_size);
    cinfo.image_width = width;
    cinfo.image_height = height;
    cinfo.input_components = channels;
    cinfo.in_color_space = channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    if (quality >= 90) {
        // 4:4:4 at high quality, matching coders/jpeg.c sampling policy
        cinfo.comp_info[0].h_samp_factor = 1;
        cinfo.comp_info[0].v_samp_factor = 1;
    }
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        const uint8_t* row = pixels +
            static_cast<size_t>(cinfo.next_scanline) * width * channels;
        JSAMPROW rows[1] = {const_cast<uint8_t*>(row)};
        jpeg_write_scanlines(&cinfo, rows, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    *out = mem;
    *out_size = mem_size;
    return 0;
}

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

struct miniio_png_reader {
    const uint8_t* data;
    size_t size;
    size_t pos;
};

static void miniio_png_read(png_structp png, png_bytep out, png_size_t n) {
    miniio_png_reader* r =
        static_cast<miniio_png_reader*>(png_get_io_ptr(png));
    if (r->pos + n > r->size) {
        png_error(png, "read past end");
        return;
    }
    memcpy(out, r->data + r->pos, n);
    r->pos += n;
}

// Decode PNG from memory to 8- or 16-bit samples.
// bit_depth out: 8 or 16 (16-bit data is big-endian as in the file).
int miniio_decode_png(const uint8_t* data, size_t size,
                      uint8_t** out, int* width, int* height, int* channels,
                      int* bit_depth) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) return 1;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return 1;
    }
    uint8_t* buffer = nullptr;
    png_bytep* rows = nullptr;
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        free(buffer);
        free(rows);
        return 1;
    }
    miniio_png_reader reader{data, size, 0};
    png_set_read_fn(png, &reader, miniio_png_read);
    png_read_info(png, info);

    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    int depth = png_get_bit_depth(png, info);
    int color = png_get_color_type(png, info);

    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (png_get_interlace_type(png, info) != PNG_INTERLACE_NONE)
        png_set_interlace_handling(png);
    png_read_update_info(png, info);

    depth = png_get_bit_depth(png, info);
    const int c = png_get_channels(png, info);
    const size_t rowbytes = png_get_rowbytes(png, info);
    buffer = static_cast<uint8_t*>(malloc(rowbytes * h));
    rows = static_cast<png_bytep*>(malloc(sizeof(png_bytep) * h));
    if (!buffer || !rows) {
        png_destroy_read_struct(&png, &info, nullptr);
        free(buffer);
        free(rows);
        return 2;
    }
    for (png_uint_32 y = 0; y < h; ++y) rows[y] = buffer + y * rowbytes;
    png_read_image(png, rows);
    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    free(rows);
    *out = buffer;
    *width = static_cast<int>(w);
    *height = static_cast<int>(h);
    *channels = c;
    *bit_depth = depth;
    return 0;
}

struct miniio_png_writer {
    uint8_t* data;
    size_t size;
    size_t cap;
};

static void miniio_png_write(png_structp png, png_bytep in, png_size_t n) {
    miniio_png_writer* wtr =
        static_cast<miniio_png_writer*>(png_get_io_ptr(png));
    if (wtr->size + n > wtr->cap) {
        size_t new_cap = wtr->cap ? wtr->cap * 2 : 65536;
        while (new_cap < wtr->size + n) new_cap *= 2;
        wtr->data = static_cast<uint8_t*>(realloc(wtr->data, new_cap));
        wtr->cap = new_cap;
    }
    memcpy(wtr->data + wtr->size, in, n);
    wtr->size += n;
}

static void miniio_png_flush(png_structp) {}

// Encode 8- or 16-bit (big-endian) samples to PNG.
int miniio_encode_png(const uint8_t* pixels, int width, int height,
                      int channels, int bit_depth,
                      uint8_t** out, size_t* out_size) {
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                              nullptr, nullptr, nullptr);
    if (!png) return 1;
    png_infop info = png_create_info_struct(png);
    miniio_png_writer writer{nullptr, 0, 0};
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_write_struct(&png, &info);
        free(writer.data);
        return 1;
    }
    png_set_write_fn(png, &writer, miniio_png_write, miniio_png_flush);
    int color = PNG_COLOR_TYPE_RGB;
    if (channels == 1) color = PNG_COLOR_TYPE_GRAY;
    else if (channels == 2) color = PNG_COLOR_TYPE_GRAY_ALPHA;
    else if (channels == 4) color = PNG_COLOR_TYPE_RGB_ALPHA;
    png_set_IHDR(png, info, width, height, bit_depth, color,
                 PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                 PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);
    const size_t rowbytes = static_cast<size_t>(width) * channels * (bit_depth / 8);
    for (int y = 0; y < height; ++y) {
        png_write_row(png, const_cast<png_bytep>(pixels + y * rowbytes));
    }
    png_write_end(png, nullptr);
    png_destroy_write_struct(&png, &info);
    *out = writer.data;
    *out_size = writer.size;
    return 0;
}

// ---------------------------------------------------------------------------
// Quantum conversion (quantum-import.c/-export.c hot path): u8 <-> f32
// with stride support, vectorizable tight loops the compiler unrolls.
// ---------------------------------------------------------------------------

void miniio_u8_to_f32(const uint8_t* in, float* out, size_t n) {
    const float scale = 1.0f / 255.0f;
    for (size_t i = 0; i < n; ++i) out[i] = in[i] * scale;
}

void miniio_f32_to_u8(const float* in, uint8_t* out, size_t n) {
    for (size_t i = 0; i < n; ++i) {
        float v = in[i] * 255.0f + 0.5f;
        if (v < 0.0f) v = 0.0f;
        if (v > 255.0f) v = 255.0f;
        out[i] = static_cast<uint8_t>(v);
    }
}

void miniio_u16be_to_f32(const uint8_t* in, float* out, size_t n) {
    const float scale = 1.0f / 65535.0f;
    for (size_t i = 0; i < n; ++i) {
        uint16_t v = static_cast<uint16_t>((in[2 * i] << 8) | in[2 * i + 1]);
        out[i] = v * scale;
    }
}

void miniio_free(void* p) { free(p); }

// DCT-scaled JPEG decode (the reference's -define jpeg:size culture,
// coders/jpeg.c jpeg_calc_output_dimensions scale selection): pick the
// largest 1/denom in {1,2,4,8} whose output still covers (min_w, min_h),
// so a following Lanczos resize downsamples.  Decoding at 1/2 or 1/4 is
// nearly free in libjpeg and cuts the host->device upload bytes by the
// square of the scale — the thumbnailer's tunnel bottleneck.
int miniio_decode_jpeg_scaled(const uint8_t* data, size_t size,
                              int min_w, int min_h,
                              uint8_t** out, int* width, int* height,
                              int* channels) {
    jpeg_decompress_struct cinfo;
    miniio_jpeg_error jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = miniio_jpeg_error_exit;
    uint8_t* buffer = nullptr;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        free(buffer);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    int denom = 1;
    if (min_w > 0 && min_h > 0) {
        for (int d = 2; d <= 8; d *= 2) {
            if (static_cast<int>(cinfo.image_width) / d >= min_w &&
                static_cast<int>(cinfo.image_height) / d >= min_h) {
                denom = d;
            }
        }
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
    jpeg_start_decompress(&cinfo);
    const int w = cinfo.output_width;
    const int h = cinfo.output_height;
    const int c = cinfo.output_components;
    buffer = static_cast<uint8_t*>(malloc(static_cast<size_t>(w) * h * c));
    if (!buffer) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = buffer + static_cast<size_t>(cinfo.output_scanline) * w * c;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *out = buffer;
    *width = w;
    *height = h;
    *channels = c;
    return 0;
}

int miniio_abi_version() { return 2; }

}  // extern "C"
