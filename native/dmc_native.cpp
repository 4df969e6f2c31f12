// Native data-pipeline kernels for diffusion_models_collection_tpu.
//
// TPU-native equivalent of the reference's torchvision/PIL host pipeline
// (reference datasets/base_dataset.py:96-128 transforms + torch DataLoader
// worker processes): the per-batch hot loop — index gather, uint8 -> f32
// [-1,1] normalization, horizontal flip, bilinear resize — fused into
// single C++ passes so the host feeds the TPU without a Python inner loop.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
// Build: native/build.sh (g++ -O3 -march=native -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

inline int64_t clamp64(int64_t v, int64_t lo, int64_t hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// Parallelize [0, n) across worker threads (no-op threading for n==1 or
// single-core hosts).
template <typename F>
void parallel_for(int64_t n, F&& fn) {
    unsigned hw = std::thread::hardware_concurrency();
    int64_t workers = std::min<int64_t>(n, hw > 1 ? hw : 1);
    if (workers <= 1) {
        for (int64_t i = 0; i < n; ++i) fn(i);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(workers);
    for (int64_t t = 0; t < workers; ++t) {
        threads.emplace_back([=]() {
            for (int64_t i = t; i < n; i += workers) fn(i);
        });
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Gather `batch` images by index from a (num, h, w, c) uint8 dataset and
// write float32 HWC in [-1, 1], horizontally flipping where flip_mask[i]
// is nonzero. dst shape: (batch, h, w, c).
void dmc_gather_normalize(const uint8_t* images, const int64_t* indices,
                          const uint8_t* flip_mask, float* dst,
                          int64_t batch, int64_t h, int64_t w, int64_t c) {
    const int64_t img_elems = h * w * c;
    const float scale = 2.0f / 255.0f;
    parallel_for(batch, [&](int64_t i) {
        const uint8_t* src = images + indices[i] * img_elems;
        float* out = dst + i * img_elems;
        if (flip_mask != nullptr && flip_mask[i]) {
            for (int64_t y = 0; y < h; ++y) {
                const uint8_t* row = src + y * w * c;
                float* orow = out + y * w * c;
                for (int64_t x = 0; x < w; ++x) {
                    const uint8_t* px = row + (w - 1 - x) * c;
                    float* opx = orow + x * c;
                    for (int64_t k = 0; k < c; ++k)
                        opx[k] = px[k] * scale - 1.0f;
                }
            }
        } else {
            for (int64_t j = 0; j < img_elems; ++j)
                out[j] = src[j] * scale - 1.0f;
        }
    });
}

namespace {

// Precompute PIL-style separable triangle-filter taps for one axis:
// support scales with the reduction factor (antialias on downscale),
// weights normalized. Returns per-output-pixel (start, count) with
// weights packed in `weights` at stride `max_taps`.
struct ResampleAxis {
    std::vector<int64_t> start;
    std::vector<int64_t> count;
    std::vector<float> weights;
    int64_t max_taps;
};

ResampleAxis build_axis(int64_t src_size, int64_t dst_size) {
    ResampleAxis ax;
    const double scale = static_cast<double>(src_size) / dst_size;
    const double filterscale = scale < 1.0 ? 1.0 : scale;
    const double support = 1.0 * filterscale;  // bilinear filter support
    ax.max_taps = static_cast<int64_t>(support) * 2 + 3;
    ax.start.resize(dst_size);
    ax.count.resize(dst_size);
    ax.weights.assign(dst_size * ax.max_taps, 0.0f);
    for (int64_t i = 0; i < dst_size; ++i) {
        double center = (i + 0.5) * scale;
        int64_t xmin = static_cast<int64_t>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int64_t xmax = static_cast<int64_t>(center + support + 0.5);
        if (xmax > src_size) xmax = src_size;
        double total = 0.0;
        std::vector<double> w(xmax - xmin);
        for (int64_t j = xmin; j < xmax; ++j) {
            double t = (j - center + 0.5) / filterscale;
            double v = t < 0 ? -t : t;
            v = v >= 1.0 ? 0.0 : 1.0 - v;
            w[j - xmin] = v;
            total += v;
        }
        ax.start[i] = xmin;
        ax.count[i] = xmax - xmin;
        for (int64_t j = 0; j < xmax - xmin; ++j)
            ax.weights[i * ax.max_taps + j] =
                total > 0 ? static_cast<float>(w[j] / total) : 0.0f;
    }
    return ax;
}

}  // namespace

// Resize a batch of uint8 HWC images with PIL BILINEAR semantics
// (separable triangle filter, antialiased on downscale — matching the
// reference's torchvision/PIL Resize). src: (batch, sh, sw, c) ->
// dst: (batch, dh, dw, c).
void dmc_resize_bilinear(const uint8_t* src, uint8_t* dst, int64_t batch,
                         int64_t sh, int64_t sw, int64_t dh, int64_t dw,
                         int64_t c) {
    ResampleAxis xa = build_axis(sw, dw);
    ResampleAxis ya = build_axis(sh, dh);
    parallel_for(batch, [&](int64_t i) {
        const uint8_t* s = src + i * sh * sw * c;
        uint8_t* d = dst + i * dh * dw * c;
        // horizontal pass: (sh, dw, c) float temp
        std::vector<float> tmp(sh * dw * c);
        for (int64_t y = 0; y < sh; ++y) {
            const uint8_t* row = s + y * sw * c;
            float* trow = tmp.data() + y * dw * c;
            for (int64_t x = 0; x < dw; ++x) {
                const float* w = xa.weights.data() + x * xa.max_taps;
                int64_t x0 = xa.start[x], cnt = xa.count[x];
                for (int64_t k = 0; k < c; ++k) {
                    float acc = 0.0f;
                    for (int64_t j = 0; j < cnt; ++j)
                        acc += row[(x0 + j) * c + k] * w[j];
                    trow[x * c + k] = acc;
                }
            }
        }
        // vertical pass
        for (int64_t y = 0; y < dh; ++y) {
            const float* w = ya.weights.data() + y * ya.max_taps;
            int64_t y0 = ya.start[y], cnt = ya.count[y];
            uint8_t* orow = d + y * dw * c;
            for (int64_t x = 0; x < dw; ++x) {
                for (int64_t k = 0; k < c; ++k) {
                    float acc = 0.0f;
                    for (int64_t j = 0; j < cnt; ++j)
                        acc += tmp[((y0 + j) * dw + x) * c + k] * w[j];
                    float v = acc + 0.5f;
                    orow[x * c + k] = static_cast<uint8_t>(
                        v < 0 ? 0 : (v > 255 ? 255 : v));
                }
            }
        }
    });
}

// Denormalize float32 [-1,1] NHWC samples to uint8 [0,255] (the
// save-path inverse used by sample.py / evaluate.py PNG writers).
void dmc_denormalize_to_u8(const float* src, uint8_t* dst, int64_t n) {
    parallel_for((n + (1 << 20) - 1) >> 20, [&](int64_t chunk) {
        int64_t lo = chunk << 20;
        int64_t hi = std::min<int64_t>(lo + (1 << 20), n);
        for (int64_t j = lo; j < hi; ++j) {
            float v = (src[j] + 1.0f) * 0.5f;
            v = v < 0 ? 0 : (v > 1 ? 1 : v);
            dst[j] = static_cast<uint8_t>(v * 255.0f + 0.5f);
        }
    });
}

#ifdef DMC_HAVE_JPEG

}  // extern "C" (jpeglib.h must be included at file scope)

#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>

namespace {

// libjpeg's default error handler calls exit(); route fatal errors to a
// longjmp so corrupt files surface as return codes (Python falls back to
// PIL), and silence warning spew entirely.
struct DmcJpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

void dmc_jpeg_error_exit(j_common_ptr cinfo) {
    longjmp(reinterpret_cast<DmcJpegErr*>(cinfo->err)->jump, 1);
}

void dmc_jpeg_emit_message(j_common_ptr, int) {}

}  // namespace

extern "C" {

// Probe a JPEG header for output dimensions (RGB output implied, 3
// channels). Returns 0 ok, -1 parse failure.
int dmc_jpeg_dims(const uint8_t* data, int64_t len, int64_t* h, int64_t* w) {
    jpeg_decompress_struct cinfo;
    DmcJpegErr err;
    cinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = dmc_jpeg_error_exit;
    err.mgr.emit_message = dmc_jpeg_emit_message;
    if (setjmp(err.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Decode a JPEG to tightly-packed RGB into dst (h*w*3 bytes; full-res
// dims from dmc_jpeg_dims). `denom` in {1,2,4,8} selects libjpeg DCT
// scaling (decode directly at 1/denom resolution — skips most of the
// IDCT work; h/w must be ceil(full/denom)). Grayscale/YCbCr sources
// convert to RGB in-decoder — the same libjpeg(-turbo) path PIL's
// `convert("RGB")` takes, minus the Image-object machinery, and with no
// GIL held. Returns 0 ok, -1 corrupt, -2 unsupported source colorspace
// (CMYK/YCCK -> PIL fallback), -3 dims mismatch, -4 bad denom.
int dmc_decode_jpeg_rgb(const uint8_t* data, int64_t len, uint8_t* dst,
                        int64_t h, int64_t w, int denom) {
    if (denom != 1 && denom != 2 && denom != 4 && denom != 8) return -4;
    jpeg_decompress_struct cinfo;
    DmcJpegErr err;
    cinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = dmc_jpeg_error_exit;
    err.mgr.emit_message = dmc_jpeg_emit_message;
    if (setjmp(err.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    if (cinfo.jpeg_color_space == JCS_CMYK ||
        cinfo.jpeg_color_space == JCS_YCCK) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    cinfo.out_color_space = JCS_RGB;
    cinfo.scale_num = 1;
    cinfo.scale_denom = static_cast<unsigned>(denom);
    jpeg_start_decompress(&cinfo);
    if (static_cast<int64_t>(cinfo.output_height) != h ||
        static_cast<int64_t>(cinfo.output_width) != w ||
        cinfo.output_components != 3) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return -3;
    }
    const int64_t stride = w * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = dst + cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

#else  // !DMC_HAVE_JPEG: stubs so the ABI is stable without libjpeg
// (still inside the extern "C" block opened at the top of the file)

int dmc_jpeg_dims(const uint8_t*, int64_t, int64_t*, int64_t*) {
    return -10;
}

int dmc_decode_jpeg_rgb(const uint8_t*, int64_t, uint8_t*, int64_t,
                        int64_t, int) {
    return -10;
}

#endif

int dmc_native_abi_version() { return 2; }

}  // extern "C"
