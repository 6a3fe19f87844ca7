/* Native PNG decode + resample for the data loader hot path.
 *
 * The reference stack leans on torch's C++ DataLoader core + PIL for its
 * input pipeline (reference data/dataset.py:53-56 decodes with PIL and
 * resizes BILINEAR for images / NEAREST for masks).  This module is the
 * TPU-framework-native equivalent: one C pass does libpng decode ->
 * PIL-convention mode conversion -> PIL-convention resample -> float [0,1],
 * with no Python-level intermediates, exposed through a plain C ABI so
 * ctypes calls release the GIL and a decode thread pool scales with cores.
 *
 * Conventions reproduced from Pillow (verified empirically,
 * tests/test_fastimg.py):
 *   - convert("RGB"):  gray replicated to 3 channels; alpha dropped.
 *   - convert("L"):    L24 luma (R*19595 + G*38470 + B*7471 + 0x8000) >> 16.
 *   - resize NEAREST:  src[(int)((i + 0.5) * scale)].
 *   - resize BILINEAR: separable triangle filter, support = max(scale, 1);
 *     float accumulation here vs Pillow's fixed point -> <= 1/255 per pixel.
 *
 * Build: cc -O3 -fPIC -shared _fastimg.c -o _fastimg.so -ldeflate -lpng -lm
 * (done on demand by fastimg.py; PIL remains the fallback path).
 *
 * Decode strategy: the common case (8-bit, non-interlaced gray / RGB /
 * palette / +alpha) is parsed directly with a one-shot libdeflate inflate
 * (~2x zlib/zlib-ng on IDAT, the decode bottleneck) + tight unfilter
 * loops; everything else (16-bit, interlaced) falls back to libpng.
 */
#include <libdeflate.h>
#include <math.h>
#include <png.h>
#include <setjmp.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* ------------------------------------------------------------------ */
/* fast decode: raw chunk parse + libdeflate + unfilter                */
/* ------------------------------------------------------------------ */

static inline uint32_t be32(const unsigned char *p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
           ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

static inline int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    return (pb <= pc) ? b : c;
}

/* Undo PNG row filters in place over the raw inflate output
 * (height rows of [filter_byte | rowbytes]); writes unfiltered pixel rows
 * tightly packed into ``out``. */
static void unfilter(unsigned char *raw, unsigned char *out, int height,
                     size_t rowbytes, int bpp) {
    const unsigned char *prev = NULL;
    for (int y = 0; y < height; y++) {
        unsigned char *row = raw + (size_t)y * (rowbytes + 1);
        int ft = row[0];
        unsigned char *cur = out + (size_t)y * rowbytes;
        memcpy(cur, row + 1, rowbytes);
        switch (ft) {
        case 1: /* Sub */
            for (size_t x = bpp; x < rowbytes; x++) cur[x] += cur[x - bpp];
            break;
        case 2: /* Up */
            if (prev)
                for (size_t x = 0; x < rowbytes; x++) cur[x] += prev[x];
            break;
        case 3: /* Average */
            for (size_t x = 0; x < rowbytes; x++) {
                int a = x >= (size_t)bpp ? cur[x - bpp] : 0;
                int b = prev ? prev[x] : 0;
                cur[x] += (unsigned char)((a + b) >> 1);
            }
            break;
        case 4: /* Paeth */
            for (size_t x = 0; x < rowbytes; x++) {
                int a = x >= (size_t)bpp ? cur[x - bpp] : 0;
                int b = prev ? prev[x] : 0;
                int c = (prev && x >= (size_t)bpp) ? prev[x - bpp] : 0;
                cur[x] += (unsigned char)paeth(a, b, c);
            }
            break;
        default: /* 0 = None */
            break;
        }
        prev = cur;
    }
}

/* Fast path: returns 0 and fills outputs, nonzero -> caller falls back to
 * libpng.  Output is 8-bit gray (c=1) or RGB (c=3), alpha dropped, palette
 * expanded — same observable semantics as the libpng transform chain. */
static int fi_decode_fast(const char *path, unsigned char **data, int *h,
                          int *w, int *c) {
    FILE *fp = fopen(path, "rb");
    if (!fp) return 1;
    fseek(fp, 0, SEEK_END);
    long fsize = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    if (fsize < 45) { fclose(fp); return 1; }
    unsigned char *file = (unsigned char *)malloc((size_t)fsize);
    if (!file || fread(file, 1, (size_t)fsize, fp) != (size_t)fsize) {
        free(file); fclose(fp); return 1;
    }
    fclose(fp);
    static const unsigned char SIG[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (memcmp(file, SIG, 8) != 0) { free(file); return 1; }

    int width = 0, height = 0, depth = 0, color = -1, interlace = 0;
    unsigned char plte[256 * 3];
    int n_plte = 0;
    /* first pass over chunks: header + total IDAT length */
    size_t off = 8, idat_total = 0;
    int seen_iend = 0;
    while (off + 12 <= (size_t)fsize) {
        uint32_t len = be32(file + off);
        const unsigned char *type = file + off + 4;
        if (off + 12 + len > (size_t)fsize) { free(file); return 1; }
        const unsigned char *payload = file + off + 8;
        if (!memcmp(type, "IHDR", 4)) {
            if (len < 13) { free(file); return 1; }
            width = (int)be32(payload);
            height = (int)be32(payload + 4);
            depth = payload[8];
            color = payload[9];
            interlace = payload[12];
        } else if (!memcmp(type, "PLTE", 4)) {
            if (len > sizeof(plte)) { free(file); return 1; }
            memcpy(plte, payload, len);
            n_plte = (int)(len / 3);
        } else if (!memcmp(type, "IDAT", 4)) {
            idat_total += len;
        } else if (!memcmp(type, "IEND", 4)) {
            seen_iend = 1;
            break;
        }
        off += 12 + len;
    }
    int ch_in;
    switch (color) {
    case 0: ch_in = 1; break;  /* gray */
    case 2: ch_in = 3; break;  /* RGB */
    case 3: ch_in = 1; break;  /* palette */
    case 4: ch_in = 2; break;  /* gray+alpha */
    case 6: ch_in = 4; break;  /* RGBA */
    default: ch_in = 0;
    }
    if (!seen_iend || depth != 8 || interlace != 0 || ch_in == 0 ||
        width <= 0 || height <= 0 || idat_total == 0 ||
        (color == 3 && n_plte == 0)) {
        free(file);
        return 1; /* not the fast case */
    }

    /* gather IDAT into one contiguous zlib stream */
    unsigned char *zdata = (unsigned char *)malloc(idat_total);
    if (!zdata) { free(file); return 1; }
    size_t zoff = 0;
    for (off = 8; off + 12 <= (size_t)fsize;) {
        uint32_t len = be32(file + off);
        const unsigned char *type = file + off + 4;
        if (!memcmp(type, "IDAT", 4)) {
            memcpy(zdata + zoff, file + off + 8, len);
            zoff += len;
        } else if (!memcmp(type, "IEND", 4)) {
            break;
        }
        off += 12 + len;
    }
    free(file);

    size_t rowbytes = (size_t)width * ch_in;
    size_t raw_size = (size_t)height * (rowbytes + 1);
    unsigned char *raw = (unsigned char *)malloc(raw_size);
    struct libdeflate_decompressor *d = libdeflate_alloc_decompressor();
    if (!raw || !d) {
        free(raw); free(zdata);
        if (d) libdeflate_free_decompressor(d);
        return 1;
    }
    size_t got = 0;
    enum libdeflate_result r =
        libdeflate_zlib_decompress(d, zdata, zoff, raw, raw_size, &got);
    libdeflate_free_decompressor(d);
    free(zdata);
    if (r != LIBDEFLATE_SUCCESS || got != raw_size) { free(raw); return 1; }

    unsigned char *px = (unsigned char *)malloc((size_t)height * rowbytes);
    if (!px) { free(raw); return 1; }
    unfilter(raw, px, height, rowbytes, ch_in);
    free(raw);

    /* normalise to gray (1) or RGB (3), dropping alpha / expanding palette */
    size_t n = (size_t)width * height;
    if (color == 0 || color == 2) { /* already target layout */
        *data = px;
        *c = ch_in;
    } else {
        int ch_out = (color == 3) ? 3 : (color == 4 ? 1 : 3);
        unsigned char *out = (unsigned char *)malloc(n * ch_out);
        if (!out) { free(px); return 1; }
        if (color == 3) { /* palette -> RGB */
            for (size_t i = 0; i < n; i++) {
                int idx = px[i] < n_plte ? px[i] : 0;
                out[i * 3] = plte[idx * 3];
                out[i * 3 + 1] = plte[idx * 3 + 1];
                out[i * 3 + 2] = plte[idx * 3 + 2];
            }
        } else if (color == 4) { /* gray+alpha -> gray */
            for (size_t i = 0; i < n; i++) out[i] = px[i * 2];
        } else { /* RGBA -> RGB */
            for (size_t i = 0; i < n; i++) {
                out[i * 3] = px[i * 4];
                out[i * 3 + 1] = px[i * 4 + 1];
                out[i * 3 + 2] = px[i * 4 + 2];
            }
        }
        free(px);
        *data = out;
        *c = ch_out;
    }
    *h = height;
    *w = width;
    return 0;
}

/* ------------------------------------------------------------------ */
/* decode (libpng fallback for 16-bit / interlaced / odd files)        */
/* ------------------------------------------------------------------ */

/* Decode a PNG file to 8-bit gray (channels=1) or RGB (channels=3).
 * Palette/16-bit/low-bit-depth/alpha inputs are normalised by libpng
 * transforms to match what PIL's .convert() would observe.  Returns 0 on
 * success; *data is malloc'd (free with fi_free). */
int fi_decode(const char *path, unsigned char **data, int *h, int *w, int *c) {
    *data = NULL;
    if (fi_decode_fast(path, data, h, w, c) == 0) return 0;
    FILE *fp = fopen(path, "rb");
    if (!fp) return 1;
    unsigned char sig[8];
    if (fread(sig, 1, 8, fp) != 8 || png_sig_cmp(sig, 0, 8)) {
        fclose(fp);
        return 2;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
    png_infop info = png ? png_create_info_struct(png) : NULL;
    if (!png || !info) {
        if (png) png_destroy_read_struct(&png, &info, NULL);
        fclose(fp);
        return 3;
    }
    unsigned char *buf = NULL;
    png_bytep *rows = NULL;
    if (setjmp(png_jmpbuf(png))) { /* libpng error -> clean fail */
        png_destroy_read_struct(&png, &info, NULL);
        free(buf);
        free(rows);
        fclose(fp);
        return 4;
    }
    png_init_io(png, fp);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);

    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (depth == 16) png_set_strip_16(png);
    /* PIL convert("RGB") drops alpha without compositing */
    png_set_strip_alpha(png);
    png_read_update_info(png, info);

    int height = (int)png_get_image_height(png, info);
    int width = (int)png_get_image_width(png, info);
    int channels = (int)png_get_channels(png, info);
    size_t rowbytes = png_get_rowbytes(png, info);
    if (channels != 1 && channels != 3) { /* unexpected post-transform layout */
        longjmp(png_jmpbuf(png), 1);
    }
    buf = (unsigned char *)malloc((size_t)height * rowbytes);
    rows = (png_bytep *)malloc((size_t)height * sizeof(png_bytep));
    if (!buf || !rows) longjmp(png_jmpbuf(png), 1);
    for (int y = 0; y < height; y++) rows[y] = buf + (size_t)y * rowbytes;
    png_read_image(png, rows);
    png_read_end(png, NULL);
    png_destroy_read_struct(&png, &info, NULL);
    free(rows);
    fclose(fp);
    *data = buf;
    *h = height;
    *w = width;
    *c = channels;
    return 0;
}

void fi_free(unsigned char *p) { free(p); }

/* ------------------------------------------------------------------ */
/* mode conversion (PIL formulas)                                      */
/* ------------------------------------------------------------------ */

static inline unsigned char luma_l24(const unsigned char *px) {
    return (unsigned char)(((uint32_t)px[0] * 19595u + (uint32_t)px[1] * 38470u +
                            (uint32_t)px[2] * 7471u + 0x8000u) >> 16);
}

/* ------------------------------------------------------------------ */
/* resample                                                            */
/* ------------------------------------------------------------------ */

/* Triangle-filter coefficients for one axis (Pillow ImagingResample
 * convention).  bounds[i*2] = first source index, bounds[i*2+1] = tap
 * count; weights normalised to sum 1. */
static int tri_coeffs(int in_size, int out_size, int **bounds_out, float **w_out,
                      int *ksize_out) {
    double scale = (double)in_size / out_size;
    double fscale = scale < 1.0 ? 1.0 : scale;
    double support = 1.0 * fscale;
    int ksize = (int)ceil(support) * 2 + 1;
    int *bounds = (int *)malloc((size_t)out_size * 2 * sizeof(int));
    float *weights = (float *)malloc((size_t)out_size * ksize * sizeof(float));
    if (!bounds || !weights) {
        free(bounds);
        free(weights);
        return 1;
    }
    for (int i = 0; i < out_size; i++) {
        double center = (i + 0.5) * scale;
        int xmin = (int)(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = (int)(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        int n = xmax - xmin;
        double sum = 0.0;
        for (int x = 0; x < n; x++) {
            double v = 1.0 - fabs((xmin + x + 0.5 - center) / fscale);
            if (v < 0.0) v = 0.0;
            weights[(size_t)i * ksize + x] = (float)v;
            sum += v;
        }
        for (int x = 0; x < n; x++)
            weights[(size_t)i * ksize + x] = (float)(weights[(size_t)i * ksize + x] / sum);
        bounds[i * 2] = xmin;
        bounds[i * 2 + 1] = n;
    }
    *bounds_out = bounds;
    *w_out = weights;
    *ksize_out = ksize;
    return 0;
}

/* uint8 (h,w,c) -> float32 (oh,ow,c) in [0,1]: PIL BILINEAR + /255 fused.
 * Gray input is replicated to rgb_c output channels when rgb_c==3. */
int fi_resize_bilinear_f32(const unsigned char *src, int h, int w, int c,
                           float *dst, int oh, int ow, int rgb_c) {
    int *bx = NULL, *by = NULL, kx, ky;
    float *wx = NULL, *wy = NULL;
    if (tri_coeffs(w, ow, &bx, &wx, &kx) || tri_coeffs(h, oh, &by, &wy, &ky)) {
        free(bx);
        free(wx);
        return 1;
    }
    /* horizontal pass: (h, w, c) -> (h, ow, c) float */
    float *tmp = (float *)malloc((size_t)h * ow * c * sizeof(float));
    if (!tmp) {
        free(bx); free(wx); free(by); free(wy);
        return 1;
    }
    for (int y = 0; y < h; y++) {
        const unsigned char *row = src + (size_t)y * w * c;
        float *trow = tmp + (size_t)y * ow * c;
        if (c == 3) {
            for (int x = 0; x < ow; x++) {
                int x0 = bx[x * 2], n = bx[x * 2 + 1];
                const float *ws = wx + (size_t)x * kx;
                const unsigned char *p = row + (size_t)x0 * 3;
                float a0 = 0.0f, a1 = 0.0f, a2 = 0.0f;
                for (int k = 0; k < n; k++, p += 3) {
                    float wk = ws[k];
                    a0 += p[0] * wk;
                    a1 += p[1] * wk;
                    a2 += p[2] * wk;
                }
                trow[(size_t)x * 3] = a0;
                trow[(size_t)x * 3 + 1] = a1;
                trow[(size_t)x * 3 + 2] = a2;
            }
        } else {
            for (int x = 0; x < ow; x++) {
                int x0 = bx[x * 2], n = bx[x * 2 + 1];
                const float *ws = wx + (size_t)x * kx;
                float acc = 0.0f;
                for (int k = 0; k < n; k++) acc += row[x0 + k] * ws[k];
                trow[x] = acc;
            }
        }
    }
    /* vertical pass: row-wise axpy accumulation (sequential access, the
     * compiler vectorises the inner loops), then [0,1] scale + optional
     * gray->RGB replication. */
    const float inv = 1.0f / 255.0f;
    size_t rw = (size_t)ow * c;
    float *acc = (float *)malloc(rw * sizeof(float));
    if (!acc) {
        free(tmp);
        free(bx); free(wx); free(by); free(wy);
        return 1;
    }
    for (int y = 0; y < oh; y++) {
        int y0 = by[y * 2], n = by[y * 2 + 1];
        const float *ws = wy + (size_t)y * ky;
        const float *r0 = tmp + (size_t)y0 * rw;
        float w0 = ws[0];
        for (size_t i = 0; i < rw; i++) acc[i] = r0[i] * w0;
        for (int k = 1; k < n; k++) {
            const float *rk = tmp + (size_t)(y0 + k) * rw;
            float wk = ws[k];
            for (size_t i = 0; i < rw; i++) acc[i] += rk[i] * wk;
        }
        float *drow = dst + (size_t)y * ow * rgb_c;
        if (c == rgb_c) {
            for (size_t i = 0; i < rw; i++) {
                float v = acc[i];
                if (v < 0.0f) v = 0.0f;
                if (v > 255.0f) v = 255.0f;
                drow[i] = v * inv;
            }
        } else { /* gray -> replicate to rgb_c */
            for (int x = 0; x < ow; x++) {
                float v = acc[x];
                if (v < 0.0f) v = 0.0f;
                if (v > 255.0f) v = 255.0f;
                v *= inv;
                for (int r = 0; r < rgb_c; r++) drow[(size_t)x * rgb_c + r] = v;
            }
        }
    }
    free(acc);
    free(tmp);
    free(bx); free(wx); free(by); free(wy);
    return 0;
}

/* uint8 (h,w,c) -> uint8 gray (oh,ow): PIL convert("L") + resize NEAREST. */
int fi_resize_nearest_gray_u8(const unsigned char *src, int h, int w, int c,
                              unsigned char *dst, int oh, int ow) {
    double sy = (double)h / oh, sx = (double)w / ow;
    for (int y = 0; y < oh; y++) {
        int ys = (int)((y + 0.5) * sy);
        if (ys >= h) ys = h - 1;
        const unsigned char *row = src + (size_t)ys * w * c;
        unsigned char *drow = dst + (size_t)y * ow;
        for (int x = 0; x < ow; x++) {
            int xs = (int)((x + 0.5) * sx);
            if (xs >= w) xs = w - 1;
            drow[x] = (c == 1) ? row[xs] : luma_l24(row + (size_t)xs * c);
        }
    }
    return 0;
}

/* uint8 (h,w,c) -> float32 RGB (h,w,3) in [0,1], no resize (identity path). */
int fi_to_rgb_f32(const unsigned char *src, int h, int w, int c, float *dst) {
    const float inv = 1.0f / 255.0f;
    size_t n = (size_t)h * w;
    if (c == 3) {
        for (size_t i = 0; i < n * 3; i++) dst[i] = src[i] * inv;
    } else {
        for (size_t i = 0; i < n; i++) {
            float v = src[i] * inv;
            dst[i * 3] = v;
            dst[i * 3 + 1] = v;
            dst[i * 3 + 2] = v;
        }
    }
    return 0;
}

/* uint8 (h,w,c) -> uint8 gray (h,w), no resize. */
int fi_to_gray_u8(const unsigned char *src, int h, int w, int c, unsigned char *dst) {
    size_t n = (size_t)h * w;
    if (c == 1) {
        memcpy(dst, src, n);
    } else {
        for (size_t i = 0; i < n; i++) dst[i] = luma_l24(src + i * 3);
    }
    return 0;
}
