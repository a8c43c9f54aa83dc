/* Native host-side image ops for the data layer.
 *
 * The reference leans on OpenCV's C++ kernels for its host pipeline
 * (imread/resize in datasets/hw_dataset.py:120-131 and
 * author_hw_dataset.py:374-397).  Our TPU port keeps file decode in
 * OpenCV but replaces the per-line resize + normalize + batch-pack hot
 * path (the single-core host is the bottleneck feeding a v5e chip) with
 * this fused single-pass C library, loaded via ctypes.
 *
 * - resize_norm: bicubic (a=-0.75, matching cv2 INTER_CUBIC)
 *   resize of a uint8 grayscale crop directly into normalized float32
 *   `1 - px/128` (hw_dataset.py:156-157 convention) — one pass instead of
 *   resize + astype + arithmetic.
 * - pack_batch: fill + copy a ragged list of normalized lines into the
 *   padded [B, H, WB] batch tensor in one sweep (no full-buffer prefill).
 */

#include <stdint.h>
#include <string.h>

static inline float cubic_w(float t) {
    /* cubic kernel with OpenCV's coefficient a = -0.75 */
    const float a = -0.75f;
    float at = t < 0 ? -t : t;
    if (at <= 1.0f)
        return ((a + 2.0f) * at - (a + 3.0f)) * at * at + 1.0f;
    if (at < 2.0f)
        return ((a * at - 5.0f * a) * at + 8.0f * a) * at - 4.0f * a;
    return 0.0f;
}

static inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

#include <stdlib.h>

/* Precompute 4-tap coefficients for one axis: for each of n outputs,
 * 4 clamped source indices and 4 kernel weights (pixel-center mapping
 * (i + .5) * scale - .5, as OpenCV). */
static void make_taps(int n_src, int n_dst, int *idx, float *w) {
    float scale = (float)n_src / (float)n_dst;
    for (int i = 0; i < n_dst; ++i) {
        float f = ((float)i + 0.5f) * scale - 0.5f;
        int i0 = (int)(f >= 0 ? f : f - 1.0f);      /* floor */
        float t = f - (float)i0;
        for (int k = 0; k < 4; ++k) {
            idx[4 * i + k] = clampi(i0 + k - 1, 0, n_src - 1);
            w[4 * i + k] = cubic_w((float)(k - 1) - t);
        }
    }
}

/* Separable bicubic resize of src (uint8, sh x sw, row stride ss) to dst
 * (float32, dh x dw, row stride ds), output = 1 - px/128.  Horizontal
 * pass into a float scratch, then vertical with per-row coefficients
 * computed once (the kernel is separable, so this equals the 2-D sum). */
void resize_norm(const uint8_t *src, int sh, int sw, long ss,
                 float *dst, int dh, int dw, long ds) {
    if (sh <= 0 || sw <= 0 || dh <= 0 || dw <= 0) return;
    int *xi = (int *)malloc((size_t)dw * 4 * sizeof(int));
    float *xw = (float *)malloc((size_t)dw * 4 * sizeof(float));
    int *yi = (int *)malloc((size_t)dh * 4 * sizeof(int));
    float *yw = (float *)malloc((size_t)dh * 4 * sizeof(float));
    float *tmp = (float *)malloc((size_t)sh * dw * sizeof(float));
    if (!xi || !xw || !yi || !yw || !tmp) {
        free(xi); free(xw); free(yi); free(yw); free(tmp);
        return;
    }
    make_taps(sw, dw, xi, xw);
    make_taps(sh, dh, yi, yw);

    for (int y = 0; y < sh; ++y) {                   /* horizontal pass */
        const uint8_t *row = src + (long)y * ss;
        float *out = tmp + (long)y * dw;
        for (int x = 0; x < dw; ++x) {
            const int *ix = xi + 4 * x;
            const float *wx = xw + 4 * x;
            out[x] = wx[0] * (float)row[ix[0]] + wx[1] * (float)row[ix[1]]
                   + wx[2] * (float)row[ix[2]] + wx[3] * (float)row[ix[3]];
        }
    }
    for (int y = 0; y < dh; ++y) {                   /* vertical pass */
        const int *iy = yi + 4 * y;
        const float *wy = yw + 4 * y;
        const float *r0 = tmp + (long)iy[0] * dw;
        const float *r1 = tmp + (long)iy[1] * dw;
        const float *r2 = tmp + (long)iy[2] * dw;
        const float *r3 = tmp + (long)iy[3] * dw;
        float *out = dst + (long)y * ds;
        for (int x = 0; x < dw; ++x) {
            float acc = wy[0] * r0[x] + wy[1] * r1[x]
                      + wy[2] * r2[x] + wy[3] * r3[x];
            /* saturate like the uint8 intermediate of the reference
             * pipeline (cv2.resize on uint8 clamps overshoot) */
            acc = acc < 0.0f ? 0.0f : (acc > 255.0f ? 255.0f : acc);
            out[x] = 1.0f - acc * (1.0f / 128.0f);
        }
    }
    free(xi); free(xw); free(yi); free(yw); free(tmp);
}

/* Pack B ragged normalized lines (each H x widths[i] float32, contiguous)
 * into out[B, H, WB] with `fill` padding, single pass per row. */
void pack_batch(float *out, int B, int H, int WB,
                const float **srcs, const int *widths, float fill) {
    for (int b = 0; b < B; ++b) {
        int w = widths[b] < WB ? widths[b] : WB;
        const float *src = srcs[b];
        float *dst = out + (long)b * H * WB;
        for (int y = 0; y < H; ++y) {
            memcpy(dst + (long)y * WB, src + (long)y * widths[b],
                   (size_t)w * sizeof(float));
            for (int x = w; x < WB; ++x)
                dst[(long)y * WB + x] = fill;
        }
    }
}
