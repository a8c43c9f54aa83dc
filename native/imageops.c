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

/* Bicubic resize of src (uint8, sh x sw, row stride ss) to dst
 * (float32, dh x dw, row stride ds), output = 1 - px/128. */
void resize_norm(const uint8_t *src, int sh, int sw, long ss,
                 float *dst, int dh, int dw, long ds) {
    if (sh <= 0 || sw <= 0 || dh <= 0 || dw <= 0) return;
    float sy = (float)sh / (float)dh;
    float sx = (float)sw / (float)dw;
    for (int y = 0; y < dh; ++y) {
        /* pixel-center mapping as OpenCV: (y + .5) * scale - .5 */
        float fy = ((float)y + 0.5f) * sy - 0.5f;
        int y0 = (int)(fy >= 0 ? fy : fy - 1.0f);   /* floor */
        float ty = fy - (float)y0;
        float wy[4];
        int iy[4];
        for (int k = 0; k < 4; ++k) {
            wy[k] = cubic_w((float)(k - 1) - ty);
            iy[k] = clampi(y0 + k - 1, 0, sh - 1);
        }
        float *out = dst + (long)y * ds;
        for (int x = 0; x < dw; ++x) {
            float fx = ((float)x + 0.5f) * sx - 0.5f;
            int x0 = (int)(fx >= 0 ? fx : fx - 1.0f);
            float tx = fx - (float)x0;
            float wx[4];
            int ix[4];
            for (int k = 0; k < 4; ++k) {
                wx[k] = cubic_w((float)(k - 1) - tx);
                ix[k] = clampi(x0 + k - 1, 0, sw - 1);
            }
            float acc = 0.0f;
            for (int ky = 0; ky < 4; ++ky) {
                const uint8_t *row = src + (long)iy[ky] * ss;
                float r = wx[0] * (float)row[ix[0]]
                        + wx[1] * (float)row[ix[1]]
                        + wx[2] * (float)row[ix[2]]
                        + wx[3] * (float)row[ix[3]];
                acc += wy[ky] * r;
            }
            /* saturate like the uint8 intermediate of the reference
             * pipeline (cv2.resize on uint8 clamps overshoot) */
            acc = acc < 0.0f ? 0.0f : (acc > 255.0f ? 255.0f : acc);
            out[x] = 1.0f - acc * (1.0f / 128.0f);
        }
    }
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
