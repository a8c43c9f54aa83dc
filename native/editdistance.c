/* Fast Levenshtein distance over int32 token sequences.
 *
 * Native counterpart of the `editdistance` C++ pip extension the reference
 * depends on (utils/error_rates.py:1).  Classic two-row DP with the
 * branchless inner loop; exposed via ctypes (see utils/_editdistance.py).
 *
 * Build: make -C native   (produces utils/libeditdistance.so)
 */

#include <stdint.h>
#include <stdlib.h>

static inline int32_t min3(int32_t a, int32_t b, int32_t c) {
    int32_t m = a < b ? a : b;
    return m < c ? m : c;
}

int32_t levenshtein_i32(const int32_t *a, int32_t n,
                        const int32_t *b, int32_t m) {
    if (n == 0) return m;
    if (m == 0) return n;
    /* keep the inner loop over the shorter sequence */
    if (m > n) {
        const int32_t *t = a; a = b; b = t;
        int32_t tn = n; n = m; m = tn;
    }
    int32_t *row = (int32_t *)malloc((size_t)(m + 1) * sizeof(int32_t));
    if (!row) return -1;
    for (int32_t j = 0; j <= m; ++j) row[j] = j;
    for (int32_t i = 1; i <= n; ++i) {
        int32_t prev_diag = row[0];   /* row[i-1][0] */
        row[0] = i;
        const int32_t ca = a[i - 1];
        for (int32_t j = 1; j <= m; ++j) {
            int32_t tmp = row[j];     /* row[i-1][j] */
            int32_t sub = prev_diag + (b[j - 1] != ca);
            row[j] = min3(tmp + 1, row[j - 1] + 1, sub);
            prev_diag = tmp;
        }
    }
    int32_t out = row[m];
    free(row);
    return out;
}

/* Batched variant: distances between gt[i] and pred[i] for i in [0, k).
 * Offsets delimit the flattened token buffers. */
void levenshtein_batch_i32(const int32_t *a_flat, const int32_t *a_off,
                           const int32_t *b_flat, const int32_t *b_off,
                           int32_t k, int32_t *out) {
    for (int32_t i = 0; i < k; ++i) {
        out[i] = levenshtein_i32(a_flat + a_off[i], a_off[i + 1] - a_off[i],
                                 b_flat + b_off[i], b_off[i + 1] - b_off[i]);
    }
}
