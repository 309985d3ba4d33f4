// Native runtime components for boltzfft, exposed through a C ABI (ctypes).
//
// The reference's native dependencies are GSL (Gauss-Legendre tables,
// Quadratures/GaussLegendre.hpp:14-23) and hand-rolled timing statistics
// (Utilities/statistics.hpp). Both are reimplemented here from scratch:
//
//  * bz_leggauss: n-point Gauss-Legendre nodes/weights on [-1, 1] by Newton
//    iteration on P_n computed with the three-term recurrence in long double
//    (80-bit on x86) — agrees with GSL/numpy to <= 1 ulp in double.
//  * bz_running_stats: single-pass min/max/mean/stdev (Welford) over trial
//    timings, long-double accumulation.
//
// Build: make -C native  (produces boltzfft/_lib/libboltzfft_native.so)

#include <cmath>
#include <cstddef>

extern "C" {

// Gauss-Legendre nodes/weights on [-1, 1]. nodes/weights must hold n doubles.
// Returns 0 on success, nonzero on bad input / non-convergence.
int bz_leggauss(int n, double* nodes, double* weights) {
    if (n < 1 || !nodes || !weights) return 1;
    const long double pi = 3.14159265358979323846264338327950288L;

    // Roots are symmetric about 0; solve for the upper half.
    const int half = (n + 1) / 2;
    for (int k = 0; k < half; ++k) {
        // Tricomi-style initial guess for the k-th largest root.
        long double x = cosl(pi * (k + 0.75L) / (n + 0.5L));

        long double pp = 0.0L;  // P_n'(x)
        for (int iter = 0; iter < 100; ++iter) {
            // Three-term recurrence: (j+1) P_{j+1} = (2j+1) x P_j - j P_{j-1}
            long double p0 = 1.0L, p1 = x;
            for (int j = 1; j < n; ++j) {
                long double p2 = ((2 * j + 1) * x * p1 - j * p0) / (j + 1);
                p0 = p1;
                p1 = p2;
            }
            // derivative from P_n and P_{n-1}
            pp = n * (x * p1 - p0) / (x * x - 1.0L);
            long double dx = p1 / pp;
            x -= dx;
            if (fabsl(dx) < 1e-19L * (1.0L + fabsl(x))) break;
        }

        long double w = 2.0L / ((1.0L - x * x) * pp * pp);
        nodes[k] = (double)(-x);             // ascending order
        nodes[n - 1 - k] = (double)(x);
        weights[k] = (double)(w);
        weights[n - 1 - k] = (double)(w);
    }
    if (n % 2 == 1) nodes[n / 2] = 0.0;  // exact center root for odd n
    return 0;
}

// Single-pass statistics over `n` samples: out = {mean, min, max, stdev}.
// Sample stdev (ddof=1), 0 for n < 2. Returns 0 on success.
int bz_running_stats(const double* samples, int n, double* out) {
    if (!samples || n < 1 || !out) return 1;
    long double mean = 0.0L, m2 = 0.0L;
    double mn = samples[0], mx = samples[0];
    for (int i = 0; i < n; ++i) {
        const double v = samples[i];
        if (v < mn) mn = v;
        if (v > mx) mx = v;
        const long double d = v - mean;
        mean += d / (i + 1);
        m2 += d * (v - mean);
    }
    out[0] = (double)mean;
    out[1] = mn;
    out[2] = mx;
    out[3] = n > 1 ? (double)sqrtl(m2 / (n - 1)) : 0.0;
    return 0;
}

}  // extern "C"
