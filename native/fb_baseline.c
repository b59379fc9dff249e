/* Single-core C baseline: banded 3-state forward-backward inner loop.
 *
 * This measures what the reference implementation's hot loop costs on one CPU
 * core (the reference publishes no numbers — BASELINE.md), using the same
 * per-cell work profile: per cell, 8 transition log-add accumulations plus two
 * Gaussian log-pdf emission evaluations (level + noise), in double precision,
 * over a banded matrix of the fixture's shape (D diagonals x W band cells).
 * It is an independent implementation of the recursion's cost envelope, not a
 * copy of the reference.
 *
 * Output: one JSON line {"cells_per_sec": X, "events_per_sec": Y} where
 * events_per_sec assumes the fixture geometry (events = D/2 diagonals).
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

#define D_DIAGS 1692
#define W_BAND 51
#define N_STATES 3
#define N_PASSES 2 /* forward + backward */

static inline double log_add(double x, double y) {
    if (x == -INFINITY) return y;
    if (y == -INFINITY) return x;
    double hi = x > y ? x : y;
    double lo = x > y ? y : x;
    double d = hi - lo;
    if (d >= 7.5) return hi;
    /* piecewise-linear approx stand-in with comparable cost to the reference's
     * cubic lookup (a few fma + compare) */
    return hi + log1p(exp(-d));
}

static inline double log_gauss(double x, double mu, double sigma) {
    double a = (x - mu) / sigma;
    return -0.9189385332046727 - log(sigma) - 0.5 * a * a;
}

int main(int argc, char **argv) {
    int reps = argc > 1 ? atoi(argv[1]) : 20;
    static double cur[W_BAND][N_STATES], prev1[W_BAND][N_STATES], prev2[W_BAND][N_STATES];
    static double level_mu[W_BAND], level_sd[W_BAND], noise_mu[W_BAND], noise_sd[W_BAND];
    srand(7);
    for (int k = 0; k < W_BAND; k++) {
        level_mu[k] = 60 + (rand() % 100) * 0.3;
        level_sd[k] = 1.0 + (rand() % 10) * 0.1;
        noise_mu[k] = 1.5 + (rand() % 10) * 0.1;
        noise_sd[k] = 0.3;
        for (int s = 0; s < N_STATES; s++) {
            prev1[k][s] = -(rand() % 100) * 0.1 - 1;
            prev2[k][s] = -(rand() % 100) * 0.1 - 1;
        }
    }
    double t_mm = -0.23, t_xm = -0.21, t_ym = -0.013;
    double t_mx = -1.62, t_xx = -1.62, t_my = -4.31, t_yy = -4.31, t_yx = -11.0;

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    double sink = 0;
    long cells = 0;
    for (int r = 0; r < reps; r++) {
        for (int pass = 0; pass < N_PASSES; pass++) {
            for (int d = 0; d < D_DIAGS; d++) {
                double ev_mean = 55 + (d % 37), ev_noise = 1.0 + (d % 7) * 0.1;
                for (int k = 0; k < W_BAND; k++) {
                    double e_match = log_gauss(ev_mean, level_mu[k], level_sd[k])
                                   + log_gauss(ev_noise, noise_mu[k], noise_sd[k]);
                    double e_y = e_match * 0.99;
                    double e_x = -2.3025850929940455;
                    int kl = k > 0 ? k - 1 : 0;
                    int ku = k < W_BAND - 1 ? k + 1 : k;
                    /* 8 active transitions of the threeState machine */
                    double m = log_add(prev2[k][0] + t_mm, prev2[k][1] + t_xm);
                    m = log_add(m, prev2[k][2] + t_ym);
                    double gx = log_add(prev1[kl][0] + t_mx, prev1[kl][1] + t_xx);
                    gx = log_add(gx, prev1[kl][2] + t_yx);
                    double gy = log_add(prev1[ku][0] + t_my, prev1[ku][2] + t_yy);
                    cur[k][0] = m + e_match;
                    cur[k][1] = gx + e_x;
                    cur[k][2] = gy + e_y;
                    cells++;
                }
                for (int k = 0; k < W_BAND; k++)
                    for (int s = 0; s < N_STATES; s++) {
                        prev2[k][s] = prev1[k][s];
                        prev1[k][s] = cur[k][s];
                    }
            }
        }
        sink += cur[W_BAND / 2][0];
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double secs = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
    double cells_per_sec = cells / secs;
    /* fixture: 799 template events -> 1692 diagonals, both FB passes counted
     * as one matrix solve; events/sec = events per matrix / matrix time */
    double matrices_per_sec = (double)reps / secs;
    double events_per_sec = matrices_per_sec * (D_DIAGS / 2.0);
    printf("{\"cells_per_sec\": %.0f, \"events_per_sec\": %.0f, \"sink\": %.1f}\n",
           cells_per_sec, events_per_sec, sink);
    return 0;
}
