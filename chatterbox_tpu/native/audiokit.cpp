// audiokit: native host-side audio ops for chatterbox_tpu.
//
// Replaces the native audio dependencies of the reference stack
// (librosa/soxr resampling, libsndfile decode — SURVEY.md §2c) with a
// self-contained C++ implementation exposed over a C ABI (loaded via ctypes;
// pybind11 is not available in this environment).
//
//   * band-limited polyphase resampling (Kaiser-windowed sinc)
//   * float -> int16 PCM conversion with clamping
//   * equal-power crossfade mixing
//
// The TPU never sees this code; it runs on the host serving path where the
// Python/numpy equivalents would burn scarce host CPU (one core per VM).
//
// Build: make -C chatterbox_tpu/native   (produces libaudiokit.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- pcm16
void ck_float_to_pcm16(const float* in, int64_t n, int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        out[i] = (int16_t)lrintf(v * 32767.0f);
    }
}

void ck_pcm16_to_float(const int16_t* in, int64_t n, float* out) {
    const float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * k;
}

// ---------------------------------------------------------------- crossfade
// out[i] = prev_tail[i]*cos(t) + cur_head[i]*sin(t),  t = i/(n-1) * pi/2
void ck_crossfade_mix(const float* prev_tail, const float* cur_head, int64_t n,
                      float* out) {
    if (n <= 0) return;
    const double step = (n > 1) ? (M_PI / 2.0) / (double)(n - 1) : 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double t = step * (double)i;
        out[i] = (float)(prev_tail[i] * cos(t) + cur_head[i] * sin(t));
    }
}

// ---------------------------------------------------------------- resample
static double bessel_i0(double x) {
    // series expansion; converges fast for the beta range we use
    double sum = 1.0, term = 1.0;
    for (int k = 1; k < 32; ++k) {
        term *= (x / (2.0 * k)) * (x / (2.0 * k));
        sum += term;
        if (term < 1e-12 * sum) break;
    }
    return sum;
}

// Polyphase resampling by rational factor up/down with a Kaiser-windowed
// sinc prototype. Returns the number of output samples written;
// out must have capacity ceil(n*up/down)+1.
int64_t ck_resample_poly(const float* in, int64_t n, int32_t up, int32_t down,
                         float* out) {
    if (up == down) {
        memcpy(out, in, sizeof(float) * (size_t)n);
        return n;
    }
    const int kTapsPerPhase = 24;           // half-width in input samples
    const double beta = 8.6;                // Kaiser beta (~ -90 dB stopband)
    const double cutoff = (up > down) ? 1.0 / up : 1.0 / down;  // of prototype

    const int64_t half = (int64_t)kTapsPerPhase * (up > down ? up : down);
    const int64_t ntaps = 2 * half + 1;

    // prototype lowpass at combined rate n*up
    std::vector<double> h((size_t)ntaps);
    const double i0b = bessel_i0(beta);
    for (int64_t i = 0; i < ntaps; ++i) {
        double m = (double)(i - half);
        double sinc = (m == 0.0) ? cutoff : sin(M_PI * cutoff * m) / (M_PI * m);
        double w = (double)i / (double)(ntaps - 1) * 2.0 - 1.0;  // [-1, 1]
        double kaiser = bessel_i0(beta * sqrt(1.0 - w * w)) / i0b;
        h[(size_t)i] = sinc * kaiser * (double)up;
    }

    const int64_t n_out = (n * up + down - 1) / down;
    for (int64_t j = 0; j < n_out; ++j) {
        // output sample j sits at combined-rate index j*down
        const int64_t pos = j * down;
        double acc = 0.0;
        // combined index of contributing input sample i is i*up
        // need |pos - i*up| <= half
        int64_t i_lo = (pos - half + up - 1) / up;
        int64_t i_hi = (pos + half) / up;
        if (i_lo < 0) i_lo = 0;
        if (i_hi >= n) i_hi = n - 1;
        for (int64_t i = i_lo; i <= i_hi; ++i) {
            acc += (double)in[i] * h[(size_t)(pos - i * up + half)];
        }
        out[j] = (float)acc;
    }
    return n_out;
}

}  // extern "C"
