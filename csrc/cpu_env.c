// Single-thread peak-envelope follower for the CPU anchor benchmark
// (benchmarks/cpu_anchor.py): the same branchy attack/release/hold
// recurrence as ops/dynamics.peak_envelope (reference
// Compressor.cpp:231-256), in plain C so the CPU baseline is measured
// at native speed like the reference's SIMD build, not at numpy-loop
// speed.  C ABI for ctypes.

#include <stdint.h>

void env_follow(const float* x, float* out, float* env, float* peak,
                int32_t* hold, int64_t channels, int64_t t,
                float tau_attack, float tau_release,
                int32_t hold_samples, float release_thresh) {
    for (int64_t c = 0; c < channels; ++c) {
        float e = env[c];
        float p = peak[c];
        int32_t h = hold[c];
        const float* xc = x + c * t;
        float* oc = out + c * t;
        for (int64_t n = 0; n < t; ++n) {
            float d = xc[n] - e;
            if (d < 0.0f) {
                if (h > 0) {
                    --h;
                } else {
                    float tau = (e > release_thresh) ? tau_release
                                                     : tau_attack;
                    e += tau * d;
                    p = e;
                }
            } else {
                e += tau_attack * d;
                if (e >= p) {
                    p = e;
                    h = hold_samples;
                }
            }
            oc[n] = e;
        }
        env[c] = e;
        peak[c] = p;
        hold[c] = h;
    }
}
