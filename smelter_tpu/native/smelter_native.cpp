// Native acceleration for host-side weight preprocessing.
//
// The reference leans on Apple's native stack for exactly this work:
// BNNS multi-step tensor transpose (reference:
// Sources/Smelter/Extensions/Foundation/Array+Extensions.swift:3-49) with a
// scalar 4-deep-loop fallback (:52-94, "the CPU hot loop"), and vImage fp16
// conversion (Sources/Smelter/Float16.swift:17-77). This is the TPU build's
// equivalent: multithreaded C++ for weight relayout (OIHW -> HWIO for
// NHWC conv, OIHW -> OHWI parity with the reference's swizzle) and
// per-channel int8 quantization, loaded via ctypes with a numpy fallback.
//
// Build: native/build.sh (g++ -O3 -shared). No external dependencies.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run fn(i) for i in [0, n) across up to `threads` workers.
template <typename F>
void parallel_for(int64_t n, F fn) {
    unsigned hw = std::thread::hardware_concurrency();
    int64_t n_threads = std::min<int64_t>(hw ? hw : 1, n);
    if (n_threads <= 1) {
        for (int64_t i = 0; i < n; ++i) fn(i);
        return;
    }
    std::atomic<int64_t> next(0);
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int64_t t = 0; t < n_threads; ++t) {
        pool.emplace_back([&]() {
            for (;;) {
                int64_t i = next.fetch_add(1);
                if (i >= n) return;
                fn(i);
            }
        });
    }
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// OIHW -> HWIO (XLA/TPU-preferred conv weight layout for NHWC activations).
// Per spatial position (h, w) this is an O x I matrix transpose (src row
// stride I*H*W, col stride H*W); done in 32x32 cache blocks per thread.
void relayout_oihw_to_hwio(const float* src, float* dst, int64_t O, int64_t I,
                           int64_t H, int64_t W) {
    const int64_t HW = H * W;
    const int64_t B = 32;
    parallel_for(HW, [=](int64_t hw) {
        const float* s = src + hw;            // element (o, i) at s[(o*I+i)*HW]
        float* d = dst + hw * I * O;          // element (i, o) at d[i*O+o]
        for (int64_t ib = 0; ib < I; ib += B) {
            int64_t ie = std::min(I, ib + B);
            for (int64_t ob = 0; ob < O; ob += B) {
                int64_t oe = std::min(O, ob + B);
                for (int64_t i = ib; i < ie; ++i) {
                    float* drow = d + i * O;
                    const float* scol = s + i * HW;
                    for (int64_t o = ob; o < oe; ++o) {
                        drow[o] = scol[o * I * HW];
                    }
                }
            }
        }
    });
}

// OIHW -> OHWI (the reference's on-device layout, ONNX2MPS.py:73-75 swizzle
// [0,2,3,1]); optional spatial flip for transposed conv (ONNX2MPS.py:54-67).
void relayout_oihw_to_ohwi(const float* src, float* dst, int64_t O, int64_t I,
                           int64_t H, int64_t W, int flip_spatial) {
    parallel_for(O, [=](int64_t o) {
        for (int64_t i = 0; i < I; ++i) {
            const float* s = src + ((o * I + i) * H) * W;
            for (int64_t h = 0; h < H; ++h) {
                int64_t hs = flip_spatial ? (H - 1 - h) : h;
                for (int64_t w = 0; w < W; ++w) {
                    int64_t ws = flip_spatial ? (W - 1 - w) : w;
                    dst[((o * H + h) * W + w) * I + i] = s[hs * W + ws];
                }
            }
        }
    });
}

// Symmetric per-channel int8 quantization. w viewed as (C, inner) row-major;
// one scale per channel c: s = amax/127 (1.0 if the channel is all-zero),
// q = clip(round(w/s), -127, 127).
void quantize_per_channel_int8(const float* w, int8_t* q, float* scales,
                               int64_t C, int64_t inner) {
    parallel_for(C, [=](int64_t c) {
        const float* row = w + c * inner;
        float amax = 0.f;
        for (int64_t i = 0; i < inner; ++i) amax = std::max(amax, std::fabs(row[i]));
        float s = amax / 127.0f;
        if (s == 0.f) s = 1.0f;
        scales[c] = s;
        float inv = 1.0f / s;
        int8_t* out = q + c * inner;
        for (int64_t i = 0; i < inner; ++i) {
            float v = std::nearbyint(row[i] * inv);
            v = std::max(-127.f, std::min(127.f, v));
            out[i] = static_cast<int8_t>(v);
        }
    });
}

// fp32 -> fp16 (IEEE binary16) bulk conversion with round-to-nearest-even —
// parity with the reference's vImage path (Float16.swift:53-77).
static uint16_t f32_to_f16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t exp = static_cast<int32_t>((x >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = x & 0x7FFFFFu;
    if (exp >= 31) return static_cast<uint16_t>(sign | 0x7C00u | (((x & 0x7F800000u) == 0x7F800000u && mant) ? 0x200u : 0));
    if (exp <= 0) {
        if (exp < -10) return static_cast<uint16_t>(sign);
        mant |= 0x800000u;
        uint32_t shift = static_cast<uint32_t>(14 - exp);
        uint32_t half = mant >> shift;
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t mid = 1u << (shift - 1);
        if (rem > mid || (rem == mid && (half & 1))) half++;
        return static_cast<uint16_t>(sign | half);
    }
    uint32_t half = (static_cast<uint32_t>(exp) << 10) | (mant >> 13);
    uint32_t rem = mant & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
    return static_cast<uint16_t>(sign | half);
}

void convert_f32_to_f16(const float* src, uint16_t* dst, int64_t n) {
    const int64_t chunk = 1 << 16;
    int64_t n_chunks = (n + chunk - 1) / chunk;
    parallel_for(n_chunks, [=](int64_t c) {
        int64_t lo = c * chunk, hi = std::min(n, lo + chunk);
        for (int64_t i = lo; i < hi; ++i) dst[i] = f32_to_f16(src[i]);
    });
}

// Serving-ingest hot loop: uint8 HWC image batch -> normalized f32, NCHW
// or NHWC. out = px * scale[c] + bias[c] with scale = 1/(255*std) and
// bias = -mean/std precomputed by the caller. One thread per image.
void preprocess_u8_images(const uint8_t* src, float* dst, int64_t N,
                          int64_t H, int64_t W, int64_t C,
                          const float* scale, const float* bias,
                          int to_nchw) {
    int64_t hw = H * W;
    parallel_for(N, [=](int64_t n) {
        const uint8_t* im = src + n * hw * C;
        float* out = dst + n * hw * C;
        if (to_nchw) {
            for (int64_t p = 0; p < hw; ++p)
                for (int64_t c = 0; c < C; ++c)
                    out[c * hw + p] = im[p * C + c] * scale[c] + bias[c];
        } else {
            for (int64_t i = 0; i < hw * C; ++i) {
                int64_t c = i % C;
                out[i] = im[i] * scale[c] + bias[c];
            }
        }
    });
}

// ONNX 4-bit unpack: two elements per byte, low nibble first. signed=1
// sign-extends two's-complement nibbles (int4), else uint4 values 0..15.
// The single-pass C++ loop avoids the numpy stack/reshape intermediates
// on multi-GB LLM weight files.
void unpack_int4(const uint8_t* src, int8_t* dst, int64_t count, int signed_) {
    const int64_t chunk = 1 << 16;  // elements
    int64_t n_chunks = (count + chunk - 1) / chunk;
    parallel_for(n_chunks, [=](int64_t ci) {
        int64_t lo = ci * chunk, hi = std::min(count, lo + chunk);
        for (int64_t i = lo; i < hi; ++i) {
            uint8_t b = src[i >> 1];
            int8_t v = static_cast<int8_t>((i & 1) ? (b >> 4) : (b & 0xF));
            if (signed_ && v > 7) v -= 16;
            dst[i] = v;
        }
    });
}

int smelter_native_abi_version() { return 2; }

}  // extern "C"
