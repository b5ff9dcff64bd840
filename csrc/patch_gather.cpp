// Native patch-gather engine for the training input pipeline.
//
// The reference relies on batchgenerators' multiprocess CPU workers for
// data loading (SURVEY.md §2.7); our host-side equivalent is this small
// C++ core: extract padded, channel-last training patches from memmapped
// float32 case arrays ([C+1, X, Y, Z]; last channel = segmentation),
// parallelized across the batch with std::thread and zero Python/GIL
// involvement.  Called through ctypes (lifelong_nnunet_tpu/data/native.py).
//
// Out-of-volume regions are padded with 0 (data) / -1 (segmentation),
// matching data/sampler.py's numpy fallback exactly.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Job {
    const float* src;      // [C+1, X, Y, Z] contiguous
    int64_t shape[4];      // C+1, X, Y, Z
    int64_t origin[3];     // may be negative (padding)
    const int64_t* patch;  // [3]
    float* out_data;       // [px, py, pz, n_mod]
    int8_t* out_seg;       // [px, py, pz]
};

void gather_one(const Job& j) {
    const int64_t C1 = j.shape[0], X = j.shape[1], Y = j.shape[2], Z = j.shape[3];
    const int64_t n_mod = C1 - 1;
    const int64_t px = j.patch[0], py = j.patch[1], pz = j.patch[2];
    const int64_t plane = Y * Z, vol = X * plane;

    for (int64_t i = 0; i < px; ++i) {
        const int64_t sx = j.origin[0] + i;
        const bool x_ok = sx >= 0 && sx < X;
        for (int64_t jy = 0; jy < py; ++jy) {
            const int64_t sy = j.origin[1] + jy;
            const bool y_ok = x_ok && sy >= 0 && sy < Y;
            float* dd = j.out_data + ((i * py + jy) * pz) * n_mod;
            int8_t* ds = j.out_seg + (i * py + jy) * pz;
            if (!y_ok) {
                std::memset(dd, 0, sizeof(float) * pz * n_mod);
                std::memset(ds, 0xFF, pz);  // -1
                continue;
            }
            const int64_t z0 = j.origin[2];
            const int64_t lo = std::max<int64_t>(0, -z0);
            const int64_t hi = std::min<int64_t>(pz, Z - z0);
            // leading / trailing padding along z
            if (lo > 0) {
                std::memset(dd, 0, sizeof(float) * lo * n_mod);
                std::memset(ds, 0xFF, lo);
            }
            if (hi < pz) {
                std::memset(dd + hi * n_mod, 0, sizeof(float) * (pz - hi) * n_mod);
                std::memset(ds + hi, 0xFF, pz - hi);
            }
            if (lo >= hi) continue;
            const int64_t base = sx * plane + sy * Z + z0;
            // data channels -> channels-last
            for (int64_t c = 0; c < n_mod; ++c) {
                const float* sp = j.src + c * vol + base;
                float* dp = dd + c;
                for (int64_t k = lo; k < hi; ++k) dp[k * n_mod] = sp[k];
            }
            // segmentation channel (stored as float in the .npy)
            const float* sg = j.src + n_mod * vol + base;
            for (int64_t k = lo; k < hi; ++k)
                ds[k] = static_cast<int8_t>(sg[k]);
        }
    }
}

}  // namespace

extern "C" {

// case_ptrs:   [B] pointers to per-sample case arrays
// case_shapes: [B*4] (C+1, X, Y, Z) per sample
// origins:     [B*3] signed patch origins
// patch:       [3]
// out_data:    [B, px, py, pz, n_mod] float32
// out_seg:     [B, px, py, pz] int8
void gather_patches(const float* const* case_ptrs, const int64_t* case_shapes,
                    const int64_t* origins, const int64_t* patch,
                    int64_t num_samples, int64_t n_threads,
                    float* out_data, int8_t* out_seg) {
    const int64_t px = patch[0], py = patch[1], pz = patch[2];
    std::vector<Job> jobs(num_samples);
    int64_t n_mod = case_shapes[0] - 1;
    const int64_t dstride = px * py * pz * n_mod;
    const int64_t sstride = px * py * pz;
    for (int64_t b = 0; b < num_samples; ++b) {
        Job& j = jobs[b];
        j.src = case_ptrs[b];
        for (int d = 0; d < 4; ++d) j.shape[d] = case_shapes[b * 4 + d];
        for (int d = 0; d < 3; ++d) j.origin[d] = origins[b * 3 + d];
        j.patch = patch;
        j.out_data = out_data + b * dstride;
        j.out_seg = out_seg + b * sstride;
    }
    if (n_threads <= 1 || num_samples == 1) {
        for (auto& j : jobs) gather_one(j);
        return;
    }
    const int64_t nt = std::min<int64_t>(n_threads, num_samples);
    std::vector<std::thread> threads;
    std::atomic<int64_t>* counter = new std::atomic<int64_t>(0);
    for (int64_t t = 0; t < nt; ++t) {
        threads.emplace_back([&jobs, counter]() {
            while (true) {
                int64_t i = counter->fetch_add(1);
                if (i >= static_cast<int64_t>(jobs.size())) break;
                gather_one(jobs[i]);
            }
        });
    }
    for (auto& th : threads) th.join();
    delete counter;
}

}  // extern "C"
