// fresnel_native: C++ host-side runtime for fresnel-tpu.
//
// The reference keeps its performance-critical host code native
// (src/core/*, C++20); the TPU rebuild's device math lives in XLA/Pallas,
// so the native layer owns what stays on the host: Gaussian interchange IO
// (14-float binary + 3DGS PLY), image resampling, and a multi-threaded
// binary-cache prefetcher for the training data pipeline.  Exposed through a
// plain C ABI consumed via ctypes (fresnel_tpu/native/__init__.py), with a
// pure-Python fallback when the library is not built.
//
// Build: make -C fresnel_tpu/native   (or python -m fresnel_tpu.native.build)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ----------------------------------------------------------------------
// Gaussian binary IO: N x 14 little-endian float32
// [pos3, scale3, quat_wxyz4, rgb3, opacity1]
// ----------------------------------------------------------------------

// Returns number of Gaussians read, or -1. Caller provides capacity floats.
long fresnel_load_gaussians(const char* path, float* out, long capacity) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long bytes = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    long n = bytes / (14 * (long)sizeof(float));
    long want = n * 14;
    if (want > capacity) {
        n = capacity / 14;
        want = n * 14;
    }
    long got = (long)std::fread(out, sizeof(float), (size_t)want, f);
    std::fclose(f);
    return got / 14;
}

long fresnel_count_gaussians(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long bytes = std::ftell(f);
    std::fclose(f);
    return bytes / (14 * (long)sizeof(float));
}

int fresnel_save_gaussians(const char* path, const float* data, long n) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    size_t wrote = std::fwrite(data, sizeof(float), (size_t)(n * 14), f);
    std::fclose(f);
    return wrote == (size_t)(n * 14) ? 0 : -1;
}

// ----------------------------------------------------------------------
// 3DGS PLY writer (log scales, SH-DC color, logit opacity) — byte-identical
// to the Python writer in fresnel_tpu/core/io.py.
// ----------------------------------------------------------------------

static const float SH_C0F = 0.28209479177387814f;

int fresnel_save_ply(const char* path, const float* flat, long n) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    static const char* props[] = {
        "x", "y", "z", "scale_0", "scale_1", "scale_2",
        "rot_0", "rot_1", "rot_2", "rot_3",
        "f_dc_0", "f_dc_1", "f_dc_2", "opacity"};
    std::fprintf(f, "ply\nformat binary_little_endian 1.0\n"
                    "element vertex %ld\n", n);
    for (const char* p : props) std::fprintf(f, "property float %s\n", p);
    std::fprintf(f, "end_header\n");

    std::vector<float> row(14);
    for (long i = 0; i < n; i++) {
        const float* g = flat + i * 14;
        for (int k = 0; k < 3; k++) row[k] = g[k];
        for (int k = 3; k < 6; k++)
            row[k] = std::log(std::max(g[k], 1e-7f));
        for (int k = 6; k < 10; k++) row[k] = g[k];
        for (int k = 10; k < 13; k++)
            row[k] = (g[k] - 0.5f) / SH_C0F;  // float32 math: byte parity
                                              // with the numpy writer
        float op = g[13];
        if (op < 1e-7f) op = 1e-7f;
        if (op > 1.0f - 1e-7f) op = 1.0f - 1e-7f;
        row[13] = std::log(op / (1.0f - op));
        std::fwrite(row.data(), sizeof(float), 14, f);
    }
    std::fclose(f);
    return 0;
}

// ----------------------------------------------------------------------
// Bilinear image resize, float32 HWC, multi-threaded over rows.
// ----------------------------------------------------------------------

void fresnel_resize_bilinear(const float* src, long sh, long sw, long c,
                             float* dst, long dh, long dw) {
    const float sy = (float)sh / (float)dh;
    const float sx = (float)sw / (float)dw;
    long n_threads = (long)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n_threads > dh) n_threads = dh;

    auto work = [&](long y0, long y1) {
        for (long y = y0; y < y1; y++) {
            float fy = ((float)y + 0.5f) * sy - 0.5f;
            long iy0 = (long)std::floor(fy);
            float wy = fy - (float)iy0;
            long iy1 = iy0 + 1;
            if (iy0 < 0) iy0 = 0;
            if (iy1 < 0) iy1 = 0;
            if (iy0 >= sh) iy0 = sh - 1;
            if (iy1 >= sh) iy1 = sh - 1;
            for (long x = 0; x < dw; x++) {
                float fx = ((float)x + 0.5f) * sx - 0.5f;
                long ix0 = (long)std::floor(fx);
                float wx = fx - (float)ix0;
                long ix1 = ix0 + 1;
                if (ix0 < 0) ix0 = 0;
                if (ix1 < 0) ix1 = 0;
                if (ix0 >= sw) ix0 = sw - 1;
                if (ix1 >= sw) ix1 = sw - 1;
                const float* p00 = src + (iy0 * sw + ix0) * c;
                const float* p01 = src + (iy0 * sw + ix1) * c;
                const float* p10 = src + (iy1 * sw + ix0) * c;
                const float* p11 = src + (iy1 * sw + ix1) * c;
                float* out = dst + (y * dw + x) * c;
                for (long k = 0; k < c; k++) {
                    float top = p00[k] * (1 - wx) + p01[k] * wx;
                    float bot = p10[k] * (1 - wx) + p11[k] * wx;
                    out[k] = top * (1 - wy) + bot * wy;
                }
            }
        }
    };

    std::vector<std::thread> threads;
    long per = (dh + n_threads - 1) / n_threads;
    for (long t = 0; t < n_threads; t++) {
        long y0 = t * per;
        long y1 = y0 + per > dh ? dh : y0 + per;
        if (y0 >= y1) break;
        threads.emplace_back(work, y0, y1);
    }
    for (auto& th : threads) th.join();
}

// ----------------------------------------------------------------------
// Threaded batch prefetcher for float32 cache files (features/depth bins).
// Loads `count` files concurrently into one contiguous buffer.
// Returns 0 on success, index+1 of the first failing file otherwise.
// ----------------------------------------------------------------------

int fresnel_batch_load(const char** paths, long count, long floats_per_file,
                       float* out) {
    std::atomic<long> next(0);
    std::atomic<int> failed(0);
    long n_threads = (long)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n_threads > count) n_threads = count;

    auto work = [&]() {
        for (;;) {
            long i = next.fetch_add(1);
            if (i >= count) return;
            FILE* f = std::fopen(paths[i], "rb");
            if (!f) {
                int expect = 0;
                failed.compare_exchange_strong(expect, (int)(i + 1));
                continue;
            }
            size_t got = std::fread(out + i * floats_per_file, sizeof(float),
                                    (size_t)floats_per_file, f);
            std::fclose(f);
            if (got != (size_t)floats_per_file) {
                int expect = 0;
                failed.compare_exchange_strong(expect, (int)(i + 1));
            }
        }
    };

    std::vector<std::thread> threads;
    for (long t = 0; t < n_threads; t++) threads.emplace_back(work);
    for (auto& th : threads) th.join();
    return failed.load();
}

// ----------------------------------------------------------------------
// Asynchronous batch prefetcher: the input-pipeline executor.
//
// A training step on the TPU leaves the host idle; the reference hides
// input latency with torch DataLoader worker *processes*
// (reference: scripts/training/train_gaussian_decoder.py:1738-1767,
// num_workers=4).  Here the equivalent is a native job object: submit()
// starts threads that read many float32 cache files into one contiguous
// batch buffer at caller-specified offsets, wait() joins and hands the
// buffer to Python (zero-copy via ctypes/numpy), free() releases it.
// The streaming dataset double-buffers: batch i+1 loads while the jitted
// step consumes batch i.
// ----------------------------------------------------------------------

struct PrefetchJob {
    std::vector<std::string> paths;
    std::vector<long> file_floats;   // floats to read per file
    std::vector<long> out_offsets;   // float offset of each file's region
    float* buf = nullptr;
    long total_floats = 0;
    std::atomic<long> next{0};
    std::atomic<int> failed{0};      // 0 ok, else index+1 of first failure
    std::atomic<long> remaining{0};  // files left; 0 => done
    std::vector<std::thread> threads;
};

static void prefetch_worker(PrefetchJob* job) {
    long count = (long)job->paths.size();
    for (;;) {
        long i = job->next.fetch_add(1);
        if (i >= count) return;
        FILE* f = std::fopen(job->paths[i].c_str(), "rb");
        size_t want = (size_t)job->file_floats[i];
        size_t got = 0;
        if (f) {
            got = std::fread(job->buf + job->out_offsets[i], sizeof(float),
                             want, f);
            std::fclose(f);
        }
        if (got != want) {
            int expect = 0;
            job->failed.compare_exchange_strong(expect, (int)(i + 1));
        }
        job->remaining.fetch_sub(1);
    }
}

void* fresnel_prefetch_submit(const char** paths, long n_files,
                              const long* file_floats,
                              const long* out_offsets,
                              long total_floats, long n_threads) {
    if (n_files <= 0 || total_floats <= 0) return nullptr;
    PrefetchJob* job = new PrefetchJob();
    job->paths.reserve((size_t)n_files);
    for (long i = 0; i < n_files; i++) {
        // Validate regions up front so worker threads cannot write out of
        // bounds whatever the caller passed.
        if (out_offsets[i] < 0 || file_floats[i] < 0 ||
            out_offsets[i] + file_floats[i] > total_floats) {
            delete job;
            return nullptr;
        }
        job->paths.emplace_back(paths[i]);
    }
    job->file_floats.assign(file_floats, file_floats + n_files);
    job->out_offsets.assign(out_offsets, out_offsets + n_files);
    job->total_floats = total_floats;
    job->buf = (float*)std::malloc((size_t)total_floats * sizeof(float));
    if (!job->buf) {
        delete job;
        return nullptr;
    }
    job->remaining.store(n_files);
    long hw = (long)std::thread::hardware_concurrency();
    if (hw < 1) hw = 1;
    if (n_threads < 1) n_threads = hw;
    if (n_threads > n_files) n_threads = n_files;
    for (long t = 0; t < n_threads; t++)
        job->threads.emplace_back(prefetch_worker, job);
    return job;
}

int fresnel_prefetch_ready(void* handle) {
    if (!handle) return -1;
    return ((PrefetchJob*)handle)->remaining.load() == 0 ? 1 : 0;
}

// Blocks until the job completes. Returns the filled buffer, or NULL if any
// file failed (call fresnel_prefetch_error for which).
float* fresnel_prefetch_wait(void* handle) {
    if (!handle) return nullptr;
    PrefetchJob* job = (PrefetchJob*)handle;
    for (auto& th : job->threads)
        if (th.joinable()) th.join();
    job->threads.clear();
    return job->failed.load() == 0 ? job->buf : nullptr;
}

int fresnel_prefetch_error(void* handle) {
    if (!handle) return -1;
    return ((PrefetchJob*)handle)->failed.load();
}

void fresnel_prefetch_free(void* handle) {
    if (!handle) return;
    PrefetchJob* job = (PrefetchJob*)handle;
    for (auto& th : job->threads)
        if (th.joinable()) th.join();
    std::free(job->buf);
    delete job;
}

// Version tag for the ctypes layer to sanity-check.
int fresnel_native_version() { return 2; }

}  // extern "C"
