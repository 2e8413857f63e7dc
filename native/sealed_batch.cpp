// Batched sealed-box opening for the clerk hot loop.
//
// The reference clerk opens every participation's sealed box sequentially
// (client/src/clerk.rs:78-82, with the FIXME at 71-72 about streaming this
// loop). Python threads help only partially — each box still pays ctypes
// call overhead and GIL re-acquisition per box. This native path opens a
// whole clerking job in ONE call: a std::thread pool runs
// crypto_box_seal_open + the varint decode per box entirely outside the
// interpreter, writing decoded i64 shares straight into a caller-provided
// matrix.
//
// libsodium is resolved with dlopen (same C library the reference consumes
// through sodiumoxide, so ciphertexts stay wire-compatible); the varint
// decode matches sda_varint_decode in varint.cpp.

#include <atomic>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <dlfcn.h>

extern "C" {
size_t sda_varint_decode(const uint8_t* data, size_t len, int64_t* out,
                         size_t max_out);
}

namespace {

constexpr size_t kSealBytes = 48;  // crypto_box_SEALBYTES

using seal_open_fn = int (*)(unsigned char*, const unsigned char*,
                             unsigned long long, const unsigned char*,
                             const unsigned char*);

seal_open_fn load_seal_open() {
    static seal_open_fn fn = []() -> seal_open_fn {
        void* lib = dlopen("libsodium.so.23", RTLD_NOW | RTLD_GLOBAL);
        if (!lib) lib = dlopen("libsodium.so", RTLD_NOW | RTLD_GLOBAL);
        if (!lib) return nullptr;
        auto init = reinterpret_cast<int (*)()>(dlsym(lib, "sodium_init"));
        if (init && init() < 0) return nullptr;
        return reinterpret_cast<seal_open_fn>(
            dlsym(lib, "crypto_box_seal_open"));
    }();
    return fn;
}

}  // namespace

extern "C" {

// Open `count` sealed boxes and varint-decode each into row i of `out`
// (row stride `max_vals` int64 slots). `boxes` is a contiguous buffer with
// per-box offsets `offs[i]..offs[i+1]`. `out_lens[i]` receives the decoded
// share count, or SIZE_MAX if that box failed to open / decode (the caller
// maps it to the protocol's Invalid, matching the sequential path).
// Returns 0, or -1 if libsodium is unavailable.
int sda_sealed_open_batch(const uint8_t* boxes, const size_t* offs,
                          size_t count, const uint8_t* pk, const uint8_t* sk,
                          int64_t* out, size_t max_vals, size_t* out_lens,
                          int n_threads) {
    seal_open_fn seal_open = load_seal_open();
    if (!seal_open) return -1;
    if (n_threads < 1) n_threads = 1;
    std::atomic<size_t> next(0);

    auto worker = [&]() {
        std::vector<uint8_t> plain;
        for (;;) {
            size_t i = next.fetch_add(1);
            if (i >= count) return;
            const uint8_t* box = boxes + offs[i];
            size_t blen = offs[i + 1] - offs[i];
            if (blen < kSealBytes) {
                out_lens[i] = SIZE_MAX;
                continue;
            }
            plain.resize(blen - kSealBytes);
            if (seal_open(plain.data(), box,
                          static_cast<unsigned long long>(blen), pk, sk) != 0) {
                out_lens[i] = SIZE_MAX;
                continue;
            }
            out_lens[i] = sda_varint_decode(plain.data(), plain.size(),
                                            out + i * max_vals, max_vals);
        }
    };

    if (n_threads == 1 || count < 2) {
        worker();
    } else {
        std::vector<std::thread> pool;
        size_t spawn = std::min<size_t>(n_threads, count);
        pool.reserve(spawn);
        for (size_t t = 0; t < spawn; ++t) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
    }
    return 0;
}

}  // extern "C"
