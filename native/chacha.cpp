// Native rand-0.3-compatible ChaCha20 mask expansion.
//
// The reference's ChaCha masking scheme expands each participant's uploaded
// seed into a full mask vector on both sides of the protocol
// (client/src/crypto/masking/chacha.rs:29-39 participant side, 56-77
// recipient side), using rand 0.3's ChaChaRng (key = first 8 seed words
// zero-padded, 128-bit block counter in state words 12..15, 20 rounds) and
// `gen_range(0, m)` for i64 (zone rejection on sequential next_u64 draws,
// next_u64 = (next_u32 << 32) | next_u32).
//
// The recipient re-expands *every* participant's seed at reveal time — the
// host-side hot loop when masks must be bit-exact with the reference. The
// numpy implementation in sda_tpu/chacha.py is the reference/fallback; the
// TPU kernel in sda_tpu/ops/chacha_kernel.py covers bulk device configs.
//
// Build: make -C native   (part of libsda_native.so)

#include <cstddef>
#include <cstdint>
#include <cstring>

namespace {

inline uint32_t rotl(uint32_t x, int k) { return (x << k) | (x >> (32 - k)); }

inline void quarter(uint32_t s[16], int a, int b, int c, int d) {
    // rand 0.3 chacha.rs quarter_round! (16/12/8/7 rotations)
    s[a] += s[b]; s[d] ^= s[a]; s[d] = rotl(s[d], 16);
    s[c] += s[d]; s[b] ^= s[c]; s[b] = rotl(s[b], 12);
    s[a] += s[b]; s[d] ^= s[a]; s[d] = rotl(s[d], 8);
    s[c] += s[d]; s[b] ^= s[c]; s[b] = rotl(s[b], 7);
}

void core(const uint32_t in[16], uint32_t out[16]) {
    uint32_t x[16];
    std::memcpy(x, in, sizeof(x));
    for (int r = 0; r < 10; ++r) {
        quarter(x, 0, 4, 8, 12);
        quarter(x, 1, 5, 9, 13);
        quarter(x, 2, 6, 10, 14);
        quarter(x, 3, 7, 11, 15);
        quarter(x, 0, 5, 10, 15);
        quarter(x, 1, 6, 11, 12);
        quarter(x, 2, 7, 8, 13);
        quarter(x, 3, 4, 9, 14);
    }
    for (int i = 0; i < 16; ++i) out[i] = x[i] + in[i];
}

struct Rng {
    uint32_t state[16];
    uint32_t buffer[16];
    int index = 16;

    explicit Rng(const uint32_t* seed_words, size_t n_words) {
        static const uint32_t kConst[4] = {0x61707865u, 0x3320646Eu,
                                           0x79622D32u, 0x6B206574u};
        std::memcpy(state, kConst, sizeof(kConst));
        for (int i = 0; i < 8; ++i)
            state[4 + i] = (static_cast<size_t>(i) < n_words) ? seed_words[i] : 0;
        std::memset(state + 12, 0, 4 * sizeof(uint32_t));
    }

    inline uint32_t next_u32() {
        if (index == 16) {
            core(state, buffer);
            index = 0;
            for (int i = 12; i < 16; ++i)  // 128-bit counter with carry
                if (++state[i] != 0) break;
        }
        return buffer[index++];
    }

    inline uint64_t next_u64() {
        uint64_t hi = next_u32();
        uint64_t lo = next_u32();
        return (hi << 32) | lo;
    }
};

}  // namespace

extern "C" {

// Expand n_seeds seeds (seed_words u32 words each, row-major) into
// [n_seeds, dimension] int64 masks in [0, modulus). Returns 0 on success,
// -1 on bad arguments (modulus < 1).
int sda_chacha_expand_masks(const uint32_t* seeds, size_t n_seeds,
                            size_t seed_words, size_t dimension,
                            uint64_t modulus, int64_t* out) {
    if (modulus == 0) return -1;
    const uint64_t max = ~0ull;
    const uint64_t zone = max - max % modulus;
    for (size_t s = 0; s < n_seeds; ++s) {
        Rng rng(seeds + s * seed_words, seed_words);
        int64_t* row = out + s * dimension;
        for (size_t i = 0; i < dimension; ++i) {
            uint64_t v;
            do {
                v = rng.next_u64();
            } while (v >= zone);
            row[i] = static_cast<int64_t>(v % modulus);
        }
    }
    return 0;
}

// Raw sequential u32 stream for one seed (test hook / general PRG use).
int sda_chacha_stream_u32(const uint32_t* seed, size_t seed_words,
                          size_t n_out, uint32_t* out) {
    Rng rng(seed, seed_words);
    for (size_t i = 0; i < n_out; ++i) out[i] = rng.next_u32();
    return 0;
}

}  // extern "C"
