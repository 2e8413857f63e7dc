// Native batch codec for the SDA wire format: zigzag + LEB128 varints.
//
// The reference encodes every share through the `integer-encoding` Rust
// crate inside sealed boxes (client/src/crypto/encryption/sodium.rs:33-46,
// 72-92). At bulk scale (millions of shares per participation) the host-side
// codec is hot; this C++ implementation is bound via ctypes with the numpy
// implementation in sda_tpu/utils/varint.py as a fallback.
//
// Build: make -C native   (produces libsda_native.so)

#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// Encode n signed 64-bit values; out must hold >= 10*n bytes.
// Returns the number of bytes written.
size_t sda_varint_encode(const int64_t* vals, size_t n, uint8_t* out) {
    uint8_t* p = out;
    for (size_t i = 0; i < n; ++i) {
        uint64_t z = (static_cast<uint64_t>(vals[i]) << 1) ^
                     static_cast<uint64_t>(vals[i] >> 63);
        while (z >= 0x80) {
            *p++ = static_cast<uint8_t>(z) | 0x80;
            z >>= 7;
        }
        *p++ = static_cast<uint8_t>(z);
    }
    return static_cast<size_t>(p - out);
}

// Decode back-to-back varints until the buffer is exhausted.
// Returns the number of values written to out (capacity max_out), or
// SIZE_MAX on malformed input (truncated stream, overlong varint, overflow).
size_t sda_varint_decode(const uint8_t* data, size_t len, int64_t* out,
                         size_t max_out) {
    size_t count = 0;
    size_t i = 0;
    while (i < len) {
        if (count >= max_out) return SIZE_MAX;
        uint64_t z = 0;
        int shift = 0;
        for (;;) {
            if (i >= len) return SIZE_MAX;  // truncated
            uint8_t byte = data[i++];
            if (shift >= 64) return SIZE_MAX;  // overlong for i64
            z |= static_cast<uint64_t>(byte & 0x7F) << shift;
            if (!(byte & 0x80)) break;
            shift += 7;
        }
        out[count++] = static_cast<int64_t>(z >> 1) ^
                       -static_cast<int64_t>(z & 1);
    }
    return count;
}

// Upper bound on decoded count for buffer sizing: one value per byte.
size_t sda_varint_max_count(size_t len) { return len; }

// Count the varints in a stream without decoding values.
// Returns the count, or SIZE_MAX if the stream is malformed (truncated or
// overlong for i64). Used to distinguish "well-formed but wrong length"
// from "malformed" after a bounded decode overflows its buffer.
size_t sda_varint_count(const uint8_t* data, size_t len) {
    size_t count = 0;
    size_t i = 0;
    while (i < len) {
        int shift = 0;
        for (;;) {
            if (i >= len) return SIZE_MAX;  // truncated
            uint8_t byte = data[i++];
            if (shift >= 64) return SIZE_MAX;  // overlong for i64
            if (!(byte & 0x80)) break;
            shift += 7;
        }
        ++count;
    }
    return count;
}

}  // extern "C"
