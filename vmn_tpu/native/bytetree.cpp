// Native byte-tree array codec.
//
// Host-side hot path of the framework: serializing/parsing byte trees
// of N-element group arrays (N up to 10^6+) for bulletin-board messages
// and nizkp transcript files.  The reference's equivalent throughput
// path is VCR's ByteTree* + LargeIntegerArray native backing
// (reference: SURVEY.md §2.4 eio).
//
// Layout handled here: node(leaf(e_0), ..., leaf(e_{n-1})) with all
// leaves of equal byte length eb:
//
//   00 | be32(n) | ( 01 | be32(eb) | eb bytes ) * n
//
// Exposed as plain C functions consumed via ctypes (no Python.h
// dependency); built with `g++ -O3 -shared` by vmn_tpu.native.build.

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

inline void put_be32(uint8_t *p, uint32_t v) {
    p[0] = (uint8_t)(v >> 24);
    p[1] = (uint8_t)(v >> 16);
    p[2] = (uint8_t)(v >> 8);
    p[3] = (uint8_t)(v);
}

inline uint32_t get_be32(const uint8_t *p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
           ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

} // namespace

extern "C" {

// Required output capacity for n elements of eb bytes each.
size_t bt_encoded_size(size_t n, size_t eb) {
    return 5 + n * (5 + eb);
}

// elems: n*eb contiguous big-endian element bytes -> out (node bytes).
// Returns number of bytes written.
size_t bt_encode_array(const uint8_t *elems, size_t n, size_t eb,
                       uint8_t *out) {
    uint8_t *p = out;
    *p++ = 0x00;
    put_be32(p, (uint32_t)n);
    p += 4;
    for (size_t i = 0; i < n; i++) {
        *p++ = 0x01;
        put_be32(p, (uint32_t)eb);
        p += 4;
        std::memcpy(p, elems + i * eb, eb);
        p += eb;
    }
    return (size_t)(p - out);
}

// Parse node-of-uniform-leaves. Returns 0 on success, negative error:
//   -1 malformed/truncated, -2 not a uniform leaf array.
// On success *n_out = element count and out holds n*eb element bytes.
// `eb` must match every leaf length.
int bt_decode_array(const uint8_t *buf, size_t len, size_t eb,
                    uint8_t *out, size_t *n_out) {
    if (len < 5 || buf[0] != 0x00)
        return -2;
    size_t n = get_be32(buf + 1);
    if (len != bt_encoded_size(n, eb))
        return -1;
    const uint8_t *p = buf + 5;
    for (size_t i = 0; i < n; i++) {
        if (p[0] != 0x01 || get_be32(p + 1) != (uint32_t)eb)
            return -2;
        p += 5;
        std::memcpy(out + i * eb, p, eb);
        p += eb;
    }
    *n_out = n;
    return 0;
}

// Probe: if buf is a uniform leaf array, set *n_out/*eb_out, return 0;
// else return -2.
int bt_probe_array(const uint8_t *buf, size_t len, size_t *n_out,
                   size_t *eb_out) {
    if (len < 5 || buf[0] != 0x00)
        return -2;
    size_t n = get_be32(buf + 1);
    if (n == 0 || len < 10)
        return -2;
    if (buf[5] != 0x01)
        return -2;
    size_t eb = get_be32(buf + 6);
    if (len != bt_encoded_size(n, eb))
        return -2;
    *n_out = n;
    *eb_out = eb;
    return 0;
}

} // extern "C"
