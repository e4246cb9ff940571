// Native serialization codec for the CoFHE binary tensor format.
//
// Byte-compatible with the reference's packed format
// (cpu_cryptosystem.inl:229-635):
//   [u32 ndim][u32 shape...]
//   [u64 offset table: MSB = sign bit (set when value <= 0), low 63 bits =
//    byte offset into the data region]
//   [little-endian magnitudes, each field bitlen/8 + 1 bytes]
//
// The Python layer hands us bignums as flat int32 limb arrays (base 2^16,
// little-endian limbs) plus int32 signs; this is the same layout the JAX
// engine uses on device, so (de)serialization avoids Python bigint churn on
// the network hot path. Exposed via a C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libcofhe_codec.so codec.cpp -fopenmp

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

inline int field_bytes_from_limbs(const int32_t *limbs, int L) {
    int top = -1;
    for (int i = L - 1; i >= 0; --i) {
        if (limbs[i] != 0) { top = i; break; }
    }
    if (top < 0) return 1;  // zero: sizeinbase(0,2)=1 -> 1/8+1 = 1 byte
    uint32_t v = static_cast<uint32_t>(limbs[top]);
    int bits = 0;
    while (v) { ++bits; v >>= 1; }
    int total_bits = top * 16 + bits;
    return total_bits / 8 + 1;
}

inline void export_limbs(const int32_t *limbs, int nbytes, uint8_t *dst) {
    // little-endian magnitude bytes; trailing pad byte(s) stay zero
    for (int b = 0; b < nbytes; ++b) {
        int limb_idx = b / 2;
        int shift = (b % 2) * 8;
        dst[b] = static_cast<uint8_t>(
            (static_cast<uint32_t>(limbs[limb_idx]) >> shift) & 0xFF);
    }
}

}  // namespace

extern "C" {

// Compute the serialized byte size for n_fields bignums of L limbs each.
// limbs: (n_fields, L) int32. Returns total payload size EXCLUDING the
// header/offset table; also fills per-field sizes (int64 array).
int64_t cofhe_codec_field_sizes(const int32_t *limbs, int64_t n_fields, int32_t L,
                                int64_t *sizes_out) {
    int64_t total = 0;
    for (int64_t i = 0; i < n_fields; ++i) {
        int nb = field_bytes_from_limbs(limbs + i * L, L);
        sizes_out[i] = nb;
        total += nb;
    }
    return total;
}

// Serialize the data region + offset table.
//  limbs: (n_fields, L) int32 magnitudes (sign-magnitude)
//  signs: (n_fields) int32 in {-1, 0, +1}
//  sizes: per-field byte sizes from cofhe_codec_field_sizes
//  offsets_out: (n_fields) u64 entries with the sign bit folded in
//  data_out: payload buffer of total size
void cofhe_codec_pack(const int32_t *limbs, const int32_t *signs,
                      const int64_t *sizes, int64_t n_fields, int32_t L,
                      uint64_t *offsets_out, uint8_t *data_out) {
    uint64_t off = 0;
    for (int64_t i = 0; i < n_fields; ++i) {
        uint64_t entry = off;
        if (signs[i] <= 0) entry |= (1ULL << 63);  // reference: sgn() != 1
        offsets_out[i] = entry;
        export_limbs(limbs + i * L, static_cast<int>(sizes[i]), data_out + off);
        off += static_cast<uint64_t>(sizes[i]);
    }
}

// Deserialize: offsets (n_fields u64, sign in MSB), data region, total data
// region length. Writes (n_fields, L) limbs and signs. Returns 0 on
// success, -1 if a field does not fit L limbs.
int32_t cofhe_codec_unpack(const uint64_t *offsets, const uint8_t *data,
                           int64_t data_len, int64_t n_fields, int32_t L,
                           int32_t *limbs_out, int32_t *signs_out) {
    const uint64_t MASKOFF = (1ULL << 63) - 1;
    for (int64_t i = 0; i < n_fields; ++i) {
        uint64_t start = offsets[i] & MASKOFF;
        uint64_t end = (i + 1 < n_fields) ? (offsets[i + 1] & MASKOFF)
                                          : static_cast<uint64_t>(data_len);
        if (end < start || end > static_cast<uint64_t>(data_len)) return -1;
        uint64_t nb = end - start;
        if (nb > static_cast<uint64_t>(L) * 2) return -1;
        int32_t *dst = limbs_out + i * L;
        std::memset(dst, 0, sizeof(int32_t) * L);
        bool nonzero = false;
        for (uint64_t b = 0; b < nb; ++b) {
            uint8_t byte = data[start + b];
            if (byte) nonzero = true;
            dst[b / 2] |= static_cast<int32_t>(byte) << ((b % 2) * 8);
        }
        int32_t s = nonzero ? 1 : 0;
        if (offsets[i] >> 63) s = -s;
        signs_out[i] = s;
    }
    return 0;
}

}  // extern "C"
