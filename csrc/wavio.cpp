// Native RIFF/WAVE decoder + corpus packer (SURVEY C1 native tier).
//
// Reference equivalent: libsndfile (C) doing per-file decode inside
// DataLoader workers. Here the only host-side hot path is the ONE-TIME
// corpus pack (decode every wav -> int16 memmap); this library accelerates
// it ~10x over the numpy codec for large corpora. The pure-numpy codec in
// audiogan_tpu/data/wavio.py remains the always-available fallback and the
// correctness oracle (tests/data/test_native.py asserts bit-equality).
//
// Build: make -C csrc   (or scripts/build_native.sh)
// ABI: plain C, loaded via ctypes from audiogan_tpu/data/native.py.

#include <cstdint>
#include <cstring>

namespace {

struct Reader {
    const uint8_t* p;
    int64_t n;
    int64_t pos = 0;

    bool read_bytes(void* dst, int64_t k) {
        if (pos + k > n) return false;
        std::memcpy(dst, p + pos, static_cast<size_t>(k));
        pos += k;
        return true;
    }
    bool skip(int64_t k) {
        if (pos + k > n) return false;
        pos += k;
        return true;
    }
    uint32_t u32(const uint8_t* q) {
        return static_cast<uint32_t>(q[0]) | (static_cast<uint32_t>(q[1]) << 8) |
               (static_cast<uint32_t>(q[2]) << 16) |
               (static_cast<uint32_t>(q[3]) << 24);
    }
    uint16_t u16(const uint8_t* q) {
        return static_cast<uint16_t>(q[0] | (q[1] << 8));
    }
};

constexpr int kErrNotRiff = -1;
constexpr int kErrNoFmt = -2;
constexpr int kErrUnsupported = -3;
constexpr int kErrTruncated = -4;

}  // namespace

extern "C" {

// Decode a wav byte buffer into int16 mono samples, center-crop/right-pad to
// store_len. Returns the source sample count (>= 0) on success, negative on
// error. rate_out receives the sample rate.
//
// Supported: PCM int16 / int32 / uint8, IEEE float32; any channel count
// (averaged to mono) — same matrix as the numpy fallback.
int64_t ag_decode_wav_to_store(const uint8_t* data, int64_t size,
                               int16_t* out, int64_t store_len,
                               int32_t* rate_out) {
    if (size < 12 || std::memcmp(data, "RIFF", 4) != 0 ||
        std::memcmp(data + 8, "WAVE", 4) != 0) {
        return kErrNotRiff;
    }
    Reader r{data, size};
    r.pos = 12;

    uint16_t fmt = 0, n_ch = 0, bits = 0;
    uint32_t rate = 0;
    const uint8_t* raw = nullptr;
    int64_t raw_len = 0;
    bool have_fmt = false;

    while (r.pos + 8 <= size) {
        const uint8_t* hdr = data + r.pos;
        uint32_t chunk = r.u32(hdr + 4);
        const uint8_t* body = hdr + 8;
        if (r.pos + 8 + static_cast<uint64_t>(chunk)
                > static_cast<uint64_t>(size)) {
            // tolerate a truncated final chunk only for non-essential chunks
            if (std::memcmp(hdr, "data", 4) == 0) return kErrTruncated;
            break;
        }
        if (std::memcmp(hdr, "fmt ", 4) == 0 && chunk >= 16) {
            fmt = r.u16(body);
            n_ch = r.u16(body + 2);
            rate = r.u32(body + 4);
            bits = r.u16(body + 14);
            if (fmt == 0xFFFE && chunk >= 26) {
                // WAVE_FORMAT_EXTENSIBLE: the real format code is the
                // first 2 bytes of the SubFormat GUID (16 base + cbSize 2
                // + validBits 2 + channelMask 4) — bit depth alone
                // misreads extensible float32 as int32 PCM
                fmt = r.u16(body + 24);
            }
            have_fmt = true;
        } else if (std::memcmp(hdr, "data", 4) == 0) {
            raw = body;
            raw_len = chunk;
        }
        r.pos += 8 + chunk + (chunk & 1);
    }
    if (!have_fmt || raw == nullptr) return kErrNoFmt;
    if (fmt == 0xFFFE) return kErrUnsupported;  // EXTENSIBLE w/o SubFormat
    if (n_ch == 0) return kErrUnsupported;
    *rate_out = static_cast<int32_t>(rate);

    const int64_t bytes_per = bits / 8;
    if (bytes_per == 0) return kErrUnsupported;
    const int64_t frames = raw_len / (bytes_per * n_ch);

    // center-crop to store_len source frames
    int64_t off = frames > store_len ? (frames - store_len) / 2 : 0;
    int64_t count = frames - off < store_len ? frames - off : store_len;

    auto frame_to_mono = [&](int64_t i) -> double {
        const uint8_t* f = raw + (off + i) * bytes_per * n_ch;
        double acc = 0.0;
        for (int c = 0; c < n_ch; ++c) {
            const uint8_t* s = f + c * bytes_per;
            double v = 0.0;
            if (fmt == 1 && bits == 16) {
                int16_t x;
                std::memcpy(&x, s, 2);
                v = x / 32768.0;
            } else if (fmt == 1 && bits == 32) {
                int32_t x;
                std::memcpy(&x, s, 4);
                v = x / 2147483648.0;
            } else if (fmt == 1 && bits == 8) {
                v = (static_cast<double>(*s) - 128.0) / 128.0;
            } else if (fmt == 3 && bits == 32) {
                float x;
                std::memcpy(&x, s, 4);
                v = x;
            } else {
                v = 0.0;  // validated below
            }
            acc += v;
        }
        return acc / n_ch;
    };

    const bool supported = (fmt == 1 && (bits == 16 || bits == 32 || bits == 8))
                           || (fmt == 3 && bits == 32);
    if (!supported) return kErrUnsupported;

    for (int64_t i = 0; i < count; ++i) {
        // scale by 32768 so PCM16 mono passes through bit-exactly; round
        // half-to-even to match numpy rint (matters only for mixed/float
        // sources), clip the +1.0 float edge case.
        double v = frame_to_mono(i) * 32768.0;
        if (v > 32767.0) v = 32767.0;
        if (v < -32768.0) v = -32768.0;
        double r = v >= 0 ? v + 0.5 : v - 0.5;
        int64_t q = static_cast<int64_t>(r);
        // half-to-even correction
        if ((v >= 0 ? r - q == 0.0 : q - r == 0.0) &&
            (v - static_cast<int64_t>(v) == 0.5 ||
             v - static_cast<int64_t>(v) == -0.5) &&
            (q % 2 != 0)) {
            q += v >= 0 ? -1 : 1;
        }
        out[i] = static_cast<int16_t>(q);
    }
    for (int64_t i = count; i < store_len; ++i) out[i] = 0;
    return frames;
}

int32_t ag_abi_version() { return 1; }

}  // extern "C"
