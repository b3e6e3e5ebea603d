// Native ASCII P3 formatter for the PPM writer (crt_tpu/io/ppm.py).
//
// Byte-identical to the Python reference implementation (which mirrors the
// reference writer crt_image_ppm.cpp:9-23): header "P3\n{w} {h}\n{maxc}\n",
// then per pixel "r g b\t" and "\n" per row.  The Python string loop takes
// ~1.3 s for a 1080p frame — 60x the render time — so the CLI routes
// through this.  Values must already be quantized to [0, maxc] ints
// (io/ppm.quantize).

#include <cstdint>

namespace {

inline char *put_uint(char *p, uint32_t v) {
    char tmp[12];
    int n = 0;
    do {
        tmp[n++] = static_cast<char>('0' + v % 10);
        v /= 10;
    } while (v);
    while (n) *p++ = tmp[--n];
    return p;
}

}  // namespace

extern "C" {

// Returns the number of bytes written into out (caller must size out for
// the worst case: 64 + h*w*3*5 bytes), or -1 if cap is too small for the
// worst case.
long long crt_ppm_format(const int32_t *rgb, int32_t h, int32_t w,
                         int32_t maxc, char *out, long long cap) {
    const long long worst =
        64LL + static_cast<long long>(h) * w * 3 * 5 + h;
    if (cap < worst) return -1;

    char *p = out;
    *p++ = 'P';
    *p++ = '3';
    *p++ = '\n';
    p = put_uint(p, static_cast<uint32_t>(w));
    *p++ = ' ';
    p = put_uint(p, static_cast<uint32_t>(h));
    *p++ = '\n';
    p = put_uint(p, static_cast<uint32_t>(maxc));
    *p++ = '\n';

    const int32_t *px = rgb;
    for (int32_t y = 0; y < h; ++y) {
        for (int32_t x = 0; x < w; ++x) {
            p = put_uint(p, static_cast<uint32_t>(px[0]));
            *p++ = ' ';
            p = put_uint(p, static_cast<uint32_t>(px[1]));
            *p++ = ' ';
            p = put_uint(p, static_cast<uint32_t>(px[2]));
            *p++ = '\t';
            px += 3;
        }
        *p++ = '\n';
    }
    return p - out;
}

}  // extern "C"
