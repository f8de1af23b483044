// Native batch image loader: PNM (P5/P6) decode, BT.601 grayscale,
// silhouette-mask binarize/invert/close — multithreaded across files.
//
// Role: the data-ingestion runtime of the framework (the reference leaned on
// OpenCV's compiled imread for this, utils/find_matches.py:249-250). Python
// binds via ctypes (sfm_tpu/io/native.py); everything returns into
// caller-allocated buffers so the hot path is zero-copy into numpy arrays
// that feed jax.device_put.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpnm.so pnm_loader.cpp -lpthread
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cctype>
#include <thread>
#include <vector>
#include <string>
#include <atomic>

namespace {

struct Header {
    int magic;   // 5 or 6
    int width;
    int height;
    int maxval;
    long data_offset;
};

// Parse a PNM header from a buffer. Returns 0 on success.
int parse_header(const uint8_t* buf, long size, Header* h) {
    if (size < 2 || buf[0] != 'P') return -1;
    int magic = buf[1] - '0';
    if (magic != 5 && magic != 6) return -2;
    long pos = 2;
    int fields[3];
    for (int f = 0; f < 3;) {
        if (pos >= size) return -3;
        uint8_t c = buf[pos];
        if (c == '#') {                       // comment to end of line
            while (pos < size && buf[pos] != '\n') pos++;
            pos++;
        } else if (isspace(c)) {
            pos++;
        } else if (isdigit(c)) {
            int v = 0;
            while (pos < size && isdigit(buf[pos])) {
                v = v * 10 + (buf[pos] - '0');
                pos++;
            }
            fields[f++] = v;
        } else {
            return -4;
        }
    }
    pos++;  // single whitespace after maxval
    h->magic = magic;
    h->width = fields[0];
    h->height = fields[1];
    h->maxval = fields[2];
    h->data_offset = pos;
    return 0;
}

int read_file(const char* path, std::vector<uint8_t>* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    out->resize(n);
    long got = (long)fread(out->data(), 1, n, f);
    fclose(f);
    return got == n ? 0 : -2;
}

// Decode one file to float32 grayscale in [0, 1] (BT.601 for P6).
int decode_gray_one(const char* path, float* dst, int expect_h, int expect_w) {
    std::vector<uint8_t> buf;
    if (read_file(path, &buf) != 0) return -1;
    Header h;
    if (parse_header(buf.data(), (long)buf.size(), &h) != 0) return -2;
    if (h.height != expect_h || h.width != expect_w || h.maxval > 255) return -3;
    const uint8_t* p = buf.data() + h.data_offset;
    long npix = (long)h.width * h.height;
    if ((long)buf.size() - h.data_offset < npix * (h.magic == 6 ? 3 : 1)) return -4;
    const float inv = 1.0f / 255.0f;
    if (h.magic == 5) {
        for (long i = 0; i < npix; i++) dst[i] = p[i] * inv;
    } else {
        for (long i = 0; i < npix; i++) {
            const uint8_t* q = p + 3 * i;
            dst[i] = (0.299f * q[0] + 0.587f * q[1] + 0.114f * q[2]) * inv;
        }
    }
    return 0;
}

// Decode one file to uint8 luma (the frontend's wire format: the TPU
// normalizes on device; u8 is 4x fewer host->device bytes than f32).
// Matches sfm_tpu.io.images.load_image_gray_u8: round(255 * BT.601 luma).
int decode_gray_u8_one(const char* path, uint8_t* dst, int expect_h, int expect_w) {
    std::vector<uint8_t> buf;
    if (read_file(path, &buf) != 0) return -1;
    Header h;
    if (parse_header(buf.data(), (long)buf.size(), &h) != 0) return -2;
    if (h.height != expect_h || h.width != expect_w || h.maxval > 255) return -3;
    const uint8_t* p = buf.data() + h.data_offset;
    long npix = (long)h.width * h.height;
    if ((long)buf.size() - h.data_offset < npix * (h.magic == 6 ? 3 : 1)) return -4;
    if (h.magic == 5) {
        memcpy(dst, p, npix);
    } else {
        for (long i = 0; i < npix; i++) {
            const uint8_t* q = p + 3 * i;
            float g = 0.299f * q[0] + 0.587f * q[1] + 0.114f * q[2];
            dst[i] = (uint8_t)(g + 0.5f);
        }
    }
    return 0;
}

// Decode one mask: threshold at 127, invert, 3x3 morphological close.
int decode_mask_one(const char* path, uint8_t* dst, int expect_h, int expect_w) {
    std::vector<uint8_t> buf;
    if (read_file(path, &buf) != 0) return -1;
    Header h;
    if (parse_header(buf.data(), (long)buf.size(), &h) != 0) return -2;
    if (h.height != expect_h || h.width != expect_w || h.maxval > 255) return -3;
    const uint8_t* p = buf.data() + h.data_offset;
    int W = h.width, H = h.height;
    long npix = (long)W * H;
    std::vector<uint8_t> m(npix), d(npix);
    if (h.magic == 5) {
        for (long i = 0; i < npix; i++) m[i] = p[i] <= 127;  // invert
    } else {
        for (long i = 0; i < npix; i++) {
            const uint8_t* q = p + 3 * i;
            int g = (q[0] + q[1] + q[2]) / 3;
            m[i] = g <= 127;
        }
    }
    // 3x3 dilate into d, then erode into dst.
    auto at = [&](const std::vector<uint8_t>& a, int y, int x) -> uint8_t {
        if (y < 0 || y >= H || x < 0 || x >= W) return 0;
        return a[(long)y * W + x];
    };
    for (int y = 0; y < H; y++)
        for (int x = 0; x < W; x++) {
            uint8_t v = 0;
            for (int dy = -1; dy <= 1 && !v; dy++)
                for (int dx = -1; dx <= 1 && !v; dx++)
                    v = at(m, y + dy, x + dx);
            d[(long)y * W + x] = v;
        }
    for (int y = 0; y < H; y++)
        for (int x = 0; x < W; x++) {
            uint8_t v = 1;
            for (int dy = -1; dy <= 1 && v; dy++)
                for (int dx = -1; dx <= 1 && v; dx++) {
                    int yy = y + dy, xx = x + dx;
                    // erosion treats out-of-bounds as background
                    v = (yy < 0 || yy >= H || xx < 0 || xx >= W)
                            ? 0
                            : d[(long)yy * W + xx];
                }
            dst[(long)y * W + x] = v;
        }
    return 0;
}

template <typename Fn>
int parallel_over_files(int n, int threads, Fn fn) {
    if (threads <= 0) threads = (int)std::thread::hardware_concurrency();
    if (threads > n) threads = n > 0 ? n : 1;
    std::atomic<int> next(0), fail(0);
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; t++)
        pool.emplace_back([&] {
            int i;
            while ((i = next.fetch_add(1)) < n)
                if (fn(i) != 0) fail.fetch_add(1);
        });
    for (auto& th : pool) th.join();
    return fail.load();
}

}  // namespace

extern "C" {

// Probe a file's dimensions. Returns 0 on success.
int pnm_probe(const char* path, int* height, int* width, int* channels) {
    std::vector<uint8_t> buf;
    if (read_file(path, &buf) != 0) return -1;
    Header h;
    if (parse_header(buf.data(), (long)buf.size(), &h) != 0) return -2;
    *height = h.height;
    *width = h.width;
    *channels = h.magic == 6 ? 3 : 1;
    return 0;
}

// Batch-decode n images (paths as '\n'-joined blob) into dst (n, H, W) f32.
// Returns number of failures (0 = all good).
int pnm_load_gray_batch(const char* paths_blob, int n, int height, int width,
                        float* dst, int threads) {
    std::vector<std::string> paths;
    {
        const char* s = paths_blob;
        for (int i = 0; i < n; i++) {
            const char* e = strchr(s, '\n');
            if (!e) e = s + strlen(s);
            paths.emplace_back(s, e - s);
            s = (*e) ? e + 1 : e;
        }
    }
    long stride = (long)height * width;
    return parallel_over_files(n, threads, [&](int i) {
        return decode_gray_one(paths[i].c_str(), dst + stride * i, height, width);
    });
}

// Batch-decode n images into dst (n, H, W) u8 luma (device-normalized wire
// format). Returns number of failures.
int pnm_load_gray_u8_batch(const char* paths_blob, int n, int height, int width,
                           uint8_t* dst, int threads) {
    std::vector<std::string> paths;
    {
        const char* s = paths_blob;
        for (int i = 0; i < n; i++) {
            const char* e = strchr(s, '\n');
            if (!e) e = s + strlen(s);
            paths.emplace_back(s, e - s);
            s = (*e) ? e + 1 : e;
        }
    }
    long stride = (long)height * width;
    return parallel_over_files(n, threads, [&](int i) {
        return decode_gray_u8_one(paths[i].c_str(), dst + stride * i, height, width);
    });
}

// Batch-decode n silhouette masks into dst (n, H, W) u8 (1 = foreground).
int pnm_load_mask_batch(const char* paths_blob, int n, int height, int width,
                        uint8_t* dst, int threads) {
    std::vector<std::string> paths;
    {
        const char* s = paths_blob;
        for (int i = 0; i < n; i++) {
            const char* e = strchr(s, '\n');
            if (!e) e = s + strlen(s);
            paths.emplace_back(s, e - s);
            s = (*e) ? e + 1 : e;
        }
    }
    long stride = (long)height * width;
    return parallel_over_files(n, threads, [&](int i) {
        return decode_mask_one(paths[i].c_str(), dst + stride * i, height, width);
    });
}

}  // extern "C"
