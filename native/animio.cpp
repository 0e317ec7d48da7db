// animio: native I/O runtime for animsnapbases_tpu.
//
// The reference framework's only native-code touchpoint is binary
// interchange with a C++ HRPD implementation; here the interchange formats
// AND the ingest hot path (parsing hundreds of OFF snapshot meshes) are
// implemented natively: a thread-pooled OFF sequence loader and the
// little-endian .bin matrix/vector codecs (byte-compatible with
// animsnapbases_tpu.io.binfmt).
//
// Exposed via a C ABI for ctypes (no pybind11 dependency).

#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Read a whole file into a string; returns false on failure.
bool slurp(const char* path, std::string& out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out.resize(static_cast<size_t>(size));
    size_t got = std::fread(out.data(), 1, static_cast<size_t>(size), f);
    std::fclose(f);
    return got == static_cast<size_t>(size);
}

struct Cursor {
    const char* p;
    const char* end;

    void skip_ws_and_comments() {
        while (p < end) {
            if (*p == '#') {
                while (p < end && *p != '\n') ++p;
            } else if (std::isspace(static_cast<unsigned char>(*p))) {
                ++p;
            } else {
                break;
            }
        }
    }

    bool next_token(const char** tok, size_t* len) {
        skip_ws_and_comments();
        if (p >= end) return false;
        const char* start = p;
        while (p < end && !std::isspace(static_cast<unsigned char>(*p))
               && *p != '#')
            ++p;
        *tok = start;
        *len = static_cast<size_t>(p - start);
        return true;
    }

    bool next_double(double* v) {
        const char* tok;
        size_t len;
        if (!next_token(&tok, &len)) return false;
        char buf[64];
        if (len >= sizeof(buf)) return false;
        std::memcpy(buf, tok, len);
        buf[len] = 0;
        char* endp;
        *v = std::strtod(buf, &endp);
        return endp != buf;
    }

    bool next_long(long* v) {
        double d;
        if (!next_double(&d)) return false;
        *v = static_cast<long>(d);
        return true;
    }
};

// Parse one OFF/COFF file. verts: n*3 doubles, faces: m*3 ints (triangles).
// Returns 0 on success.
int parse_off(const std::string& text, long n_verts, long n_faces,
              double* verts, int32_t* faces) {
    Cursor c{text.data(), text.data() + text.size()};
    const char* tok;
    size_t len;
    if (!c.next_token(&tok, &len)) return 1;
    bool coff = (len == 4 && std::strncmp(tok, "COFF", 4) == 0);
    bool off = (len == 3 && std::strncmp(tok, "OFF", 3) == 0);
    if (!off && !coff) return 2;

    long nv, nf, ne;
    if (!c.next_long(&nv) || !c.next_long(&nf) || !c.next_long(&ne)) return 3;
    if (nv != n_verts || nf != n_faces) return 4;

    for (long i = 0; i < nv; ++i) {
        double x, y, z;
        if (!c.next_double(&x) || !c.next_double(&y) || !c.next_double(&z))
            return 5;
        verts[3 * i] = x;
        verts[3 * i + 1] = y;
        verts[3 * i + 2] = z;
        if (coff) {  // skip r g b (alpha optional: handled as next vertex's x?
                     // COFF stores exactly 3 color fields in our writer)
            double r, g, b;
            if (!c.next_double(&r) || !c.next_double(&g)
                || !c.next_double(&b))
                return 6;
        }
    }
    for (long t = 0; t < nf; ++t) {
        long cnt, a, b2, d;
        if (!c.next_long(&cnt) || cnt != 3) return 7;
        if (!c.next_long(&a) || !c.next_long(&b2) || !c.next_long(&d))
            return 8;
        faces[3 * t] = static_cast<int32_t>(a);
        faces[3 * t + 1] = static_cast<int32_t>(b2);
        faces[3 * t + 2] = static_cast<int32_t>(d);
    }
    return 0;
}

}  // namespace

extern "C" {

// Probe an OFF file's vertex/face counts. Returns 0 on success.
int anim_off_counts(const char* path, int64_t* n_verts, int64_t* n_faces) {
    std::string text;
    if (!slurp(path, text)) return 1;
    Cursor c{text.data(), text.data() + text.size()};
    const char* tok;
    size_t len;
    if (!c.next_token(&tok, &len)) return 2;
    long nv, nf, ne;
    if (!c.next_long(&nv) || !c.next_long(&nf) || !c.next_long(&ne)) return 3;
    *n_verts = nv;
    *n_faces = nf;
    return 0;
}

// Load one OFF file into preallocated buffers. Returns 0 on success.
int anim_load_off(const char* path, int64_t n_verts, int64_t n_faces,
                  double* verts, int32_t* faces) {
    std::string text;
    if (!slurp(path, text)) return 1;
    return parse_off(text, n_verts, n_faces, verts, faces) == 0 ? 0 : 2;
}

// Thread-pooled OFF sequence loader: paths are '\n'-separated; all frames
// must share (n_verts, n_faces).  verts_out: (n_files, n_verts, 3) doubles;
// faces_out: (n_faces, 3) int32 (from frame 0).  Returns 0 on success.
int anim_load_off_sequence(const char* joined_paths, int64_t n_files,
                           int64_t n_verts, int64_t n_faces,
                           double* verts_out, int32_t* faces_out,
                           int n_threads) {
    std::vector<std::string> paths;
    {
        const char* s = joined_paths;
        while (*s) {
            const char* nl = std::strchr(s, '\n');
            if (!nl) {
                paths.emplace_back(s);
                break;
            }
            paths.emplace_back(s, static_cast<size_t>(nl - s));
            s = nl + 1;
        }
    }
    if (static_cast<int64_t>(paths.size()) != n_files) return 1;

    std::atomic<long> next{0};
    std::atomic<int> status{0};
    std::vector<int32_t> scratch_faces(
        static_cast<size_t>(n_faces) * 3);

    auto worker = [&](int tid) {
        std::vector<int32_t> local_faces(static_cast<size_t>(n_faces) * 3);
        for (;;) {
            long i = next.fetch_add(1);
            if (i >= n_files || status.load() != 0) break;
            std::string text;
            if (!slurp(paths[static_cast<size_t>(i)].c_str(), text)) {
                status.store(2);
                break;
            }
            int32_t* fdst = (i == 0) ? faces_out : local_faces.data();
            int rc = parse_off(text, n_verts, n_faces,
                               verts_out + i * n_verts * 3, fdst);
            if (rc != 0) {
                status.store(10 + rc);
                break;
            }
        }
        (void)tid;
    };

    int nt = n_threads > 0 ? n_threads
                           : static_cast<int>(
                                 std::thread::hardware_concurrency());
    if (nt < 1) nt = 1;
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
    (void)scratch_faces;
    return status.load();
}

// ---------------------------------------------------------------------------
// .bin codecs (little-endian; layouts match animsnapbases_tpu.io.binfmt)
// ---------------------------------------------------------------------------

// components: header (int32 N, int32 dim*K), payload d-major then k then i.
int anim_write_components_bin(const char* path, const double* bases,
                              int32_t K, int32_t N, int32_t dim) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return 1;
    int32_t hdr[2] = {N, dim * K};
    std::fwrite(hdr, sizeof(int32_t), 2, f);
    // bases is (K, N, dim) C-order; write transpose (dim, K, N)
    std::vector<double> row(static_cast<size_t>(N));
    for (int32_t d = 0; d < dim; ++d) {
        for (int32_t k = 0; k < K; ++k) {
            const double* src = bases + (static_cast<int64_t>(k) * N) * dim;
            for (int32_t i = 0; i < N; ++i)
                row[static_cast<size_t>(i)] = src[
                    static_cast<int64_t>(i) * dim + d];
            std::fwrite(row.data(), sizeof(double),
                        static_cast<size_t>(N), f);
        }
    }
    std::fclose(f);
    return 0;
}

int anim_read_components_bin(const char* path, double* out, int32_t K,
                             int32_t N, int32_t dim) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    int32_t hdr[2];
    if (std::fread(hdr, sizeof(int32_t), 2, f) != 2 || hdr[0] != N
        || hdr[1] != dim * K) {
        std::fclose(f);
        return 2;
    }
    std::vector<double> row(static_cast<size_t>(N));
    for (int32_t d = 0; d < dim; ++d) {
        for (int32_t k = 0; k < K; ++k) {
            if (std::fread(row.data(), sizeof(double),
                           static_cast<size_t>(N), f)
                != static_cast<size_t>(N)) {
                std::fclose(f);
                return 3;
            }
            double* dst = out + (static_cast<int64_t>(k) * N) * dim;
            for (int32_t i = 0; i < N; ++i)
                dst[static_cast<int64_t>(i) * dim + d] =
                    row[static_cast<size_t>(i)];
        }
    }
    std::fclose(f);
    return 0;
}

// masses/vector: header (int32 n, int32 1), payload n doubles.
int anim_write_vector_bin(const char* path, const double* v, int32_t n) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return 1;
    int32_t hdr[2] = {n, 1};
    std::fwrite(hdr, sizeof(int32_t), 2, f);
    std::fwrite(v, sizeof(double), static_cast<size_t>(n), f);
    std::fclose(f);
    return 0;
}

int anim_read_vector_bin(const char* path, double* out, int32_t n) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    int32_t hdr[2];
    if (std::fread(hdr, sizeof(int32_t), 2, f) != 2 || hdr[0] != n) {
        std::fclose(f);
        return 2;
    }
    size_t got = std::fread(out, sizeof(double), static_cast<size_t>(n), f);
    std::fclose(f);
    return got == static_cast<size_t>(n) ? 0 : 3;
}

}  // extern "C"
