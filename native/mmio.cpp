// Fast MatrixMarket coordinate parser for EigenKernel-TPU.
//
// Native-runtime equivalent of the reference's hand-optimized value-read loop
// (matrix_io.f90:91-144) which replaced slow formatted Fortran reads.  Parses
// "i j value" coordinate lines with a single pass over a fully buffered file,
// using strtol/strtod directly on the buffer (no per-line allocation).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// Advance p past one line (to the char after '\n', or end).
inline const char* skip_line(const char* p, const char* end) {
    while (p < end && *p != '\n') ++p;
    return (p < end) ? p + 1 : end;
}

inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
        ++p;
    return p;
}

}  // namespace

extern "C" {

// Parse the body of a MatrixMarket coordinate file.
//
//   path         : file path
//   nnz_expected : entry count from the header (size of output arrays)
//   rows, cols   : out, int64[nnz_expected], 0-based indices
//   vals         : out, double[nnz_expected]
//
// Returns the number of entries parsed, or a negative error code:
//   -1 cannot open/read file, -2 malformed banner/size line,
//   -3 parse error in an entry, -4 more entries than expected.
int64_t ekmm_read_coordinate(const char* path, int64_t nnz_expected,
                             int64_t* rows, int64_t* cols, double* vals) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (size <= 0) { std::fclose(f); return -1; }
    char* buf = static_cast<char*>(std::malloc(static_cast<size_t>(size) + 1));
    if (!buf) { std::fclose(f); return -1; }
    size_t got = std::fread(buf, 1, static_cast<size_t>(size), f);
    std::fclose(f);
    buf[got] = '\0';
    const char* p = buf;
    const char* end = buf + got;

    // Banner line.
    if (got < 2 || p[0] != '%' || p[1] != '%') { std::free(buf); return -2; }
    p = skip_line(p, end);
    // Comment / blank lines.
    p = skip_ws(p, end);
    while (p < end && *p == '%') { p = skip_line(p, end); p = skip_ws(p, end); }
    // Size line: rows cols nnz.
    char* q;
    std::strtol(p, &q, 10);
    if (q == p) { std::free(buf); return -2; }
    p = q;
    std::strtol(p, &q, 10);
    if (q == p) { std::free(buf); return -2; }
    p = q;
    std::strtol(p, &q, 10);
    if (q == p) { std::free(buf); return -2; }
    p = q;

    int64_t k = 0;
    while (true) {
        p = skip_ws(p, end);
        if (p >= end) break;
        if (*p == '%') { p = skip_line(p, end); continue; }
        if (k >= nnz_expected) { std::free(buf); return -4; }
        long i = std::strtol(p, &q, 10);
        if (q == p) { std::free(buf); return -3; }
        p = q;
        long j = std::strtol(p, &q, 10);
        if (q == p) { std::free(buf); return -3; }
        p = q;
        double v = std::strtod(p, &q);
        if (q == p) { std::free(buf); return -3; }
        p = q;
        rows[k] = i - 1;
        cols[k] = j - 1;
        vals[k] = v;
        ++k;
    }
    std::free(buf);
    return k;
}

// Fast formatted writer for the indexed-value output files
// (eigenvalues.dat / ipratios.dat: "i value"; eigenvector files:
// "i j value") — the native analog of the reference's formatted Fortran
// writes (main.f90:111-121, matrix_io.f90:207-212).  j_col >= 1 selects
// the three-column eigenvector format.
int64_t ekmm_write_indexed(const char* path, int64_t n, int64_t j_col,
                           const double* vals) {
    FILE* f = std::fopen(path, "w");
    if (!f) return -1;
    const size_t CAP = 1 << 20;
    char* buf = static_cast<char*>(std::malloc(CAP));
    if (!buf) { std::fclose(f); return -2; }
    size_t used = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (used + 128 > CAP) {
            if (std::fwrite(buf, 1, used, f) != used) {
                std::free(buf); std::fclose(f); return -3;
            }
            used = 0;
        }
        int w;
        if (j_col >= 1) {
            w = std::snprintf(buf + used, 128, "%8lld %8lld %26.16E\n",
                              static_cast<long long>(i + 1),
                              static_cast<long long>(j_col), vals[i]);
        } else {
            w = std::snprintf(buf + used, 128, "%8lld %26.16E\n",
                              static_cast<long long>(i + 1), vals[i]);
        }
        if (w <= 0) { std::free(buf); std::fclose(f); return -3; }
        used += static_cast<size_t>(w);
    }
    if (std::fwrite(buf, 1, used, f) != used) {
        std::free(buf); std::fclose(f); return -3;
    }
    std::free(buf);
    std::fclose(f);
    return n;
}

}  // extern "C"
