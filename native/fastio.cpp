// Native data-pipeline kernels for colvarsfinder-tpu.
//
// The reference's data layer decodes trajectories on the host in Python
// (np.loadtxt over 5e5-line text files, reference utils.py:135); this
// C++ library provides the hot host-side IO paths, exposed to Python via
// ctypes (colvarsfinder_tpu/utils/native_io.py):
//
//   * whitespace-float trajectory text parsing (memory-mapped, single pass)
//   * DCD frame block decoding (fixed-stride gather into [n, atoms, 3])
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Count rows and columns of a whitespace-delimited numeric text file.
// Returns 0 on success. Columns are taken from the first non-empty line.
int traj_txt_dims(const char* path, int64_t* n_rows, int64_t* n_cols) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    size_t size = (size_t)st.st_size;
    if (size == 0) { close(fd); *n_rows = 0; *n_cols = 0; return 0; }
    const char* data =
        (const char*)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return -3;

    int64_t rows = 0, cols = 0;
    const char* p = data;
    const char* end = data + size;
    bool counted_cols = false;
    while (p < end) {
        // skip leading spaces
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
        if (p >= end) break;
        if (*p == '\n') { ++p; continue; }
        // non-empty line
        ++rows;
        if (!counted_cols) {
            const char* q = p;
            bool in_tok = false;
            while (q < end && *q != '\n') {
                bool ws = (*q == ' ' || *q == '\t' || *q == '\r');
                if (!ws && !in_tok) { ++cols; in_tok = true; }
                if (ws) in_tok = false;
                ++q;
            }
            counted_cols = true;
        }
        while (p < end && *p != '\n') ++p;
    }
    munmap((void*)data, size);
    *n_rows = rows;
    *n_cols = cols;
    return 0;
}

// Parse the file into a dense row-major double array out[n_rows * n_cols].
// Returns number of rows parsed, or negative error code.
int64_t traj_txt_read(const char* path, double* out, int64_t n_rows,
                      int64_t n_cols) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    size_t size = (size_t)st.st_size;
    const char* data =
        (const char*)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return -3;

    const char* p = data;
    const char* end = data + size;
    int64_t row = 0;
    while (p < end && row < n_rows) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
        if (p >= end) break;
        if (*p == '\n') { ++p; continue; }
        double* dst = out + row * n_cols;
        for (int64_t c = 0; c < n_cols; ++c) {
            char* next = nullptr;
            dst[c] = strtod(p, &next);
            if (next == p) { munmap((void*)data, size); return -4; }
            p = next;
        }
        ++row;
        while (p < end && *p != '\n') ++p;
    }
    munmap((void*)data, size);
    return row;
}

// Decode DCD coordinate records: given the raw file bytes laid out as
// Fortran records (x-block, y-block, z-block per frame, each with 4-byte
// length prefixes/suffixes, optionally preceded by a unit-cell record),
// gather into out[n_frames * n_atoms * 3] float32.
// frame0_offset: byte offset of the first per-frame record.
int64_t dcd_decode(const char* path, int64_t frame0_offset, int64_t n_atoms,
                   int64_t n_frames, int has_unitcell, float* out) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    size_t size = (size_t)st.st_size;
    const char* data =
        (const char*)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return -3;

    const size_t blk = 4 + (size_t)n_atoms * 4 + 4;  // one axis record
    const size_t cell = has_unitcell ? (4 + 48 + 4) : 0;
    size_t off = (size_t)frame0_offset;
    int64_t f = 0;
    for (; f < n_frames; ++f) {
        if (off + cell + 3 * blk > size) break;
        off += cell;
        const float* x = (const float*)(data + off + 4);
        const float* y = (const float*)(data + off + blk + 4);
        const float* z = (const float*)(data + off + 2 * blk + 4);
        float* dst = out + (size_t)f * n_atoms * 3;
        for (int64_t a = 0; a < n_atoms; ++a) {
            dst[3 * a + 0] = x[a];
            dst[3 * a + 1] = y[a];
            dst[3 * a + 2] = z[a];
        }
        off += 3 * blk;
    }
    munmap((void*)data, size);
    return f;
}

}  // extern "C"
