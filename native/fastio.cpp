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

// ---------------------------------------------------------------------------
// XTC (GROMACS compressed trajectory) bulk decoder.
//
// XDR big-endian container; coordinates quantized to round(x * precision)
// and stored with the classic 3dfcoord scheme: mixed-radix packed absolute
// positions plus run-length-coded small inter-atom deltas in adaptive
// magnitude classes. Mirrors the portable Python codec in
// colvarsfinder_tpu/utils/xtc.py (which is the correctness oracle in
// tests/test_xtc.py); this path exists because per-bit decoding in Python
// is ~100x slower on long trajectories.
// ---------------------------------------------------------------------------

namespace {

const int kXtcMagic = 1995;

const int kMagicInts[] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0,
    8, 10, 12, 16, 20, 25, 32, 40, 50, 64,
    80, 101, 128, 161, 203, 256, 322, 406, 512, 645,
    812, 1024, 1290, 1625, 2048, 2580, 3250, 4096, 5060, 6501,
    8192, 10321, 13003, 16384, 20642, 26007, 32768, 41285, 52015, 65536,
    82570, 104031, 131072, 165140, 208063, 262144, 330280, 416127,
    524287, 660561, 832255, 1048576, 1321122, 1664510, 2097152,
    2642245, 3329021, 4194304, 5284491, 6658042, 8388607, 10568983,
    13316085, 16777216};
const int kFirstIdx = 9;
const int kLastIdx = (int)(sizeof(kMagicInts) / sizeof(*kMagicInts));

inline int magic_at(int idx) {
    if (idx >= kLastIdx) idx = kLastIdx - 1;
    return kMagicInts[idx];
}

inline uint32_t be32(const unsigned char* p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
           ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

inline int32_t be_i32(const unsigned char* p) { return (int32_t)be32(p); }

inline float be_f32(const unsigned char* p) {
    uint32_t v = be32(p);
    float f;
    memcpy(&f, &v, 4);
    return f;
}

// bits needed to hold values in [0, size)
int bits_for(uint32_t size) {
    uint64_t n = 1;
    int bits = 0;
    while (size >= n && bits < 32) {
        ++bits;
        n <<= 1;
    }
    return bits;
}

// bits needed for three values packed in mixed radix (bases `sizes`)
int bits_for_triple(const uint32_t sizes[3]) {
    // 3 * 24-bit max fits in 72 bits; use 128-bit arithmetic
    unsigned __int128 prod =
        (unsigned __int128)sizes[0] * sizes[1] * sizes[2];
    int nbytes = 1;
    unsigned __int128 t = prod >> 8;
    while (t != 0) {
        ++nbytes;
        t >>= 8;
    }
    uint32_t top = (uint32_t)(prod >> (8 * (nbytes - 1)));
    return 8 * (nbytes - 1) + bits_for(top);
}

struct BitReader {
    const unsigned char* data;
    size_t size;
    size_t pos = 0;
    int nheld = 0;
    uint64_t held = 0;
    bool overrun = false;

    uint32_t read(int nbits) {
        while (nheld < nbits) {
            if (pos >= size) {
                overrun = true;
                return 0;
            }
            held = (held << 8) | data[pos++];
            nheld += 8;
        }
        nheld -= nbits;
        uint32_t out = (uint32_t)((held >> nheld) &
                                  (((uint64_t)1 << nbits) - 1));
        held &= ((uint64_t)1 << nheld) - 1;
        return out;
    }

    // nbits-wide packed integer stored as little-endian bytes
    // (full 8-bit chunks first, top partial chunk last)
    unsigned __int128 read_packed(int nbits) {
        unsigned __int128 val = 0;
        int shift = 0;
        while (nbits > 8) {
            val |= (unsigned __int128)read(8) << shift;
            shift += 8;
            nbits -= 8;
        }
        if (nbits > 0) val |= (unsigned __int128)read(nbits) << shift;
        return val;
    }

    void read_triple(int nbits, const uint32_t sizes[3], int32_t out[3]) {
        unsigned __int128 v = read_packed(nbits);
        out[2] = (int32_t)(v % sizes[2]);
        v /= sizes[2];
        out[1] = (int32_t)(v % sizes[1]);
        out[0] = (int32_t)(v / sizes[1]);
    }
};

// Decode one frame's compressed coordinate block starting at `off`.
// Returns the offset just past the block, or 0 on error.
size_t xtc_decode_block(const unsigned char* data, size_t size, size_t off,
                        int64_t natoms, float* out) {
    if (off + 40 > size) return 0;
    int32_t lsize = be_i32(data + off);
    float precision = be_f32(data + off + 4);
    if (lsize != natoms || precision <= 0) return 0;
    int32_t minint[3], maxint[3];
    for (int d = 0; d < 3; ++d) {
        minint[d] = be_i32(data + off + 8 + 4 * d);
        maxint[d] = be_i32(data + off + 20 + 4 * d);
    }
    int smallidx = be_i32(data + off + 32);
    int32_t nbytes = be_i32(data + off + 36);
    off += 40;
    if (nbytes < 0 || off + (size_t)nbytes > size) return 0;
    size_t next = off + (((size_t)nbytes + 3) & ~(size_t)3);

    uint32_t sizeint[3];
    for (int d = 0; d < 3; ++d) {
        if (maxint[d] < minint[d]) return 0;  // corrupt header
        sizeint[d] = (uint32_t)(maxint[d] - minint[d] + 1);
    }
    int bitsizeint[3] = {0, 0, 0};
    int bitsize;
    if ((sizeint[0] | sizeint[1] | sizeint[2]) > 0xFFFFFF) {
        for (int d = 0; d < 3; ++d) bitsizeint[d] = bits_for(sizeint[d]);
        bitsize = 0;
    } else {
        bitsize = bits_for_triple(sizeint);
    }

    if (smallidx < 0 || smallidx >= kLastIdx) return 0;
    int smallnum = magic_at(smallidx) / 2;
    int tmpidx = smallidx - 1;
    if (tmpidx < kFirstIdx) tmpidx = kFirstIdx;
    int smaller = magic_at(tmpidx) / 2;
    uint32_t sizesmall[3];
    sizesmall[0] = sizesmall[1] = sizesmall[2] =
        (uint32_t)magic_at(smallidx);

    BitReader br{data + off, (size_t)nbytes};
    float inv = 1.0f / precision;
    int run = 0;
    int64_t i = 0, outp = 0;
    int32_t thiscoord[3], prevcoord[3];
    while (i < natoms) {
        if (bitsize == 0) {
            for (int d = 0; d < 3; ++d)
                thiscoord[d] = (int32_t)br.read(bitsizeint[d]);
        } else {
            br.read_triple(bitsize, sizeint, thiscoord);
        }
        for (int d = 0; d < 3; ++d) thiscoord[d] += minint[d];
        for (int d = 0; d < 3; ++d) prevcoord[d] = thiscoord[d];
        ++i;

        int is_smaller = 0;
        if (br.read(1)) {
            run = (int)br.read(5);
            is_smaller = run % 3;
            run -= is_smaller;
            --is_smaller;
        }
        if (br.overrun || outp >= natoms) return 0;
        if (run > 0) {
            for (int k = 0; k < run; k += 3) {
                // bounds BEFORE writing: a corrupt run header may claim
                // more atoms than the caller-sized output buffer holds
                if (i >= natoms || outp + (k == 0 ? 2 : 1) > natoms)
                    return 0;
                br.read_triple(smallidx, sizesmall, thiscoord);
                ++i;
                for (int d = 0; d < 3; ++d)
                    thiscoord[d] += prevcoord[d] - smallnum;
                if (k == 0) {
                    // the encoder stored these two atoms swapped (water
                    // heuristic); emit swapped, keep the delta-decoded
                    // atom as the base of the next delta
                    for (int d = 0; d < 3; ++d) {
                        int32_t t = thiscoord[d];
                        thiscoord[d] = prevcoord[d];
                        prevcoord[d] = t;
                    }
                    for (int d = 0; d < 3; ++d)
                        out[3 * outp + d] = prevcoord[d] * inv;
                    ++outp;
                } else {
                    for (int d = 0; d < 3; ++d) prevcoord[d] = thiscoord[d];
                }
                for (int d = 0; d < 3; ++d)
                    out[3 * outp + d] = thiscoord[d] * inv;
                ++outp;
            }
        } else {
            for (int d = 0; d < 3; ++d)
                out[3 * outp + d] = thiscoord[d] * inv;
            ++outp;
        }
        smallidx += is_smaller;
        if (is_smaller < 0) {
            smallnum = smaller;
            smaller =
                (smallidx > kFirstIdx) ? magic_at(smallidx - 1) / 2 : 0;
        } else if (is_smaller > 0) {
            smaller = smallnum;
            smallnum = magic_at(smallidx) / 2;
        }
        sizesmall[0] = sizesmall[1] = sizesmall[2] =
            (uint32_t)magic_at(smallidx);
        if (br.overrun || outp > natoms) return 0;
    }
    return next;
}

// Advance past one frame without decoding; returns end offset or 0.
size_t xtc_skip_frame(const unsigned char* data, size_t size, size_t off,
                      int64_t* natoms_out, float* time_out) {
    if (off + 16 > size) return 0;
    if (be_i32(data + off) != kXtcMagic) return 0;
    int32_t natoms = be_i32(data + off + 4);
    if (time_out) *time_out = be_f32(data + off + 12);
    if (natoms_out) *natoms_out = natoms;
    off += 16 + 36;  // header + box
    if (natoms <= 9) {
        off += 4 + (size_t)natoms * 12;  // repeated lsize + plain floats
        return off <= size ? off : 0;
    }
    if (off + 40 > size) return 0;
    int32_t nbytes = be_i32(data + off + 36);
    if (nbytes < 0) return 0;
    off += 40 + (((size_t)nbytes + 3) & ~(size_t)3);
    return off <= size ? off : 0;
}

}  // namespace

extern "C" {

// Scan an XTC file: count frames and atoms (all frames must agree).
int xtc_scan(const char* path, int64_t* n_frames, int64_t* n_atoms) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    size_t size = (size_t)st.st_size;
    if (size == 0) { close(fd); *n_frames = 0; *n_atoms = 0; return 0; }
    const unsigned char* data = (const unsigned char*)mmap(
        nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return -3;

    int64_t frames = 0, atoms = 0;
    size_t off = 0;
    int rc = 0;
    while (off + 16 <= size) {
        int64_t na = 0;
        size_t next = xtc_skip_frame(data, size, off, &na, nullptr);
        if (next == 0) { rc = -4; break; }
        if (frames == 0) {
            atoms = na;
        } else if (na != atoms) { rc = -5; break; }
        ++frames;
        off = next;
    }
    munmap((void*)data, size);
    *n_frames = frames;
    *n_atoms = atoms;
    return rc;
}

// Encode frames into an XTC file; bit-identical with the Python codec in
// colvarsfinder_tpu/utils/xtc.py (write_xtc), which remains the
// correctness oracle in tests/test_xtc.py. Returns frames written, or a
// negative error code (-5: coordinate overflow at the given precision).
int64_t xtc_encode(const char* path, const float* coords, int64_t n_frames,
                   int64_t n_atoms, double precision, const double* box9,
                   double t0_ps, double dt_ps, int64_t step_interval);

// Decode all frames into coords[n_frames * n_atoms * 3] and
// times[n_frames]. Returns the number of frames decoded.
int64_t xtc_decode(const char* path, float* coords, float* times,
                   int64_t n_frames, int64_t n_atoms) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    size_t size = (size_t)st.st_size;
    const unsigned char* data = (const unsigned char*)mmap(
        nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return -3;

    size_t off = 0;
    int64_t f = 0;
    while (f < n_frames && off + 16 <= size) {
        if (be_i32(data + off) != kXtcMagic) break;
        int32_t natoms = be_i32(data + off + 4);
        if (natoms != n_atoms) break;
        times[f] = be_f32(data + off + 12);
        off += 16 + 36;
        float* dst = coords + (size_t)f * n_atoms * 3;
        if (natoms <= 9) {
            if (off + 4 + (size_t)natoms * 12 > size) break;
            if (be_i32(data + off) != natoms) break;  // repeated lsize
            off += 4;
            for (int64_t a = 0; a < 3 * natoms; ++a)
                dst[a] = be_f32(data + off + 4 * a);
            off += (size_t)natoms * 12;
        } else {
            size_t next = xtc_decode_block(data, size, off, natoms, dst);
            if (next == 0) break;
            off = next;
        }
        ++f;
    }
    munmap((void*)data, size);
    return f;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// XTC bulk encoder. Mirrors colvarsfinder_tpu/utils/xtc.py write_xtc /
// _encode_frame_coords statement-for-statement so the output files are
// byte-identical (asserted in tests/test_xtc.py); per-bit encoding in
// Python is ~100x slower on long trajectories.
// ---------------------------------------------------------------------------

#include <cmath>
#include <vector>

namespace {

inline void be_store32(std::vector<unsigned char>& out, uint32_t v) {
    out.push_back((unsigned char)(v >> 24));
    out.push_back((unsigned char)(v >> 16));
    out.push_back((unsigned char)(v >> 8));
    out.push_back((unsigned char)v);
}

inline void be_store_f32(std::vector<unsigned char>& out, float f) {
    uint32_t v;
    memcpy(&v, &f, 4);
    be_store32(out, v);
}

struct BitWriter {
    std::vector<unsigned char> out;
    int nheld = 0;
    uint64_t held = 0;

    void write(int nbits, uint32_t value) {  // nbits <= 32
        held = (held << nbits) |
               (value & ((nbits >= 32) ? 0xFFFFFFFFull
                                       : (((uint64_t)1 << nbits) - 1)));
        nheld += nbits;
        while (nheld >= 8) {
            nheld -= 8;
            out.push_back((unsigned char)((held >> nheld) & 0xFF));
        }
        held &= ((uint64_t)1 << nheld) - 1;
    }

    void write_zeros(int nbits) {
        while (nbits > 24) {
            write(24, 0);
            nbits -= 24;
        }
        if (nbits > 0) write(nbits, 0);
    }

    // nbits-wide field as little-endian bytes: full 8-bit chunks first,
    // the top (possibly partial) chunk last, zero-padded to nbits
    void write_packed(int nbits, unsigned __int128 value) {
        int bl = 0;
        for (unsigned __int128 t = value; t != 0; t >>= 1) ++bl;
        int nb = (bl == 0) ? 1 : (bl + 7) / 8;
        if (nbits >= nb * 8) {
            for (int j = 0; j < nb; ++j)
                write(8, (uint32_t)((value >> (8 * j)) & 0xFF));
            write_zeros(nbits - nb * 8);
        } else {
            for (int j = 0; j < nb - 1; ++j)
                write(8, (uint32_t)((value >> (8 * j)) & 0xFF));
            write(nbits - (nb - 1) * 8,
                  (uint32_t)(value >> (8 * (nb - 1))));
        }
    }

    void write_triple(int nbits, const uint32_t sizes[3],
                      const int32_t abc[3]) {
        unsigned __int128 packed =
            ((unsigned __int128)(uint32_t)abc[0] * sizes[1] +
             (uint32_t)abc[1]) *
                sizes[2] +
            (uint32_t)abc[2];
        write_packed(nbits, packed);
    }

    void flush_tail() {
        if (nheld) {
            out.push_back((unsigned char)((held << (8 - nheld)) & 0xFF));
            nheld = 0;
            held = 0;
        }
    }
};

// Encode one frame's coordinate block (the part after the 16+36-byte frame
// header) into `blk`. Returns false on coordinate overflow.
bool xtc_encode_block(const float* frame, int64_t natoms, double precision,
                      std::vector<int32_t>& ints,
                      std::vector<unsigned char>& blk) {
    const double kMaxAbs = 2147483646.0;  // 2^31 - 2
    ints.resize((size_t)natoms * 3);
    for (int64_t a = 0; a < 3 * natoms; ++a) {
        double q = (double)frame[a] * precision;
        double r = (q >= 0) ? floor(q + 0.5) : ceil(q - 0.5);
        if (fabs(r) >= kMaxAbs) return false;
        ints[a] = (int32_t)r;
    }
    int32_t minint[3], maxint[3];
    for (int d = 0; d < 3; ++d) minint[d] = maxint[d] = ints[d];
    for (int64_t a = 1; a < natoms; ++a)
        for (int d = 0; d < 3; ++d) {
            int32_t v = ints[3 * a + d];
            if (v < minint[d]) minint[d] = v;
            if (v > maxint[d]) maxint[d] = v;
        }
    uint32_t sizeint[3];
    for (int d = 0; d < 3; ++d)
        sizeint[d] = (uint32_t)(maxint[d] - minint[d] + 1);
    int bitsizeint[3] = {0, 0, 0};
    int bitsize;
    if ((sizeint[0] | sizeint[1] | sizeint[2]) > 0xFFFFFF) {
        for (int d = 0; d < 3; ++d) bitsizeint[d] = bits_for(sizeint[d]);
        bitsize = 0;
    } else {
        bitsize = bits_for_triple(sizeint);
    }

    // smallest inter-atom step sets the starting magnitude class
    int64_t mindiff = 2147483647;
    for (int64_t a = 0; a + 1 < natoms; ++a) {
        int64_t s = 0;
        for (int d = 0; d < 3; ++d)
            s += llabs((int64_t)ints[3 * (a + 1) + d] - ints[3 * a + d]);
        if (s < mindiff) mindiff = s;
    }
    int smallidx = kFirstIdx;
    while (smallidx < kLastIdx - 1 && kMagicInts[smallidx] < mindiff)
        ++smallidx;

    const int smallidx0 = smallidx;
    int maxidx = smallidx + 8;
    if (maxidx > kLastIdx - 1) maxidx = kLastIdx - 1;
    int minidx = maxidx - 8;
    int larger = magic_at(maxidx) / 2;
    int smallnum = magic_at(smallidx) / 2;
    int tmpidx = smallidx - 1;
    if (tmpidx < kFirstIdx) tmpidx = kFirstIdx;
    int smaller = magic_at(tmpidx) / 2;
    uint32_t sizesmall[3];
    sizesmall[0] = sizesmall[1] = sizesmall[2] =
        (uint32_t)magic_at(smallidx);

    BitWriter w;
    int prevrun = -1;
    int32_t prev[3] = {0, 0, 0};
    int32_t thisc[3];
    int32_t deltas[24];
    int64_t i = 0;
    while (i < natoms) {
        for (int d = 0; d < 3; ++d) thisc[d] = ints[3 * i + d];
        int is_smaller;
        if (smallidx < maxidx && i >= 1 &&
            llabs((int64_t)thisc[0] - prev[0]) < larger &&
            llabs((int64_t)thisc[1] - prev[1]) < larger &&
            llabs((int64_t)thisc[2] - prev[2]) < larger) {
            is_smaller = 1;
        } else if (smallidx > minidx) {
            is_smaller = -1;
        } else {
            is_smaller = 0;
        }
        // swap this atom with the next when they are close (water
        // heuristic)
        bool is_small =
            i + 1 < natoms &&
            llabs((int64_t)thisc[0] - ints[3 * (i + 1)]) < smallnum &&
            llabs((int64_t)thisc[1] - ints[3 * (i + 1) + 1]) < smallnum &&
            llabs((int64_t)thisc[2] - ints[3 * (i + 1) + 2]) < smallnum;
        if (is_small) {
            for (int d = 0; d < 3; ++d) {
                int32_t t = thisc[d];
                thisc[d] = ints[3 * (i + 1) + d];
                ints[3 * (i + 1) + d] = t;
            }
        }

        if (bitsize == 0) {
            for (int d = 0; d < 3; ++d)
                w.write(bitsizeint[d], (uint32_t)(thisc[d] - minint[d]));
        } else {
            int32_t rel[3];
            for (int d = 0; d < 3; ++d) rel[d] = thisc[d] - minint[d];
            w.write_triple(bitsize, sizeint, rel);
        }
        for (int d = 0; d < 3; ++d) prev[d] = thisc[d];
        ++i;

        int run = 0;
        if (!is_small && is_smaller == -1) is_smaller = 0;
        while (is_small && run < 24) {
            for (int d = 0; d < 3; ++d) thisc[d] = ints[3 * i + d];
            if (is_smaller == -1) {
                int64_t sq = 0;
                for (int d = 0; d < 3; ++d) {
                    int64_t df = (int64_t)thisc[d] - prev[d];
                    sq += df * df;
                }
                if (sq >= (int64_t)smaller * smaller) is_smaller = 0;
            }
            for (int d = 0; d < 3; ++d)
                deltas[run + d] = thisc[d] - prev[d] + smallnum;
            run += 3;
            for (int d = 0; d < 3; ++d) prev[d] = thisc[d];
            ++i;
            is_small = i < natoms &&
                       llabs((int64_t)ints[3 * i] - prev[0]) < smallnum &&
                       llabs((int64_t)ints[3 * i + 1] - prev[1]) <
                           smallnum &&
                       llabs((int64_t)ints[3 * i + 2] - prev[2]) < smallnum;
        }
        if (run != prevrun || is_smaller != 0) {
            prevrun = run;
            w.write(1, 1);
            w.write(5, (uint32_t)(run + is_smaller + 1));
        } else {
            w.write(1, 0);
        }
        for (int k = 0; k < run; k += 3)
            w.write_triple(smallidx, sizesmall, deltas + k);
        if (is_smaller != 0) {
            smallidx += is_smaller;
            if (is_smaller < 0) {
                smallnum = smaller;
                smaller = magic_at(smallidx - 1) / 2;
            } else {
                smaller = smallnum;
                smallnum = magic_at(smallidx) / 2;
            }
            sizesmall[0] = sizesmall[1] = sizesmall[2] =
                (uint32_t)magic_at(smallidx);
        }
    }
    w.flush_tail();

    be_store32(blk, (uint32_t)natoms);
    be_store_f32(blk, (float)precision);
    for (int d = 0; d < 3; ++d) be_store32(blk, (uint32_t)minint[d]);
    for (int d = 0; d < 3; ++d) be_store32(blk, (uint32_t)maxint[d]);
    be_store32(blk, (uint32_t)smallidx0);
    be_store32(blk, (uint32_t)w.out.size());
    blk.insert(blk.end(), w.out.begin(), w.out.end());
    size_t pad = (4 - (w.out.size() & 3)) & 3;
    for (size_t p = 0; p < pad; ++p) blk.push_back(0);
    return true;
}

}  // namespace

extern "C" {

int64_t xtc_encode(const char* path, const float* coords, int64_t n_frames,
                   int64_t n_atoms, double precision, const double* box9,
                   double t0_ps, double dt_ps, int64_t step_interval) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    std::vector<unsigned char> buf;
    std::vector<int32_t> ints;
    int64_t written = 0;
    for (int64_t j = 0; j < n_frames; ++j) {
        buf.clear();
        be_store32(buf, (uint32_t)kXtcMagic);
        be_store32(buf, (uint32_t)n_atoms);
        be_store32(buf, (uint32_t)(int32_t)(j * step_interval));
        be_store_f32(buf, (float)(t0_ps + (double)j * dt_ps));
        for (int b = 0; b < 9; ++b) be_store_f32(buf, (float)box9[b]);
        const float* frame = coords + (size_t)j * n_atoms * 3;
        if (n_atoms <= 9) {
            be_store32(buf, (uint32_t)n_atoms);  // repeated lsize
            for (int64_t a = 0; a < 3 * n_atoms; ++a)
                be_store_f32(buf, frame[a]);
        } else {
            if (!xtc_encode_block(frame, n_atoms, precision, ints, buf)) {
                fclose(f);
                return -5;
            }
        }
        if (fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
            fclose(f);
            return written;
        }
        ++written;
    }
    fclose(f);
    return written;
}

}  // extern "C"
