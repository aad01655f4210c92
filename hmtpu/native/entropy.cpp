// Native CABAC entropy tail for the hmtpu encoder.
//
// The encoder's batched device passes reduce each frame to a compact
// decision stream (CU-level bins recorded by entropy/recorder.py plus
// per-TB quantised level arrays).  This engine replays that stream
// through the binary arithmetic coder and the full residual_coding()
// syntax (H.265 7.3.8.11 / 9.3.4.3) in one C call — the inherently
// serial tail the reference runs in TEncBinCoderCABAC.cpp:69-440 and
// TEncSbac::codeCoeffNxN (TEncSbac.cpp:1181).
//
// All spec tables (state transitions, LPS ranges, renorm, scan orders,
// context-offset layout) are injected from Python so the single source
// of truth stays in hmtpu/common/spec_tables.py; the Python engine in
// entropy/cabac.py is the bit-exact reference this file is validated
// against (tests/test_native_entropy.py).

#include <cstdint>
#include <cstring>

namespace {

struct Tables {
    const uint8_t* next_mps;     // 128
    const uint8_t* next_lps;     // 128
    const uint8_t* lps_tab;      // 64 * 4
    const uint8_t* renorm;       // 32
    const int32_t* scan_blob;    // packed scan tables
    const int32_t* scan_index;   // 12 offsets: (log2-2)*3 + scan_idx
    const int32_t* off;          // ctx offsets, see OFF_* below
    const int32_t* ctx4x4;       // 16-entry sig ctx map for 4x4
};

enum {
    OFF_LAST_X = 0, OFF_LAST_Y, OFF_LAST_X_C, OFF_LAST_Y_C,
    OFF_SIG_CG, OFF_SIG, OFF_ONE, OFF_ABS,
};

struct Enc {
    uint64_t low;
    uint32_t range;
    int bits_left;
    int num_buffered;
    uint32_t buffered_byte;
    uint8_t* out;
    int64_t pos, cap;
    uint8_t* ctx;
    const Tables* t;
    bool overflow;

    void put(uint8_t b) {
        if (pos >= cap) { overflow = true; return; }
        out[pos++] = b;
    }

    void test_write() {
        if (bits_left < 12) {
            uint32_t lead = (uint32_t)(low >> (24 - bits_left));
            bits_left += 8;
            low &= 0xFFFFFFFFull >> bits_left;
            if (lead == 0xFF) {
                num_buffered++;
            } else if (num_buffered > 0) {
                uint32_t carry = lead >> 8;
                put((uint8_t)((buffered_byte + carry) & 0xFF));
                uint8_t fill = (uint8_t)((0xFF + carry) & 0xFF);
                while (num_buffered > 1) { put(fill); num_buffered--; }
                buffered_byte = lead & 0xFF;
                num_buffered = 1;
            } else {
                num_buffered = 1;
                buffered_byte = lead;
            }
        }
    }

    void encode_bin(int idx, int bin) {
        uint8_t state = ctx[idx];
        uint32_t lps = t->lps_tab[(state >> 1) * 4 + ((range >> 6) & 3)];
        range -= lps;
        if (bin != (state & 1)) {
            int nb = t->renorm[lps >> 3];
            low = (low + range) << nb;
            range = lps << nb;
            ctx[idx] = t->next_lps[state];
            bits_left -= nb;
            test_write();
        } else {
            ctx[idx] = t->next_mps[state];
            if (range < 256) {
                low <<= 1;
                range <<= 1;
                bits_left -= 1;
                test_write();
            }
        }
    }

    void encode_aligned_bins_ep(uint32_t value, int num_bins) {
        int remaining = num_bins;
        while (remaining > 0) {
            int take = remaining < 8 ? remaining : 8;
            uint32_t mask = (1u << take) - 1;
            uint32_t bins = (value >> (remaining - take)) & mask;
            low = (low << take) + ((uint64_t)bins << 8);
            remaining -= take;
            bits_left -= take;
            test_write();
        }
    }

    void encode_bin_ep(int bin) {
        if (range == 256) { encode_aligned_bins_ep(bin, 1); return; }
        low <<= 1;
        if (bin) low += range;
        bits_left -= 1;
        test_write();
    }

    void encode_bins_ep(uint32_t value, int num_bins) {
        if (range == 256) { encode_aligned_bins_ep(value, num_bins); return; }
        while (num_bins > 8) {
            num_bins -= 8;
            uint32_t pattern = value >> num_bins;
            low = (low << 8) + (uint64_t)range * pattern;
            value -= pattern << num_bins;
            bits_left -= 8;
            test_write();
        }
        low = (low << num_bins) + (uint64_t)range * value;
        bits_left -= num_bins;
        test_write();
    }

    void encode_bin_trm(int bin) {
        range -= 2;
        if (bin) {
            low += range;
            low <<= 7;
            range = 2 << 7;
            bits_left -= 7;
        } else if (range >= 256) {
            return;
        } else {
            low <<= 1;
            range <<= 1;
            bits_left -= 1;
        }
        test_write();
    }

    // finish + stop bit + byte alignment (end of slice data)
    void finish_and_terminate() {
        if (low >> (32 - bits_left)) {
            put((uint8_t)(buffered_byte + 1));
            while (num_buffered > 1) { put(0x00); num_buffered--; }
            low -= 1ull << (32 - bits_left);
        } else {
            if (num_buffered > 0) put((uint8_t)buffered_byte);
            while (num_buffered > 1) { put(0xFF); num_buffered--; }
        }
        // trailing partial bits of low, then rbsp stop bit + align
        int nbits = 24 - bits_left;
        uint64_t tail = (low >> 8) & ((1ull << nbits) - 1);
        // append the stop bit
        tail = (tail << 1) | 1;
        nbits += 1;
        int pad = (8 - (nbits & 7)) & 7;
        tail <<= pad;
        nbits += pad;
        for (int sh = nbits - 8; sh >= 0; sh -= 8)
            put((uint8_t)((tail >> sh) & 0xFF));
    }
};

// ---------------------------------------------------------------------
// residual_coding (port of entropy/residual.py::encode_residual)

inline int last_goff(int log2, bool luma) {
    return luma ? 3 * (log2 - 2) + ((log2 - 1) >> 2) : 0;
}
inline int last_gshift(int log2, bool luma) {
    return luma ? (log2 + 1) >> 2 : log2 - 2;
}
inline int group_idx(int pos) {
    if (pos < 4) return pos;
    int bl = 32 - __builtin_clz((unsigned)pos);
    return ((bl - 1) << 1) + ((pos >> (bl - 2)) & 1);
}
inline int min_in_group(int g) {
    if (g < 4) return g;
    return (2 + (g & 1)) << ((g >> 1) - 1);
}

inline int sig_ctx_inc(const Tables* t, int patt, int x, int y, int log2,
                       int scan_idx, bool luma) {
    if (log2 == 2) return t->ctx4x4[(y << 2) + x];
    if (x + y == 0) return 0;
    int xp = x & 3, yp = y & 3, sig;
    if (patt == 0) sig = (xp + yp == 0) ? 2 : (xp + yp < 3 ? 1 : 0);
    else if (patt == 1) sig = (yp == 0) ? 2 : (yp == 1 ? 1 : 0);
    else if (patt == 2) sig = (xp == 0) ? 2 : (xp == 1 ? 1 : 0);
    else sig = 2;
    if (luma) {
        if ((x >> 2) + (y >> 2) > 0) sig += 3;
        sig += (log2 == 3) ? (scan_idx == 0 ? 9 : 15) : 21;
    } else {
        sig += (log2 == 3) ? 9 : 12;
    }
    return sig;
}

void write_remainder(Enc& e, int symbol, int rice) {
    if (symbol < (3 << rice)) {
        int length = symbol >> rice;
        e.encode_bins_ep((1u << (length + 1)) - 2, length + 1);
        if (rice) e.encode_bins_ep(symbol & ((1 << rice) - 1), rice);
    } else {
        int length = rice;
        symbol -= 3 << rice;
        while (symbol >= (1 << length)) { symbol -= 1 << length; length++; }
        e.encode_bins_ep((1u << (3 + length + 1 - rice)) - 2,
                         3 + length + 1 - rice);
        if (length) e.encode_bins_ep(symbol, length);
    }
}

constexpr int SIG_CHROMA_OFF = 28;
constexpr int C1FLAG_NUMBER = 8;
constexpr int SCAN_VER_IDX = 2;

void encode_residual(Enc& e, const int32_t* levels, int log2, bool luma,
                     int scan_idx, bool sdh) {
    const Tables* t = e.t;
    const int32_t* off = t->off;
    int size = 1 << log2;
    const int32_t* tab =
        t->scan_blob + t->scan_index[(log2 - 2) * 3 + scan_idx];
    int num_cg = tab[0];
    const int32_t* cg_order = tab + 1;             // num_cg raster ids
    const int32_t* scans = tab + 1 + num_cg;       // num_cg * 16 rasters
    int cg_w = size >> 2 > 0 ? size >> 2 : 1;

    int32_t scan_flat[1024];
    int last_scan_pos = -1;
    for (int i = 0; i < num_cg * 16; i++) {
        scan_flat[i] = levels[scans[i]];
        if (scan_flat[i]) last_scan_pos = i;
    }
    int last_cg = last_scan_pos >> 4;
    int last_raster = scans[last_scan_pos];
    int last_x = last_raster % size, last_y = last_raster / size;
    if (scan_idx == SCAN_VER_IDX) { int tmp = last_x; last_x = last_y; last_y = tmp; }

    // ---- last position
    int goff = last_goff(log2, luma), gshift = last_gshift(log2, luma);
    int gx = group_idx(last_x), gy = group_idx(last_y);
    int cmax = (log2 << 1) - 1;
    int ctx_x = off[luma ? OFF_LAST_X : OFF_LAST_X_C];
    int ctx_y = off[luma ? OFF_LAST_Y : OFF_LAST_Y_C];
    for (int b = 0; b < gx; b++)
        e.encode_bin(ctx_x + goff + (b >> gshift), 1);
    if (gx < cmax) e.encode_bin(ctx_x + goff + (gx >> gshift), 0);
    for (int b = 0; b < gy; b++)
        e.encode_bin(ctx_y + goff + (b >> gshift), 1);
    if (gy < cmax) e.encode_bin(ctx_y + goff + (gy >> gshift), 0);
    if (gx > 3) e.encode_bins_ep(last_x - min_in_group(gx), (gx >> 1) - 1);
    if (gy > 3) e.encode_bins_ep(last_y - min_in_group(gy), (gy >> 1) - 1);

    // coded_sub_block_flag maps
    bool cg_sig_scan[64], cg_sig_raster[64];
    for (int ci = 0; ci < num_cg; ci++) {
        bool any = false;
        for (int p = 0; p < 16; p++) any |= scan_flat[ci * 16 + p] != 0;
        cg_sig_scan[ci] = any;
    }
    for (int ci = 0; ci < num_cg; ci++)
        cg_sig_raster[cg_order[ci]] = cg_sig_scan[ci];

    int c1 = 1;
    for (int ci = last_cg; ci >= 0; ci--) {
        int cg_r = cg_order[ci];
        int cg_x = cg_r % cg_w, cg_y = cg_r / cg_w;
        bool infer_dc = false;
        if (0 < ci && ci < last_cg) {
            bool right = cg_x + 1 < cg_w && cg_sig_raster[cg_r + 1];
            bool below = cg_y + 1 < cg_w && cg_sig_raster[cg_r + cg_w];
            int ctx_inc = off[OFF_SIG_CG] + (luma ? 0 : 2)
                          + ((right || below) ? 1 : 0);
            e.encode_bin(ctx_inc, cg_sig_scan[ci] ? 1 : 0);
            infer_dc = cg_sig_scan[ci];
            if (!cg_sig_scan[ci]) continue;
        }
        bool right = cg_x + 1 < cg_w && cg_sig_raster[cg_y * cg_w + cg_x + 1];
        bool below = cg_y + 1 < cg_w && cg_sig_raster[(cg_y + 1) * cg_w + cg_x];
        int patt = (right ? 1 : 0) | (below ? 2 : 0);

        // ---- sig_coeff_flag (reverse scan within CG)
        int sig_pos[16], sig_lv[16];
        int n = 0;
        int start;
        if (ci == last_cg) {
            start = (last_scan_pos & 15) - 1;
            sig_pos[n] = last_scan_pos & 15;
            sig_lv[n++] = scan_flat[last_scan_pos];
        } else {
            start = 15;
        }
        for (int p = start; p >= 0; p--) {
            int lv = scan_flat[ci * 16 + p];
            bool sig = lv != 0;
            if (!(p == 0 && infer_dc)) {
                int raster = scans[ci * 16 + p];
                int x = raster % size, y = raster / size;
                int sc = sig_ctx_inc(t, patt, x, y, log2, scan_idx, luma);
                e.encode_bin(off[OFF_SIG] + (luma ? sc : SIG_CHROMA_OFF + sc),
                             sig ? 1 : 0);
            }
            if (sig) { sig_pos[n] = p; sig_lv[n++] = lv; }
            if (sig && p > 0) infer_dc = false;
        }

        // ---- greater1/greater2, signs, remainders
        int abs_lv[16], signs[16];
        for (int i = 0; i < n; i++) {
            abs_lv[i] = sig_lv[i] < 0 ? -sig_lv[i] : sig_lv[i];
            signs[i] = sig_lv[i] < 0 ? 1 : 0;
        }
        int ctx_set = ((ci > 0 && luma) ? 2 : 0) + (c1 == 0 ? 1 : 0);
        c1 = 1;
        int first_g2 = -1;
        int lim = n < C1FLAG_NUMBER ? n : C1FLAG_NUMBER;
        for (int i = 0; i < lim; i++) {
            int g1 = abs_lv[i] > 1 ? 1 : 0;
            e.encode_bin(off[OFF_ONE] + (luma ? 0 : 16) + ctx_set * 4 + c1,
                         g1);
            if (g1) {
                c1 = 0;
                if (first_g2 < 0) first_g2 = i;
            } else if (0 < c1 && c1 < 3) {
                c1++;
            }
        }
        if (first_g2 >= 0)
            e.encode_bin(off[OFF_ABS] + (luma ? ctx_set : 4 + ctx_set),
                         abs_lv[first_g2] > 2 ? 1 : 0);

        bool hide = sdh && (sig_pos[0] - sig_pos[n - 1] > 3);
        int nsign = hide ? n - 1 : n;
        for (int i = 0; i < nsign; i++) e.encode_bin_ep(signs[i]);

        int rice = 0, first_coeff2 = 1;
        for (int i = 0; i < n; i++) {
            int base = (i < C1FLAG_NUMBER) ? (2 + first_coeff2) : 1;
            if (abs_lv[i] >= base) {
                write_remainder(e, abs_lv[i] - base, rice);
                if (abs_lv[i] > (3 << rice)) rice = rice < 4 ? rice + 1 : 4;
            }
            if (abs_lv[i] >= 2) first_coeff2 = 0;
        }
    }
}

}  // namespace

// ---------------------------------------------------------------------
// command stream: 4 int32 per command [op, a, b, c]
enum {
    OP_BIN = 0,        // a=ctx idx, b=bin
    OP_BIN_EP = 1,     // a=bin
    OP_BINS_EP = 2,    // a=value, b=num_bins
    OP_TRM = 3,        // a=bin
    OP_RESIDUAL = 4,   // a=log2|(scan<<4)|(luma<<8)|(sdh<<9), b=lvl offset
    OP_TERMINATE = 5,  // trm(1) + finish + stop bit + align
};

extern "C" int64_t hmtpu_entropy_encode(
    const uint8_t* next_mps, const uint8_t* next_lps,
    const uint8_t* lps_tab, const uint8_t* renorm,
    const int32_t* scan_blob, const int32_t* scan_index,
    const int32_t* off, const int32_t* ctx4x4,
    uint8_t* ctx, const int32_t* cmds, int64_t num_cmds,
    const int32_t* levels, uint8_t* out, int64_t out_cap) {
    Tables t{next_mps, next_lps, lps_tab, renorm,
             scan_blob, scan_index, off, ctx4x4};
    Enc e;
    e.low = 0; e.range = 510; e.bits_left = 23;
    e.num_buffered = 0; e.buffered_byte = 0xFF;
    e.out = out; e.pos = 0; e.cap = out_cap;
    e.ctx = ctx; e.t = &t; e.overflow = false;

    for (int64_t i = 0; i < num_cmds; i++) {
        const int32_t* c = cmds + i * 4;
        switch (c[0]) {
            case OP_BIN: e.encode_bin(c[1], c[2]); break;
            case OP_BIN_EP: e.encode_bin_ep(c[1]); break;
            case OP_BINS_EP: e.encode_bins_ep((uint32_t)c[1], c[2]); break;
            case OP_TRM: e.encode_bin_trm(c[1]); break;
            case OP_RESIDUAL: {
                int a = c[1];
                encode_residual(e, levels + c[2], a & 15, (a >> 8) & 1,
                                (a >> 4) & 3, (a >> 9) & 1);
                break;
            }
            case OP_TERMINATE:
                e.encode_bin_trm(1);
                e.finish_and_terminate();
                break;
            default:
                return -2;
        }
        if (e.overflow) return -1;
    }
    return e.pos;
}
