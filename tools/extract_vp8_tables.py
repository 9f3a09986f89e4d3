"""Regenerate embulk_spark/functions/vp8_tables.py from the system
libwebp .rodata.

The VP8 entropy tables are EMPIRICAL constants published in RFC 6386
(§13 default token probability table, §11 intra-mode trees, §14 quant
tables). They cannot be derived; transcribing 2x1056 + 900 bytes by
hand is error-prone, so this tool locates them in the system
libwebp shared object (BSD-licensed reference implementation of the
same RFC constants) by structural signatures - monotone quant runs,
the mostly-255 update table bounded by its neighbors, known first rows
- and pins them into a Python module. The committed module records the
source library version; the conformance suite then validates the
whole decoder (tables included) pixel-exactly against that library.

Usage: python tools/extract_vp8_tables.py [libwebp.so path]
"""

from __future__ import annotations

import ctypes
import struct
import sys

DEFAULT_SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"


def _findall(data: bytes, pat: bytes) -> list[int]:
    out, i = [], 0
    while True:
        j = data.find(pat, i)
        if j < 0:
            return out
        out.append(j)
        i = j + 1


def extract(path: str) -> dict:
    data = open(path, "rb").read()

    # kAcTable: the only monotone uint16[128] run starting 4,5,6,...
    ac_pat = b"".join(struct.pack("<H", v) for v in range(4, 20))
    ac_pos = _findall(data, ac_pat)[0]
    ac = list(struct.unpack("<128H", data[ac_pos:ac_pos + 256]))
    assert ac[-1] == 284 and all(a <= b for a, b in zip(ac, ac[1:]))

    # layout in quant_dec.c/tree_dec.c rodata: kAcTable(256B) then
    # kDcTable (uint8[128]) then kBands(17B,+pad) then
    # CoeffsUpdateProba (1056B, ends exactly at kBModesProba)
    dc = list(data[ac_pos + 256:ac_pos + 256 + 128])
    assert dc[:8] == [4, 5, 6, 7, 8, 9, 10, 10] and dc[-1] == 157
    bands = list(data[ac_pos + 384:ac_pos + 384 + 17])
    assert bands == [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7, 0]

    bmodes_pos = _findall(
        data, bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
    )[0]
    update = list(data[bmodes_pos - 1056:bmodes_pos])
    assert update.count(255) > 800
    bmodes = list(data[bmodes_pos:bmodes_pos + 900])

    # The table's FIRST band of type 0 is the all-128 dummy (type 0 =
    # Y-after-Y2 starts at coefficient 1 = band 1, so band 0 is never
    # read); the well-known {253, 136, ...} row is [0][1][0], 33 bytes
    # in. Anchoring on it directly shifts every band by one — the
    # round-5 conformance bug.
    coeffs_pos = _findall(
        data, bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
    )[0] - 33
    coeffs = list(data[coeffs_pos:coeffs_pos + 1056])
    assert coeffs[:33] == [128] * 33, "type-0 dummy band 0 missing"

    try:
        ver = ctypes.CDLL(path).WebPGetDecoderVersion()
        version = f"{(ver >> 16) & 0xFF}.{(ver >> 8) & 0xFF}.{ver & 0xFF}"
    except OSError:
        version = "unknown"
    return {
        "version": version,
        "AC_QLOOKUP": ac,
        "DC_QLOOKUP": dc,
        "COEF_BANDS": bands[:17],
        "COEF_UPDATE_PROBS": update,
        "COEF_PROBS": coeffs,
        "KF_BMODE_PROBS": bmodes,
    }


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SO
    t = extract(path)
    with open("embulk_spark/functions/vp8_tables.py", "w") as f:
        f.write(
            '"""VP8 entropy/quantizer constants (RFC 6386 §11/§13/§14).\n'
            "\n"
            "Empirical spec constants, NOT derivable: the default token\n"
            "probability table (§13.5), its per-frame update\n"
            "probabilities, the key-frame B_PRED mode probabilities\n"
            "(§11.5), the coefficient band mapping, and the dc/ac\n"
            "quantizer lookup tables (§14.1). Pinned by\n"
            "tools/extract_vp8_tables.py from the system libwebp "
            f"{t['version']}\n"
            "(BSD-licensed reference implementation of the same RFC) and\n"
            "validated end-to-end by tests/test_libwebp_conformance.py's\n"
            "pixel-exact decode comparison.\n"
            '"""\n\n'
        )

        def emit(name, flat, shape):
            f.write(f"#: shape {shape}\n{name} = ")
            if len(shape) == 1:
                f.write(repr(flat) + "\n\n")
                return

            def nest(vals, dims):
                if len(dims) == 1:
                    return list(vals)
                step = len(vals) // dims[0]
                return [
                    nest(vals[i * step:(i + 1) * step], dims[1:])
                    for i in range(dims[0])
                ]

            f.write(repr(nest(flat, shape)) + "\n\n")

        emit("AC_QLOOKUP", t["AC_QLOOKUP"], (128,))
        emit("DC_QLOOKUP", t["DC_QLOOKUP"], (128,))
        emit("COEF_BANDS", t["COEF_BANDS"], (17,))
        emit("COEF_UPDATE_PROBS", t["COEF_UPDATE_PROBS"], (4, 8, 3, 11))
        emit("COEF_PROBS", t["COEF_PROBS"], (4, 8, 3, 11))
        emit("KF_BMODE_PROBS", t["KF_BMODE_PROBS"], (10, 10, 9))
    print("wrote embulk_spark/functions/vp8_tables.py")


if __name__ == "__main__":
    main()
