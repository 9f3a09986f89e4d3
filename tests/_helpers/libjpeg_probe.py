"""Subprocess worker: decode a JPEG file with the system libjpeg via
ctypes and write raw pixel bytes to stdout.

Run: python libjpeg_probe.py STRUCTSIZE JPEG_PATH WIDTH HEIGHT COMPS
Exit codes: 0 ok, 42 libjpeg error (incl. wrong structsize), 43 short
read. Isolated in its own process because a wrong structsize corrupts
memory by design — the parent probes sizes until one works.

No jpeg_decompress_struct field is ever read: the caller supplies the
expected dims/components (it encoded the image), and the only field
WRITTEN is `err` at offset 0 (the first member of jpeg_common_fields,
a stable public-header invariant), with error_exit (offset 0 of
jpeg_error_mgr, same invariant) replaced by a clean _exit."""

import ctypes
import os
import sys

S = int(sys.argv[1])
path = sys.argv[2]
w, h, comps = int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])

lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libjpeg.so.62")
ERRFN = ctypes.CFUNCTYPE(None, ctypes.c_void_p)


@ERRFN
def _error_exit(_cinfo):
    os._exit(42)


jerr = ctypes.create_string_buffer(1024)
lib.jpeg_std_error.restype = ctypes.c_void_p
err_ptr = lib.jpeg_std_error(jerr)
ctypes.cast(err_ptr, ctypes.POINTER(ctypes.c_void_p))[0] = ctypes.cast(
    _error_exit, ctypes.c_void_p
)

cinfo = ctypes.create_string_buffer(S + 512)  # slack beyond claimed size
ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[0] = err_ptr
lib.jpeg_CreateDecompress(cinfo, 62, S)

data = open(path, "rb").read()
buf = ctypes.create_string_buffer(data, len(data))
lib.jpeg_mem_src(cinfo, buf, len(data))
lib.jpeg_read_header(cinfo, 1)
lib.jpeg_start_decompress(cinfo)
row = ctypes.create_string_buffer(w * comps)
rowp = (ctypes.c_void_p * 1)(ctypes.addressof(row))
out = bytearray()
for _ in range(h):
    if lib.jpeg_read_scanlines(cinfo, rowp, 1) != 1:
        os._exit(43)
    out += row.raw
lib.jpeg_finish_decompress(cinfo)
lib.jpeg_destroy_decompress(cinfo)
sys.stdout.buffer.write(bytes(out))
