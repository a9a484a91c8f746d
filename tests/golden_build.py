"""Build the reference's own CPU binaries as golden oracles.

The reference tree (read-only at /root/reference) ships CPU-only
tools we can compile in this environment and use to cross-validate
our formats against the ORIGINAL implementation instead of
self-certifying:

* `test_huffman` — the reference codec's own round-trip self-test
  (src/test_huffman.cpp, built by CMakeLists.txt:40-42).
* `preprocess`  — the reference LAS -> .huffman compressor
  (src/preprocess.cpp, CMakeLists.txt:44-57).  Its CMake target links
  GL/CUDA sources it never calls; tiny header shims (forward-declared
  Renderer, a CUdeviceptr typedef) let the same TU build CPU-only.
* `liblaszip.so` + `las2laz` — the vendored canonical LASzip
  (libs/laszip) and a 20-line CLI that compresses LAS -> LAZ with it,
  to pin our pure-Python reader against an external artifact.

Everything builds once into out/refbuild and is reused.
"""

from __future__ import annotations

import glob
import os
import subprocess

REF = os.environ.get("PCRHPG_REFERENCE", "/root/reference")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(ROOT, "out", "refbuild")

_SHIM_RENDERER = """#pragma once
struct Renderer;
"""
_SHIM_CUDA = """#pragma once
typedef unsigned long long CUdeviceptr;
"""
_SHIM_GLU = """#pragma once
"""

_LAS2LAZ = r"""
#include <cstdio>
#include "laszip/laszip_api.h"
int main(int argc, char** argv) {
  if (argc != 3) { std::fprintf(stderr, "las2laz in.las out.laz\n"); return 2; }
  laszip_POINTER rd; laszip_create(&rd);
  laszip_BOOL is_compressed = 0;
  if (laszip_open_reader(rd, argv[1], &is_compressed)) return 3;
  laszip_header* hdr; laszip_get_header_pointer(rd, &hdr);
  laszip_POINTER wr; laszip_create(&wr);
  laszip_set_header(wr, hdr);
  if (laszip_open_writer(wr, argv[2], 1)) return 4;
  laszip_point* pt; laszip_get_point_pointer(rd, &pt);
  laszip_I64 n = hdr->number_of_point_records
      ? hdr->number_of_point_records
      : (laszip_I64)hdr->extended_number_of_point_records;
  for (laszip_I64 i = 0; i < n; ++i) {
    if (laszip_read_point(rd)) return 5;
    laszip_set_point(wr, pt);
    if (laszip_write_point(wr)) return 6;
  }
  laszip_close_writer(wr); laszip_destroy(wr);
  laszip_close_reader(rd); laszip_destroy(rd);
  return 0;
}
"""


def _write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def _run(cmd: list[str], cwd: str) -> None:
    subprocess.run(cmd, cwd=cwd, check=True, capture_output=True, text=True)


def build_golden() -> dict | None:
    """Build (or reuse) the golden binaries; None if unavailable."""
    if not os.path.isdir(REF):
        return None
    os.makedirs(BUILD, exist_ok=True)
    out = {
        "test_huffman": os.path.join(BUILD, "test_huffman"),
        "preprocess": os.path.join(BUILD, "preprocess"),
        "las2laz": os.path.join(BUILD, "las2laz"),
    }
    inc = [
        f"-I{BUILD}/shim", f"-I{REF}/include", f"-I{REF}/modules",
        f"-I{REF}/libs", f"-I{REF}/libs/glm", f"-I{REF}/libs/cyCodeBase",
    ]
    try:
        if not os.path.exists(out["test_huffman"]):
            _run(["g++", "-O2", "-std=c++17", *inc[1:],
                  "-o", out["test_huffman"],
                  f"{REF}/src/test_huffman.cpp"], BUILD)
        if not os.path.exists(out["preprocess"]):
            _write(os.path.join(BUILD, "shim", "Renderer.h"), _SHIM_RENDERER)
            _write(os.path.join(BUILD, "shim", "CudaProgram.h"), _SHIM_CUDA)
            _write(os.path.join(BUILD, "shim", "GL", "glu.h"), _SHIM_GLU)
            _run(["g++", "-O2", "-std=c++17", "-fpermissive", *inc,
                  "-o", out["preprocess"],
                  f"{REF}/src/preprocess.cpp", f"{REF}/src/rgbcx.cpp",
                  f"{REF}/src/bc7enc.cpp", f"{REF}/src/bc7decomp.cpp",
                  f"{REF}/include/unsuck_platform_specific.cpp",
                  "-ltbb", "-lpthread"], BUILD)
        if not os.path.exists(out["las2laz"]):
            incdir = os.path.join(BUILD, "inc", "laszip")
            os.makedirs(incdir, exist_ok=True)
            with open(f"{REF}/libs/laszip/laszip_api.h") as f:
                _write(os.path.join(incdir, "laszip_api.h"), f.read())
            with open(f"{REF}/libs/laszip/laszip_api_version.h.in") as f:
                ver = f.read()
            for k, v in (("MAJOR", "3"), ("MINOR", "4"), ("PATCH", "3"),
                         ("BUILD", "0")):
                ver = ver.replace("@LASZIP_API_VERSION_%s@" % k, v)
            _write(os.path.join(incdir, "laszip_api_version.h"), ver)
            srcs = sorted(glob.glob(f"{REF}/libs/laszip/src/*.cpp"))
            _run(["g++", "-O2", "-std=c++14", "-shared", "-fPIC",
                  "-DLASZIPDLL_EXPORTS", f"-I{BUILD}/inc",
                  f"-I{REF}/libs/laszip/src",
                  "-o", os.path.join(BUILD, "liblaszip.so"), *srcs], BUILD)
            _write(os.path.join(BUILD, "las2laz.cpp"), _LAS2LAZ)
            _run(["g++", "-O2", "-std=c++14", f"-I{BUILD}/inc",
                  "-o", out["las2laz"], os.path.join(BUILD, "las2laz.cpp"),
                  f"-L{BUILD}", "-llaszip", "-Wl,-rpath,$ORIGIN"], BUILD)
    except (subprocess.CalledProcessError, OSError):
        return None
    return out
