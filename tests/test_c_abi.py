"""End-to-end test of the embedded C ABI (native/capi_embed.c): compile a
pure-C host program, link libmatchtigs_tpu, and run all algorithms."""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

C_TEST = r"""
#include <stdio.h>
#include <stdint.h>
#include <stddef.h>
extern void matchtigs_initialise(void);
extern void *matchtigs_initialise_graph(size_t);
extern void matchtigs_merge_nodes(void *, size_t, int, size_t, int);
extern void matchtigs_build_graph(void *, const size_t *);
extern size_t matchtigs_compute_tigs(void *, size_t, size_t, size_t,
                                     const char *, const char *, int64_t *,
                                     size_t *, size_t *);
int main(void) {
  matchtigs_initialise();
  void *h = matchtigs_initialise_graph(3);
  matchtigs_merge_nodes(h, 0, 1, 1, 1);
  matchtigs_merge_nodes(h, 1, 1, 2, 1);
  size_t weights[3] = {5, 7, 3};
  matchtigs_build_graph(h, weights);
  int64_t edges[16]; size_t inserts[16]; size_t limits[8];
  size_t n = matchtigs_compute_tigs(h, 3, 1, 11, "/tmp/m", "x",
                                    edges, inserts, limits);
  if (n != 1 || limits[0] != 3) { printf("FAIL n=%zu\n", n); return 1; }
  printf("C_ABI_OK %lld %lld %lld\n", (long long)edges[0],
         (long long)edges[1], (long long)edges[2]);
  return 0;
}
"""


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C toolchain")
def test_c_abi_end_to_end(tmp_path):
    flags = subprocess.run(
        ["python3-config", "--includes"], capture_output=True, text=True
    ).stdout.split()
    ldflags = subprocess.run(
        ["python3-config", "--ldflags", "--embed"], capture_output=True, text=True
    ).stdout.split()
    lib = tmp_path / "libmatchtigs_tpu.so"
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-O2", str(REPO / "native/capi_embed.c")]
        + flags
        + ["-o", str(lib)]
        + ldflags,
        check=True,
    )
    src = tmp_path / "t.c"
    src.write_text(C_TEST)
    exe = tmp_path / "t"
    subprocess.run(
        ["gcc", "-O2", str(src), "-o", str(exe), f"-L{tmp_path}", "-lmatchtigs_tpu"]
        + ldflags,
        check=True,
    )
    import sysconfig

    site = sysconfig.get_paths()["purelib"]
    env = {
        "PYTHONPATH": f"{REPO}:{site}",
        "JAX_PLATFORMS": "cpu",
        "LD_LIBRARY_PATH": str(tmp_path),
        "PATH": "/usr/bin:/bin",
        "HOME": "/tmp",
    }
    out = subprocess.run(
        [str(exe)], capture_output=True, text=True, env=env, timeout=240
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "C_ABI_OK" in out.stdout
