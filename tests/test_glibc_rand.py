"""glibc rand() replication: cross-checked against a natively compiled C
program using the system libc (same implementation family the reference
binary linked)."""

import os
import shutil
import subprocess

import pytest

from mmadmm_tpu.geometry.glibc_rand import GlibcRand, RAND_MAX


KNOWN_SEED69_FIRST5 = None  # filled by the C cross-check when available


def _c_rand_outputs(seed: int, n: int):
    cc = shutil.which("gcc") or shutil.which("g++")
    if cc is None:
        pytest.skip("no C compiler")
    src = f"""
    #include <stdio.h>
    #include <stdlib.h>
    int main() {{ srand({seed}); for (int i = 0; i < {n}; i++) printf("%d\\n", rand()); return 0; }}
    """
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        cpath = os.path.join(d, "r.c")
        bpath = os.path.join(d, "r")
        open(cpath, "w").write(src)
        subprocess.run([cc, cpath, "-o", bpath], check=True)
        out = subprocess.run([bpath], capture_output=True, text=True, check=True)
    return [int(v) for v in out.stdout.split()]


@pytest.mark.parametrize("seed", [1, 69, 12345])
def test_matches_system_libc(seed):
    n = 500
    expected = _c_rand_outputs(seed, n)
    g = GlibcRand(seed)
    got = [g.rand() for _ in range(n)]
    assert got == expected


def test_rand_array_matches_scalar():
    g1 = GlibcRand(69)
    g2 = GlibcRand(69)
    a = g1.rand_array(100)
    b = [g2.rand() for _ in range(100)]
    assert list(a) == b


def test_values_in_range():
    g = GlibcRand(7)
    vals = g.rand_array(1000)
    assert (vals >= 0).all() and (vals <= RAND_MAX).all()
