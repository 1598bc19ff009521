"""bench.py harness units that guard the measurement protocol
(ADVICE r9: the undersized-reused-session warning must actually be
able to compare JVM memory strings)."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def test_mem_bytes_parses_jvm_strings():
    assert bench._mem_bytes("24g") == 24 * 1024**3
    assert bench._mem_bytes("512m") == 512 * 1024**2
    assert bench._mem_bytes("8G") == 8 * 1024**3  # case-insensitive
    assert bench._mem_bytes("1024k") == 1024 * 1024
    assert bench._mem_bytes("1048576") == 1048576  # bare bytes
    assert bench._mem_bytes(" 2gb ") == 2 * 1024**3  # tolerant suffix/space


def test_mem_bytes_unparseable_is_zero_not_crash():
    # a weird conf value must degrade to "warn" (0 < anything), never
    # crash the bench before it prints its JSON lines
    assert bench._mem_bytes("") == 0
    assert bench._mem_bytes("lots") == 0
    assert bench._mem_bytes("-4g") == 0


def test_undersized_reuse_is_detectable():
    # the exact comparison main() performs: library default vs harness
    # intent — must flag 8g < 24g and pass 24g >= 24g
    assert bench._mem_bytes("8g") < bench._mem_bytes("24g")
    assert not (bench._mem_bytes("24g") < bench._mem_bytes("24g"))
