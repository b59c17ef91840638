"""Tests for bench.py's compile-cache validation (stale XLA:CPU AOT purge).

The persistent cache survives across rounds while the executing host
changes; entries embedding another machine's LLVM x86 feature string are
loaded anyway and can SIGILL (cpu_aot_loader.cc warnings in BENCH_r02's
tail).  validate_cache purges exactly those, keeps TPU entries, and is a
marker-gated no-op on an unchanged host.
"""

import json
import os

import pytest

import bench


@pytest.fixture
def fake_cache(tmp_path):
    import zstandard as zstd

    c = zstd.ZstdCompressor()
    cpu_blob = c.compress(
        b"\x00" * 100 + b"+64bit,+adx,+sse2,+prefer-no-scatter" + b"\x01" * 50)
    tpu_blob = c.compress(b"\x00" * 80 + b"TPU v5e fusion program" + b"\x02" * 40)
    (tmp_path / "jit_step-aaaa-cache").write_bytes(cpu_blob)
    (tmp_path / "jit_step-bbbb-cache").write_bytes(tpu_blob)
    (tmp_path / "not_an_entry.txt").write_bytes(b"hello")
    return tmp_path


def test_classifier_detects_cpu_aot(fake_cache):
    assert bench._entry_is_cpu_aot(str(fake_cache / "jit_step-aaaa-cache"))
    assert not bench._entry_is_cpu_aot(str(fake_cache / "jit_step-bbbb-cache"))


def test_classifier_finds_marker_across_chunks(tmp_path):
    import zstandard as zstd

    # marker placed deep so the streaming search must cross read boundaries
    blob = b"\x00" * (3 << 20) + b"+sse2" + b"\x00" * 100
    p = tmp_path / "jit_deep-cache"
    p.write_bytes(zstd.ZstdCompressor().compress(blob))
    assert bench._entry_is_cpu_aot(str(p))


def test_classifier_keeps_unreadable(tmp_path):
    p = tmp_path / "jit_x-cache"
    p.write_bytes(b"not zstd at all")
    assert not bench._entry_is_cpu_aot(str(p))


def test_validate_cache_purges_and_marks(fake_cache):
    purged = bench.validate_cache(str(fake_cache))
    assert purged == 1
    assert not (fake_cache / "jit_step-aaaa-cache").exists()
    assert (fake_cache / "jit_step-bbbb-cache").exists()      # TPU entry kept
    assert (fake_cache / "not_an_entry.txt").exists()         # non-entry kept
    marker = json.load(open(fake_cache / "HOST.json"))
    assert marker["fingerprint"] == bench._host_fingerprint()
    # same host: marker short-circuits, nothing scanned or purged
    assert bench.validate_cache(str(fake_cache)) == 0


def test_validate_cache_rescans_on_host_change(fake_cache):
    bench.validate_cache(str(fake_cache))
    # simulate a different host having written the marker
    with open(fake_cache / "HOST.json", "w") as f:
        json.dump({"fingerprint": "deadbeefdeadbeef"}, f)
    import zstandard as zstd

    (fake_cache / "jit_step-cccc-cache").write_bytes(
        zstd.ZstdCompressor().compress(b"+64bit,+avx2 feature string"))
    assert bench.validate_cache(str(fake_cache)) == 1
    assert json.load(open(fake_cache / "HOST.json"))[
        "fingerprint"] == bench._host_fingerprint()


def test_validate_cache_missing_dir():
    assert bench.validate_cache("/nonexistent/cache/dir") == 0
