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


# ---------------------------------------------------------------------------
# _supervise retry/fallback ladder (driver-facing bench armor)
# ---------------------------------------------------------------------------


class _FakeRun:
    """Scripted subprocess.run replacement: pops (rc_or_'timeout', env_check)
    outcomes; records the env overrides each attempt ran with."""

    def __init__(self, outcomes, clock):
        self.outcomes = list(outcomes)
        self.calls = []
        self.clock = clock

    def __call__(self, argv, env=None, timeout=None):
        kind = self.outcomes.pop(0)
        self.calls.append({k: env.get(k) for k in
                           ("T2IGAN_UPBLOCK",)})
        if kind == "timeout":
            import subprocess
            self.clock["t"] += timeout
            raise subprocess.TimeoutExpired(argv, timeout)
        if kind == "slow-fail":
            self.clock["t"] += 500.0
            return type("R", (), {"returncode": 1})()
        return type("R", (), {"returncode": kind})()


def _run_supervise(monkeypatch, outcomes, retries="1"):
    clock = {"t": 0.0}
    fake = _FakeRun(outcomes, clock)
    monkeypatch.setattr(bench.time, "time", lambda: clock["t"])
    monkeypatch.setattr(bench.time, "sleep",
                        lambda s: clock.__setitem__("t", clock["t"] + s))
    import subprocess
    monkeypatch.setattr(subprocess, "run", fake)
    monkeypatch.setenv("T2IGAN_BENCH_TUNNEL_RETRIES", retries)
    return bench._supervise(), fake


def test_supervise_ok_first_try(monkeypatch):
    rc, fake = _run_supervise(monkeypatch, [0])
    assert rc == 0
    assert fake.calls[0]["T2IGAN_UPBLOCK"] is None


def test_supervise_retries_fast_tunnel_failure(monkeypatch):
    """A failure within 120s is treated as a tunnel outage: the SAME attempt
    retries (same env), not the fallback variant."""
    rc, fake = _run_supervise(monkeypatch, [1, 0], retries="2")
    assert rc == 0
    assert fake.calls[0] == fake.calls[1]  # same variant retried


def test_supervise_falls_back_on_timeout(monkeypatch):
    """A budget overrun moves to the slow-but-safe variant (naive
    UpBlock)."""
    rc, fake = _run_supervise(monkeypatch, ["timeout", 0])
    assert rc == 0
    assert fake.calls[1]["T2IGAN_UPBLOCK"] == "naive"


def test_supervise_falls_back_on_slow_failure(monkeypatch):
    """A real (slow) child failure also tries the safe variant once instead
    of leaving the driver with no number."""
    rc, fake = _run_supervise(monkeypatch, ["slow-fail", 0], retries="0")
    assert rc == 0
    assert fake.calls[1]["T2IGAN_UPBLOCK"] == "naive"


def test_supervise_surfaces_double_failure(monkeypatch):
    rc, fake = _run_supervise(monkeypatch, ["slow-fail", "slow-fail"],
                              retries="0")
    assert rc == 1
    assert len(fake.calls) == 2


def test_supervise_purges_on_fast_signal_death(monkeypatch, tmp_path):
    """A signal death (rc<0) purges the compile cache and retries the same
    variant — it must NOT be misread as a tunnel outage."""
    monkeypatch.setattr(bench, "CACHE_DIR", str(tmp_path / "cache"))
    os.makedirs(bench.CACHE_DIR, exist_ok=True)
    rc, fake = _run_supervise(monkeypatch, [-4, 0], retries="5")
    assert rc == 0
    assert not os.path.isdir(bench.CACHE_DIR)  # purged
    assert fake.calls[0] == fake.calls[1]
