#!/usr/bin/env python
"""Per-op decode of a jax.profiler xplane.pb trace — no TF dependency.

Aggregates XLA op events on the device plane by op (event metadata name),
printing total time, occurrences, and ms/iter.  This reproduces the
"layout economics" tables in docs/PERFORMANCE.md from the raw trace with
one command:

    python tools/trace_decode.py .profiles/geneval_r2 --iters 20 --top 25

The xplane protobuf is parsed with a minimal hand-rolled wire-format
reader (schema: tensorflow/core/profiler/protobuf/xplane.proto) because
this image ships no tensorflow/tensorboard profiler package.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict


# ---------------------------------------------------------------------------
# minimal protobuf wire reader
# ---------------------------------------------------------------------------

def _varint(buf: memoryview, i: int):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a message buffer.
    Length-delimited values come back as memoryviews; varints as ints."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:                      # varint
            v, i = _varint(buf, i)
        elif wt == 1:                    # 64-bit
            v = bytes(buf[i:i + 8])
            i += 8
        elif wt == 2:                    # length-delimited
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:                    # 32-bit
            v = bytes(buf[i:i + 4])
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def _zz(v: int) -> int:
    """Protobuf int64 varints are two's complement; durations are
    non-negative so plain interpretation is fine."""
    return v


# ---------------------------------------------------------------------------
# xplane schema walk
# ---------------------------------------------------------------------------

def decode_plane(plane: memoryview):
    """XPlane -> (name, {metadata_id: name}, [(metadata_id, dur_ps)],
    (span_start_ps, span_end_ps)) — the span is the absolute device
    wall-clock window covered by op-level events (line timestamp_ns * 1e3
    + event offset_ps), which divides by the traced step count to give
    true device ms/step even when async DMA durations overlap compute and
    double-count in the on-op total."""
    name = ""
    meta = {}
    events = []
    span = [None, None]
    for fno, wt, v in fields(plane):
        if fno == 2 and wt == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif fno == 4 and wt == 2:       # event_metadata map entry
            mid, mname, mdisp = None, "", ""
            for f2, w2, v2 in fields(v):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3 in fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3 if mid is None else mid
                        elif f3 == 2 and w3 == 2:
                            mname = bytes(v3).decode("utf-8", "replace")
                        elif f3 == 3 and w3 == 2:
                            mdisp = bytes(v3).decode("utf-8", "replace")
            if mid is not None:
                meta[mid] = mdisp or mname
        elif fno == 3 and wt == 2:       # XLine {1: id, 2: name,
            lname = ""                   #        3: timestamp_ns, 4: events}
            lts_ns = 0
            levents = []
            for f2, w2, v2 in fields(v):
                if f2 == 2 and w2 == 2:
                    lname = bytes(v2).decode("utf-8", "replace")
                elif f2 == 3 and w2 == 0:
                    lts_ns = v2
                elif f2 == 4 and w2 == 2:  # XEvent {1: mid, 2: off, 3: dur}
                    mid, off, dur = None, 0, 0
                    for f3, w3, v3 in fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 2 and w3 == 0:
                            off = _zz(v3)
                        elif f3 == 3 and w3 == 0:
                            dur = _zz(v3)
                    if mid is not None:
                        levents.append((mid, off, dur))
            # keep op-level lines; skip module/step rollup lines that would
            # double-count the same wall time
            if lname not in ("XLA Modules", "Steps"):
                for mid, off, dur in levents:
                    t0 = lts_ns * 1000 + off
                    if span[0] is None or t0 < span[0]:
                        span[0] = t0
                    if span[1] is None or t0 + dur > span[1]:
                        span[1] = t0 + dur
                events.extend((mid, lts_ns * 1000 + off, dur)
                              for mid, off, dur in levents)
    return name, meta, events, tuple(span)


def decode_space(buf: memoryview):
    for fno, wt, v in fields(buf):
        if fno == 1 and wt == 2:
            yield decode_plane(v)


def device_span_ms(trace_path: str, plane: str = "TPU") -> float:
    """Device wall span (ms) of the op-level events in a profile dir or
    .xplane.pb file — the trustworthy per-step timing source on this
    host: wall clocks through the contended 1-CPU axon tunnel measured
    both 9x too FAST (flaky ready-fence, round-4 probe) and 20x too SLOW
    (per-dispatch RPC under CPU contention), while the device span of
    back-to-back enqueued steps matches physics."""
    path = trace_path
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                                 recursive=True))
        if not cands:
            raise FileNotFoundError(f"no .xplane.pb under {path}")
        path = cands[-1]
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    for name, _, events, span in decode_space(buf):
        if plane in name and events and span[0] is not None:
            return (span[1] - span[0]) / 1e9
    raise ValueError(f"no plane matching {plane!r} with events in {path}")


def _union_ms(iv):
    """Total length (ms) of the union of [t0, t1) picosecond intervals."""
    if not iv:
        return 0.0
    iv.sort()
    tot = 0
    cs, ce = iv[0]
    for s, e in iv[1:]:
        if s > ce:
            tot += ce - cs
            cs, ce = s, e
        elif e > ce:
            ce = e
    tot += ce - cs
    return tot / 1e9


_DMA_PREFIXES = ("%copy", "copy", "%dynamic-update-slice.")


def _is_dma(op: str) -> bool:
    """Async data-movement ops (copy-start/copy-done pairs and bare
    copies).  Everything else — fusions, convolutions, custom calls,
    dots, reduces — counts as compute for the interval split."""
    return op.startswith(("%copy", "copy"))


def intervals_report(meta, events, span):
    """Sweep-line split of the device span into compute-busy, DMA-only
    and idle time.  Async DMA (copy-start) durations overlap compute, so
    on-op totals overstate their cost; what a copy actually costs the
    step is the time the device spends with ONLY copies in flight
    (dma_only) plus any idle gaps they fail to cover."""
    all_iv, comp_iv = [], []
    for mid, t0, dur in events:
        op = meta.get(mid, f"#{mid}")
        iv = (t0, t0 + dur)
        all_iv.append(iv)
        if not _is_dma(op):
            comp_iv.append(iv)
    wall = (span[1] - span[0]) / 1e9
    busy = _union_ms(all_iv)
    comp = _union_ms(comp_iv)
    return {
        "wall_ms": wall,
        "compute_ms": comp,
        "dma_only_ms": busy - comp,
        "idle_ms": wall - busy,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace", help=".xplane.pb file or a profile dir")
    p.add_argument("--iters", type=int, default=1,
                   help="timed iterations the trace covers (ms/iter)")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--plane", default="TPU",
                   help="substring of the device plane name")
    args = p.parse_args()

    path = args.trace
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                                 recursive=True))
        if not cands:
            sys.exit(f"no .xplane.pb under {path}")
        path = cands[-1]
    with open(path, "rb") as f:
        buf = memoryview(f.read())

    shown = False
    for name, meta, events, span in decode_space(buf):
        if args.plane not in name or not events:
            continue
        shown = True
        agg = defaultdict(lambda: [0, 0])
        for mid, _, dur in events:
            a = agg[meta.get(mid, f"#{mid}")]
            a[0] += dur
            a[1] += 1
        total = sum(a[0] for a in agg.values())
        print(f"\n== plane {name!r}: {len(events)} events, "
              f"{total / 1e9:.3f} ms total on-op time ==")
        if span[0] is not None:
            wall = (span[1] - span[0]) / 1e9
            print(f"device wall span: {wall:.3f} ms (/= traced step count "
                  f"for true device ms/step; on-op totals double-count "
                  f"async DMA overlap)")
            r = intervals_report(meta, events, span)
            print(f"interval split: compute-busy {r['compute_ms']:.3f} ms, "
                  f"DMA-only {r['dma_only_ms']:.3f} ms, "
                  f"idle {r['idle_ms']:.3f} ms "
                  f"(copies cost only their DMA-only + idle share)")
        print("NB: the trace window usually covers a few executions plus "
              "init uploads;\nper-iteration cost of an op = ms/occ (total "
              "divided by its own count),\nNOT total/iters.  One-shot "
              "copy-starts with small n are init device_puts.")
        print(f"{'ms/occ':>9}  {'total ms':>9}  {'n':>6}  op")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        for op, (dur, cnt) in rows[:args.top]:
            print(f"{dur / 1e9 / cnt:9.3f}  {dur / 1e9:9.2f}  "
                  f"{cnt:6d}  {op[:110]}")
        rest = rows[args.top:]
        if rest:
            rdur = sum(d for _, (d, _) in rest)
            rcnt = sum(c for _, (_, c) in rest)
            print(f"{'':>9}  {rdur / 1e9:9.2f}  {rcnt:6d}  "
                  f"(+{len(rest)} more ops)")
    if not shown:
        planes = [n for n, _, e, _ in decode_space(buf)]
        sys.exit(f"no plane matching {args.plane!r} with events; "
                 f"planes: {planes}")


if __name__ == "__main__":
    main()
