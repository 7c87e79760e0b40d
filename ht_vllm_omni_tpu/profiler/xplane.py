"""Minimal XSpace/XPlane trace reader (pure python, no TF dependency).

jax.profiler.trace writes ``*.xplane.pb`` protos (the same format the
reference inspects through tensorboard's profile plugin; its perf docs
are built on those op tables).  The full toolchain (tensorflow +
tensorboard_plugin_profile) is heavyweight and version-brittle, so this
module hand-walks the protobuf wire format and aggregates device-side
op durations — enough for "where did the nanoseconds go" tables on any
host.

Wire schema (stable public fields of xplane.proto):
    XSpace.planes = 1            XPlane.name = 2
    XPlane.lines = 3             XPlane.event_metadata = 4 (map)
    XLine.events = 4             XLine.name = 2
    XEvent.metadata_id = 1       XEvent.duration_ps = 3
    XEventMetadata.id = 1        XEventMetadata.name = 2
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from dataclasses import dataclass, field


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message body."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, i = _varint(buf, i)
        elif wt == 1:  # 64-bit
            val = buf[i : i + 8]
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            val = buf[i : i + 4]
            i += 4
        else:  # pragma: no cover — groups unused by xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


@dataclass
class PlaneStats:
    name: str
    # op name -> (total_ps, count)
    ops: dict = field(default_factory=lambda: defaultdict(lambda: [0, 0]))

    def total_ms(self) -> float:
        return sum(t for t, _ in self.ops.values()) / 1e9

    def table(self, top: int = 25) -> str:
        rows = sorted(self.ops.items(), key=lambda kv: -kv[1][0])
        tot = sum(t for t, _ in self.ops.values()) or 1
        lines = [f"== {self.name}: {tot/1e9:.3f} ms device time =="]
        for name, (ps, cnt) in rows[:top]:
            lines.append(
                f"{ps/1e9:9.3f} ms {100.0*ps/tot:5.1f}% x{cnt:<7d} {name[:90]}"
            )
        return "\n".join(lines)


def _parse_plane(buf: bytes) -> PlaneStats:
    name = ""
    meta: dict[int, str] = {}
    lines = []
    for fnum, wt, val in _fields(buf):
        if fnum == 2 and wt == 2:
            name = val.decode(errors="replace")
        elif fnum == 3 and wt == 2:
            lines.append(val)
        elif fnum == 4 and wt == 2:  # map entry {key=1, value=2}
            mid, mname = None, ""
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 2 and w3 == 2:
                            mname = v3.decode(errors="replace")
            if mid is not None:
                meta[mid] = mname
    plane = PlaneStats(name)
    for line in lines:
        for fnum, wt, val in _fields(line):
            if fnum == 4 and wt == 2:  # XEvent
                mid = 0
                dur = 0
                for f2, w2, v2 in _fields(val):
                    if f2 == 1 and w2 == 0:
                        mid = v2
                    elif f2 == 3 and w2 == 0:
                        dur = v2
                ent = plane.ops[meta.get(mid, f"#{mid}")]
                ent[0] += dur
                ent[1] += 1
    return plane


@dataclass
class TimelineEvent:
    name: str
    line: str
    start_ps: int
    dur_ps: int


def read_timeline(path: str, plane_filter: str = "TPU") -> list[TimelineEvent]:
    """Flat event list (with offsets) from matching planes, for gap
    analysis: sort by start, union the busy intervals, and the holes
    are where the device sat idle."""
    buf = open(path, "rb").read()
    out: list[TimelineEvent] = []
    for fnum, wt, val in _fields(buf):
        if fnum != 1 or wt != 2:
            continue
        name = ""
        meta: dict[int, str] = {}
        lines = []
        for f2, w2, v2 in _fields(val):
            if f2 == 2 and w2 == 2:
                name = v2.decode(errors="replace")
            elif f2 == 3 and w2 == 2:
                lines.append(v2)
            elif f2 == 4 and w2 == 2:
                mid, mname = None, ""
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1 and w3 == 0:
                        mid = v3
                    elif f3 == 2 and w3 == 2:
                        for f4, w4, v4 in _fields(v3):
                            if f4 == 1 and w4 == 0:
                                mid = v4
                            elif f4 == 2 and w4 == 2:
                                mname = v4.decode(errors="replace")
                if mid is not None:
                    meta[mid] = mname
        if plane_filter not in name:
            continue
        for line in lines:
            lname = ""
            evs = []
            for f2, w2, v2 in _fields(line):
                if f2 == 2 and w2 == 2:
                    lname = v2.decode(errors="replace")
                elif f2 == 11 and w2 == 2:
                    lname = v2.decode(errors="replace")
                elif f2 == 4 and w2 == 2:
                    evs.append(v2)
            for ev in evs:
                mid = 0
                dur = 0
                off = 0
                for f3, w3, v3 in _fields(ev):
                    if f3 == 1 and w3 == 0:
                        mid = v3
                    elif f3 == 2 and w3 == 0:
                        off = v3
                    elif f3 == 3 and w3 == 0:
                        dur = v3
                out.append(
                    TimelineEvent(meta.get(mid, f"#{mid}"), lname, off, dur)
                )
    return out


def gap_report(
    events: list[TimelineEvent],
    line_substr: str = "XLA Op",
    top: int = 15,
    min_gap_us: float = 1.0,
) -> str:
    """Busy/idle union over one device line + the largest idle gaps with
    the ops on either side (what the device was waiting between)."""
    evs = sorted(
        (e for e in events if line_substr in e.line and e.dur_ps > 0),
        key=lambda e: e.start_ps,
    )
    if not evs:
        lines = sorted({e.line for e in events})
        return f"no events on line ~'{line_substr}'; lines: {lines}"
    span = evs[-1].start_ps + evs[-1].dur_ps - evs[0].start_ps
    busy = 0
    cur_end = evs[0].start_ps
    gaps = []
    prev = None
    for e in evs:
        if e.start_ps > cur_end:
            gaps.append((e.start_ps - cur_end, prev, e))
            busy += e.dur_ps
            cur_end = e.start_ps + e.dur_ps
        else:
            new_end = max(cur_end, e.start_ps + e.dur_ps)
            busy += new_end - cur_end
            cur_end = new_end
        if prev is None or e.start_ps + e.dur_ps >= cur_end:
            prev = e
    gaps.sort(key=lambda g: -g[0])
    out = [
        f"line '{evs[0].line}': span {span/1e9:.3f} ms, busy "
        f"{busy/1e9:.3f} ms ({100.0*busy/max(span,1):.1f}%), "
        f"{len(gaps)} gaps"
    ]
    big = [g for g in gaps if g[0] / 1e6 >= min_gap_us]
    out.append(
        f"gaps >= {min_gap_us} us: {len(big)}, totaling "
        f"{sum(g[0] for g in big)/1e9:.3f} ms"
    )
    for dur, a, b in gaps[:top]:
        out.append(
            f"  {dur/1e6:9.1f} us between [{(a.name if a else '?')[:45]}] "
            f"and [{b.name[:45]}]"
        )
    return "\n".join(out)


def read_xspace(path: str) -> list[PlaneStats]:
    """Parse one .xplane.pb file into per-plane op stats."""
    buf = open(path, "rb").read()
    planes = []
    for fnum, wt, val in _fields(buf):
        if fnum == 1 and wt == 2:
            planes.append(_parse_plane(val))
    return planes


def device_op_stats(trace_dir: str) -> list[PlaneStats]:
    """All TPU/device planes from the newest trace under ``trace_dir``."""
    paths = sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
        ),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    planes = read_xspace(paths[-1])
    dev = [
        p
        for p in planes
        if "TPU" in p.name or "/device:" in p.name or "Device" in p.name
    ]
    return dev or planes
