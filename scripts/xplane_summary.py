"""Summarize a JAX profiler .xplane.pb without tensorflow: minimal protobuf
wire-format walker aggregating device event durations by op name.

XSpace schema subset (tensorflow/core/profiler/protobuf/xplane.proto):
  XSpace.planes = 1 (XPlane)
  XPlane.name = 2, .lines = 3 (XLine), .event_metadata = 4 (map<int64, XEventMetadata>)
  XLine.name = 4?, .events = 9? -- we discover field ids empirically via decode;
  XEvent.metadata_id = 1, .offset_ps = 2, .duration_ps = 3
  XEventMetadata.id = 1, .name = 2, .display_name = 4
"""

import glob
import struct
import sys
from collections import defaultdict


def read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_no, wire_type, value_bytes_or_int)."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = read_varint(buf, i)
            yield fno, wt, v
        elif wt == 1:
            yield fno, wt, struct.unpack("<q", buf[i:i + 8])[0]
            i += 8
        elif wt == 2:
            ln, i = read_varint(buf, i)
            yield fno, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fno, wt, struct.unpack("<i", buf[i:i + 4])[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")


def parse_event_metadata(buf):
    meta = {}
    mid, name = None, ""
    for fno, wt, v in fields(buf):
        if fno == 1 and wt == 0:
            mid = v
        elif fno == 2 and wt == 2:
            name = v.decode(errors="replace")
    return mid, name


def summarize(path):
    xspace = open(path, "rb").read()
    totals = defaultdict(float)
    counts = defaultdict(int)
    for fno, wt, plane_buf in fields(xspace):
        if fno != 1:
            continue
        plane_name = ""
        metadata = {}
        lines = []
        for pf, pw, pv in fields(plane_buf):
            if pf == 2 and pw == 2:
                plane_name = pv.decode(errors="replace")
            elif pf == 4 and pw == 2:
                # map entry: key=1 varint, value=2 XEventMetadata
                k = None
                for mf, mw, mv in fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:
                        mid, name = parse_event_metadata(mv)
                        metadata[k if k is not None else mid] = name
            elif pf == 3 and pw == 2:
                lines.append(pv)
        if "TPU" not in plane_name and "device" not in plane_name.lower():
            pass
        for line_buf in lines:
            for lf, lw, lv in fields(line_buf):
                if lw == 2 and lf == 4:  # XLine.events
                    mid = None
                    dur = 0
                    for ef, ew, ev in fields(lv):
                        if ef == 1 and ew == 0:
                            mid = ev
                        elif ef == 3 and ew == 0:
                            dur = ev
                    if mid is not None:
                        name = metadata.get(mid, f"id{mid}")
                        totals[(plane_name, name)] += dur / 1e9  # ps -> ms
                        counts[(plane_name, name)] += 1
    return totals, counts


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof/trace_render"
    path = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)[0]
    totals, counts = summarize(path)
    planes = sorted(set(p for p, _ in totals))
    for plane in planes:
        items = [(n, totals[(plane, n)], counts[(plane, n)]) for p, n in totals if p == plane]
        items.sort(key=lambda x: -x[1])
        tot = sum(t for _, t, _ in items)
        print(f"\n== {plane} (total {tot:.1f} ms) ==")
        for name, t, c in items[:160]:
            print(f"  {t:9.2f} ms  x{c:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
