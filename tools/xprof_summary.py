#!/usr/bin/env python
"""Summarize a jax.profiler trace (.xplane.pb): top TPU ops by time.

Usage:
  python tools/xprof_summary.py /tmp/jaxprof [--top 40] [--line "XLA Ops"]

Parses the XSpace protobuf with a minimal wire-format reader (no tensorflow
/ tensorboard_plugin_profile dependency — the image's plugin build is
incompatible with its TF), aggregates event durations per op name on the
device planes, and prints a table. The reference repo has no profiler
tooling at all (SURVEY.md §5); this plus utils/profiling.py is our
observability story for kernel work.

Proto schema (tsl/profiler/protobuf/xplane.proto):
  XSpace.planes=1; XPlane{name=2, lines=3, event_metadata=4(map)}
  XLine{name=2, events=4}; XEvent{metadata_id=1, offset_ps=2,
  duration_ps=3, stats=4}; XEventMetadata map entry {key=1, value=2};
  XEventMetadata{id=1, name=2, display_name=3}.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict
from typing import Dict, Iterator, Tuple


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, i = _read_varint(buf, i)
        elif wt == 1:  # 64-bit
            v = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            v = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_event_metadata(buf: bytes) -> Tuple[int, str]:
    """map<int64, XEventMetadata> entry → (id, name)."""
    key, name, display = 0, "", ""
    for fno, _, v in fields(buf):
        if fno == 1:
            key = v
        elif fno == 2:
            for f2, _, v2 in fields(v):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
                elif f2 == 3:
                    display = v2.decode("utf-8", "replace")
    return key, (display or name)


def summarize_plane(buf: bytes, line_filter: str):
    plane_name = ""
    meta: Dict[int, str] = {}
    lines = []
    for fno, _, v in fields(buf):
        if fno == 2:
            plane_name = v.decode("utf-8", "replace")
        elif fno == 3:
            lines.append(v)
        elif fno == 4:
            k, name = parse_event_metadata(v)
            meta[k] = name
    agg: Dict[str, float] = defaultdict(float)
    cnt: Dict[str, int] = defaultdict(int)
    for lbuf in lines:
        lname = ""
        events = []
        for fno, wt, v in fields(lbuf):
            if fno == 2 and wt == 2:
                lname = v.decode("utf-8", "replace")
            elif fno == 4 and wt == 2:
                events.append(v)
        if line_filter and line_filter not in lname:
            continue
        for ebuf in events:
            mid, dur = 0, 0
            occ = 1
            for fno, _, v in fields(ebuf):
                if fno == 1:
                    mid = v
                elif fno == 3:
                    dur = v
                elif fno == 5:
                    occ = v
            name = meta.get(mid, f"id{mid}")
            agg[name] += dur / 1e9  # ps → ms
            cnt[name] += 1
    return plane_name, agg, cnt


def summarize(path: str, line_filter: str = "XLA Ops", top: int = 40,
              out=sys.stdout):
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                                 recursive=True))
        if not cands:
            raise FileNotFoundError(f"no .xplane.pb under {path}")
        path = cands[-1]
    buf = open(path, "rb").read()
    results = []
    for fno, _, v in fields(buf):
        if fno == 1:
            name, agg, cnt = summarize_plane(v, line_filter)
            if agg and ("TPU" in name or "Device" in name or "/device" in name):
                results.append((name, agg, cnt))
    for name, agg, cnt in results:
        total = sum(agg.values())
        print(f"== {name}: {total:.3f} ms total on '{line_filter}' lines",
              file=out)
        for op, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ms:9.4f} ms  x{cnt[op]:4d}  {op[:120]}", file=out)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help=".xplane.pb file or trace dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line", default="XLA Ops")
    args = ap.parse_args()
    summarize(args.path, line_filter=args.line, top=args.top)


if __name__ == "__main__":
    main()
