"""Minimal protobuf wire-format walker for jax.profiler xplane.pb traces.

The tensorboard_plugin_profile C++ bridge is unavailable in this image
(protobuf generated-code mismatch AND a missing _pywrap_profiler symbol), so
this parses the XSpace wire format directly — no generated code needed.

Prints, for the TPU device plane, total/self duration by XLA op (the
"XLA Ops" line) aggregated over the captured window.

Usage: python docs/tools/xplane_walk.py [path/to/*.xplane.pb] [top_n]
"""

import glob
import os
import sys
from collections import defaultdict


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf, start=0, end=None):
    """Yield (field_no, wire_type, value) over a message's wire bytes."""
    i = start
    end = len(buf) if end is None else end
    while i < end:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f'wire type {wt}')
        yield fno, wt, v


def parse_event(buf):
    md, dur = 0, 0
    for fno, wt, v in fields(buf):
        if fno == 1:
            md = v
        elif fno == 3:
            dur = v
    return md, dur


def parse_line(buf):
    name = b''
    events = []
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v
        elif fno == 11:
            name = v or name
        elif fno == 4:
            events.append(parse_event(v))
    return name.decode('utf-8', 'replace'), events


def parse_metadata_entry(buf):
    """map<int64, XEventMetadata> entry -> (id, name, display)."""
    key, name, disp = 0, b'', b''
    for fno, wt, v in fields(buf):
        if fno == 1:
            key = v
        elif fno == 2:
            for f2, w2, v2 in fields(v):
                if f2 == 2:
                    name = v2
                elif f2 == 4:
                    disp = v2
    return key, name.decode('utf-8', 'replace'), disp.decode('utf-8',
                                                             'replace')


def parse_plane(buf):
    name = b''
    lines = []
    emeta = {}
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v
        elif fno == 3:
            lines.append(parse_line(v))
        elif fno == 4:
            k, n, d = parse_metadata_entry(v)
            emeta[k] = (n, d)
    return name.decode('utf-8', 'replace'), lines, emeta


def walk(path):
    buf = open(path, 'rb').read()
    planes = []
    for fno, wt, v in fields(buf):
        if fno == 1:
            planes.append(parse_plane(v))
    return planes


def main():
    args = [a for a in sys.argv[1:]]
    path = None
    top_n = 45
    for a in args:
        if a.isdigit():
            top_n = int(a)
        else:
            path = a
    if path is None:
        c = sorted(glob.glob('/tmp/mgt_profile/**/*.xplane.pb',
                             recursive=True), key=os.path.getmtime)
        path = c[-1]
    print(f'# {path}')
    for pname, lines, emeta in walk(path):
        if 'TPU' not in pname and 'Device' not in pname:
            continue
        print(f'== plane: {pname}')
        for lname, events in lines:
            if not events:
                continue
            agg = defaultdict(lambda: [0, 0])
            total = 0
            for md, dur in events:
                name = emeta.get(md, (f'#{md}', ''))[0]
                agg[name][0] += dur
                agg[name][1] += 1
                total += dur
            print(f'-- line: {lname}  ({len(events)} events, '
                  f'{total/1e9:.2f} ms total)')
            if lname not in ('XLA Ops', 'XLA Modules', 'Steps'):
                continue
            rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
            for name, (dur, cnt) in rows:
                print(f'   {dur/1e9:9.3f} ms  x{cnt:<5d} {name[:110]}')


if __name__ == '__main__':
    main()
