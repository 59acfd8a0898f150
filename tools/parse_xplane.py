"""Minimal xplane.pb parser: top ops by total self-duration per plane.

Hand-rolled protobuf wire-format decode of the (stable) XSpace schema:
XSpace.planes=1; XPlane{name=2, lines=3, event_metadata=4(map<int64,
XEventMetadata{id=1,name=2}>)}; XLine{name=2, events=4};
XEvent{metadata_id=1, duration_ps=3}.

Usage: python tools/parse_xplane.py <file.xplane.pb> [topk]
"""
import sys


def _varint(buf, i):
    v, s = 0, 0
    while True:
        b = buf[i]
        v |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return v, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:
            v, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse(path, topk=40):
    buf = open(path, "rb").read()
    for fno, wt, plane in fields(buf):
        if fno != 1:
            continue
        name, metas, lines = "?", {}, []
        for f2, w2, v2 in fields(plane):
            if f2 == 2:
                name = v2.decode(errors="replace")
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:           # map entry: key=1 varint, value=2 msg
                k, meta = None, None
                for f3, w3, v3 in fields(v2):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2:
                        meta = v3
                if meta is not None:
                    mname = ""
                    for f4, w4, v4 in fields(meta):
                        if f4 == 2:
                            mname = v4.decode(errors="replace")
                    metas[k] = mname
        agg = {}
        total = 0
        for line in lines:
            lname = ""
            for f3, w3, v3 in fields(line):
                if f3 == 2:
                    lname = v3.decode(errors="replace")
                elif f3 == 4:
                    mid, dur = None, 0
                    for f4, w4, v4 in fields(v3):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 3:
                            dur = v4
                    key = metas.get(mid, str(mid))
                    agg[key] = agg.get(key, 0.0) + dur / 1e6
                    total += dur / 1e6
        if not agg:
            continue
        print(f"\n=== plane: {name}  (total event time {total:.1f} us over "
              f"{len(lines)} lines)")
        for dur, k in sorted(((v, k) for k, v in agg.items()),
                             reverse=True)[:topk]:
            print(f"{dur:12.1f} us  {k[:120]}")


if __name__ == "__main__":
    parse(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
