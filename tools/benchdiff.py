#!/usr/bin/env python3
"""Dev-only per-query bench regression diff.

Not part of the Scala library. Usage:
    python3 tools/benchdiff.py <old> <new> [--threshold 1.3]

Each argument is either a driver-recorded BENCH_r*.json ({"tail": "..."}
wrapping the captured stdout tail) or a raw local bench log (the stdout of
`runMain graft.Bench`). Per-query times come from the compact
{"metric":"qms","lo":N,"v":[ms,...]} chunks (the only form small enough to
survive the driver's ~2000-char tail window whole), the combined
{"metric":"queries","queries":{...}} line when captured, and the
individual {"metric":"query",...} lines — all merged, keyed internally by
the query NUMBER so a names-only log diffs cleanly against a qms-only
driver artifact. Movers beyond the threshold in either direction are
flagged — adjudicate them against BENCH_NOTES.md's ±30 % host-noise band
before blaming a plan change (three rounds of precedents live there).
"""
import sys, json, re

NUM = re.compile(r"^q0*(\d+)(_|$)")


def load_lines(path):
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "tail" in doc:
            return doc["tail"].split("\n")
    except json.JSONDecodeError:
        pass
    return text.splitlines()


def parse(path):
    """Returns ({query_number: seconds}, {query_number: name}, total)."""
    queries, names, total = {}, {}, None

    def add(name, secs, authoritative=False):
        m = NUM.match(name)
        # non-qN names still diff, keyed by the full name (never dropped)
        num = int(m.group(1)) if m else name
        if authoritative or num not in queries:
            queries[num] = secs
        if m and "_" in name:  # a real name, not a bare qN
            names[num] = name

    for ln in load_lines(path):
        ln = ln.strip()
        try:
            obj = json.loads(ln) if ln.startswith("{") else None
        except json.JSONDecodeError:
            obj = None
        if obj is None:
            # a non-JSON or truncated line (pre-round-14 artifacts hold a
            # cut-off combined map): salvage whole "name":secs pairs
            for nm, secs in re.findall(r'"(q\d+_\w+)":(\d+(?:\.\d+)?)', ln):
                add(nm, float(secs))
            continue
        m = obj.get("metric")
        if m == "qms" and isinstance(obj.get("v"), list):
            # ms-rounded values are the FALLBACK record: never overwrite a
            # full-precision timing already parsed from the named lines
            for i, ms in enumerate(obj["v"]):
                if isinstance(ms, (int, float)):
                    queries.setdefault(obj["lo"] + i, ms / 1000.0)
        elif m == "queries" and isinstance(obj.get("queries"), dict):
            # the combined map is authoritative when captured whole
            for k, v in obj["queries"].items():
                if isinstance(v, (int, float)):
                    add(k, v, authoritative=True)
        elif m == "query" and "value" in obj:
            add(obj["name"], obj["value"])
        elif m == "total":
            total = obj
    return queries, names, total


def main():
    args, thr, skip = [], 1.3, False
    for i, a in enumerate(sys.argv[1:], start=1):
        if skip:
            skip = False
        elif a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                thr = float(sys.argv[i + 1])
                skip = True
        else:
            args.append(a)
    if len(args) != 2:
        print(__doc__)
        return 2
    old_q, old_n, old_t = parse(args[0])
    new_q, new_n, new_t = parse(args[1])
    label = lambda num: (new_n.get(num) or old_n.get(num) or
                         (num if isinstance(num, str) else f"q{num}"))
    common = sorted(set(old_q) & set(new_q), key=str)  # int/str keys mix
    added = sorted(label(n) for n in set(new_q) - set(old_q))
    removed = sorted(label(n) for n in set(old_q) - set(new_q))
    movers = []
    for num in common:
        o, n = old_q[num], new_q[num]
        if o <= 0:
            continue
        r = n / o
        if r > thr or r < 1 / thr:
            movers.append((r, label(num), o, n))
    for r, name, o, n in sorted(movers, reverse=True):
        print(f"MOVER {name}: {o:.2f}s -> {n:.2f}s  ({r:.2f}x)")
    def cap(names):
        return ", ".join(names[:15]) + (", ..." if len(names) > 15 else "")
    if added:
        print(f"added ({len(added)}): {cap(added)}")
    if removed:
        print(f"removed ({len(removed)}): {cap(removed)}")
    ratios = sorted(new_q[k] / old_q[k] for k in common if old_q[k] > 0)
    if ratios:
        med = ratios[len(ratios) // 2]
        print(f"{len(common)} shared queries, median ratio {med:.2f}x, "
              f"{len(movers)} mover(s) beyond {thr:.2f}x")
    else:
        print("no shared per-query timings found "
              "(old-format tail without the combined map?)")
    if old_t and new_t:
        print(f"totals: {old_t.get('value', 0):.1f}s "
              f"({old_t.get('n', '?')} queries) -> "
              f"{new_t.get('value', 0):.1f}s ({new_t.get('n', '?')} queries)")
    return 1 if movers else 0


if __name__ == "__main__":
    sys.exit(main())
