#!/usr/bin/env python3
"""Parse graft.Bench stderr `[bench] name: t1 t2 ...` repeat lines into a
JSON map {name: {"repeats": [...], "min": m, "median": d}}.

The bench host is a VM that faults fresh 4 KiB pages at ~120 MB/s with
mmap_lock serialization (see build.sbt's heap-pinning comment) and takes
bursty co-tenant contention windows (sys/steal storms measured via
/proc/stat). Both noise sources are strictly ADDITIVE, so the MIN over
repeats is the consistent estimator of a query's steady plan cost; the
committed scale-curve ratios in BASELINE.md use min-of-repeats, with the
full repeat vectors recorded alongside so the noise is auditable.

Usage: dev/bench_repeats.py <bench-stderr-file> [<out.json>]
"""
import json
import re
import statistics
import sys


def parse(path):
    out = {}
    for line in open(path):
        m = re.match(r'\[bench\] (\S+): ([0-9. ]+)$', line.strip())
        if m:
            ts = [float(x) for x in m.group(2).split()]
            out[m.group(1)] = {
                'repeats': ts,
                'min': min(ts),
                'median': round(statistics.median(ts), 3),
            }
    return out


if __name__ == '__main__':
    r = parse(sys.argv[1])
    js = json.dumps(r, indent=1, sort_keys=True)
    if len(sys.argv) > 2:
        open(sys.argv[2], 'w').write(js + '\n')
    print(js)
