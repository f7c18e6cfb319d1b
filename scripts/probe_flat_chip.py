#!/usr/bin/env python
"""On-chip probe for the nested-segment flat resolver: two-size slope
with device-resident plans, via bench.bench_device_resolve."""
import os, sys, zlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

data = bench.make_corpus(8 << 20)
ds, db = data[:2 << 20], data[:8 << 20]
ps = zlib.compress(ds, 6)[2:-4]
pb = zlib.compress(db, 6)[2:-4]
r = bench.bench_device_resolve(ps, pb, ds, db, timeout_s=900)
print("RESOLVE_GBPS", None if r is None else round(r / 1e9, 4))
