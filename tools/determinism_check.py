"""Partition-count determinism gate: a registered query's VALUE HASH
must be identical under different `spark.sql.shuffle.partitions`
settings — the class of bug this catches is partition-dependent
nondeterminism (sample-based range boundaries, fold-order floats,
unordered truncation), the exact failure mode SCALE.md note 26
documents for the pre-fix prefix-sum path. This tool makes the
"verified at 2 partition counts" claim reproducible on demand.

Usage:
    python tools/determinism_check.py [sf_dir] [query ...]   # default: window 50
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import canon  # noqa: E402  (tools/ is on the path)
from hops_spark.registry import load_all
from hops_spark.session import get_spark

PARTITION_SETTINGS = (7, 32)


def main() -> int:
    args = sys.argv[1:]
    full = "--all" in args
    args = [a for a in args if a != "--all"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    specs = load_all()
    names = [n for n in specs if not only or n in only]
    if not only and not full:
        names = names[:50]                    # driver-window scope
    spark = get_spark("determinism-check")

    n_pass = n_fail = 0
    for name in sorted(names):
        spec = specs[name]
        t0 = time.time()
        hashes = []
        try:
            for parts in PARTITION_SETTINGS:
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                df = spec.fn(spark, sf_dir)
                hashes.append(canon(df.collect(), df.columns))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        if hashes[0] == hashes[1]:
            print(f"PASS {name} ({len(hashes[0])} rows, "
                  f"{time.time() - t0:.1f}s)")
            n_pass += 1
        else:
            diff = [i for i, (a, b) in enumerate(zip(hashes[0], hashes[1]))
                    if a != b][:3]
            print(f"FAIL {name}: results differ across partition counts "
                  f"{PARTITION_SETTINGS}; first differing rows {diff}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
