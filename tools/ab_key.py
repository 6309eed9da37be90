"""Interleaved same-JVM A/B of a declared query between HEAD and a git
revision of its defining module (guide §1: the only noise-robust
measurement on a contended host).

Usage:
  python tools/ab_key.py REV MODULE_PATH KEY [KEY ...] [--reps N] [--noop]

REV          git revision providing the OLD module source (e.g. HEAD~1)
MODULE_PATH  repo-relative path, e.g. locopy_spark/queries/stats.py
KEY          function name(s) in that module taking (spark, sf_dir)

Prints result-equality (collected rows as multisets) and interleaved
best-of-N timings under the bench's count() action (or the noop sink
with --noop).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from locopy_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:]]
    reps = 4
    use_noop = False
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--noop" in args:
        args.remove("--noop")
        use_noop = True
    rev, mod_path, keys = args[0], args[1], args[2:]
    old_src = subprocess.run(
        ["git", "show", f"{rev}:{mod_path}"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    mod_old = types.ModuleType("ab_old_mod")
    mod_old.__file__ = mod_path
    exec(compile(old_src, mod_path + "@" + rev, "exec"), mod_old.__dict__)
    mod_name = mod_path.replace("/", ".").removesuffix(".py")
    __import__(mod_name)
    mod_new = sys.modules[mod_name]

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_key")

    def act(df):
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    for key in keys:
        f_old, f_new = getattr(mod_old, key), getattr(mod_new, key)
        import collections
        a = collections.Counter(map(tuple, f_old(spark, sf).collect()))
        spark.catalog.clearCache()
        b = collections.Counter(map(tuple, f_new(spark, sf).collect()))
        spark.catalog.clearCache()
        print(f"{key}: results equal = {a == b} ({sum(a.values())} rows)")
        res = {"old": [], "new": []}
        for _ in range(reps):
            for name, fn in (("old", f_old), ("new", f_new)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                act(fn(spark, sf))
                res[name].append(time.perf_counter() - t0)
        for name, v in res.items():
            print(
                f"{key} {name}: "
                + " ".join(f"{x:.2f}" for x in v)
                + f"  min {min(v):.2f}  mean {sum(v)/len(v):.2f}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
