"""Build the intermediate sweep corpus for the five all-pairs-oracle
keys (VERDICT r10 task 2).

The per-round sf0.1 deep sweep skips d_ngram_jaccard /
d_embedding_dedup / d_containment / d_edit_verify / d_semantic_dedup
because their DuckDB twins are quadratic BY DESIGN (they ARE the
verification baseline).  But the q_ols_trend wrap proved that
sf-dependent bug classes exist, and those five keys would otherwise
never be swept above sf0.01.  This derives a deterministic ~30%
sample of the sf0.1 documents/embeddings tables (id % 10 < 3 — both
engines read the SAME sampled parquet, so the comparison stays
engine-exact) into a sweep dir, 3x the sf0.01 row count = ~9x the
quadratic oracle cost: affordable, and a genuinely larger regime.

Usage: python tools/make_sweep_sf.py [out_dir]
       python tools/check_correctness.py <out_dir> d_ngram_jaccard \
           d_embedding_dedup d_containment d_edit_verify d_semantic_dedup
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/locopy_sweep_sf0.03"
SAMPLED = {"documents": "doc_id", "embeddings": "vec_id"}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    os.makedirs(out, exist_ok=True)
    for fname in os.listdir(SRC):
        if not fname.endswith(".parquet"):
            continue
        table = fname[: -len(".parquet")]
        dst = os.path.join(out, fname)
        if table in SAMPLED:
            key = SAMPLED[table]
            duckdb.sql(
                f"COPY (SELECT * FROM '{os.path.join(SRC, fname)}' "
                f"WHERE {key} % 10 < 3 ORDER BY {key}) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            # untouched tables symlink through so the gate's view
            # registration and any loader paths stay uniform
            if os.path.lexists(dst):
                os.remove(dst)
            os.symlink(os.path.join(SRC, fname), dst)
    counts = {
        t: duckdb.sql(
            f"SELECT COUNT(*) FROM '{os.path.join(out, t)}.parquet'"
        ).fetchone()[0]
        for t in SAMPLED
    }
    print(f"sweep corpus at {out}: {counts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
