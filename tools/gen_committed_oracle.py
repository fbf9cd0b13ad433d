"""Emit a committed-expectation VALUES oracle for a deterministic
rows-only query: run the registered Spark query at the given sf_dir and
print DuckDB SQL reproducing its exact output.

This is a REGRESSION PIN, not an independent derivation (contrast
tools/gen_bpe_oracle.py): it freezes today's verified-deterministic
output so any future drift fails the external hash check. Only use it
for queries whose determinism across session shapes has been verified
(see the stability probes in the round-5 log) and whose CORRECTNESS is
separately pinned by tests (recall floors, exact-rerank equality).

Usage: python tools/gen_committed_oracle.py <query> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions  # noqa: E402
from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402

_load_extensions()

DUCK_TYPE = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "double": "DOUBLE",
    "float": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
}


def lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # string→DOUBLE parses to the exact nearest double; a bare
        # numeric literal would go through DuckDB's DECIMAL inference
        # and lose the last ulp
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("gen_committed_oracle")
    df = REGISTRY[name].spark(spark, sf_dir)
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    rows = sorted(tuple(r) for r in df.collect())
    cols = ", ".join(f'"{n}"' for n, _ in fields)
    sel = ",\n           ".join(
        f'CAST("{n}" AS {DUCK_TYPE.get(t, "VARCHAR")}) AS "{n}"' for n, t in fields
    )
    vals = ",\n        ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    print(f"""    SELECT {sel}
    FROM (VALUES
        {vals}
    ) AS t({cols})""")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
