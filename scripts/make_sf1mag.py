"""Build a MAGNITUDE-inflated copy of an sf dir for the sf>=1 overflow
proof (judge r04 item 7).

No sf1 testdata exists in this sandbox, so the sf>=1 exposure — integer
aggregates overflowing BIGINT mid-expression when an oracle multiplies
before dividing — is rendered by value magnitude instead of row count:
``l_extendedprice`` and ``o_totalprice`` are multiplied by 10007, which
pushes the cent-sums the TPC-H family aggregates into the 1e15 range an
actual sf1 run reaches (and a multiply-before-divide ppm formulation
into certain overflow).  Every other column is byte-identical, so the
whole relational subset runs through scripts/check_oracles.py against
the inflated dir unchanged:

    python scripts/make_sf1mag.py /root/testdata/sf0.01 /tmp/sf1mag
    python scripts/check_oracles.py /tmp/sf1mag tpch_q1_pricing ...
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

INFLATE = 10007  # prime; 2-decimal prices stay double-exact (< 2**53)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1mag"
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        if not name.endswith(".parquet"):
            continue
        sp = os.path.join(src, name)
        dp = os.path.join(dst, name)
        scale_col = {
            "lineitem.parquet": "l_extendedprice",
            "orders.parquet": "o_totalprice",
        }.get(name)
        if scale_col is None:
            shutil.copyfile(sp, dp)
            continue
        t = pq.read_table(sp)
        field = t.schema.field(scale_col)
        scaled = pa.array(
            [v * INFLATE for v in t.column(scale_col).to_pylist()],
            type=field.type,
        )
        t = t.set_column(t.schema.get_field_index(scale_col), scale_col, scaled)
        pq.write_table(t, dp)
    print(f"wrote inflated dir {dst} (x{INFLATE} prices)")


if __name__ == "__main__":
    main()
