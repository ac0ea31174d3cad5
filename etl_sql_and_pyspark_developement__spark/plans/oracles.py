"""DuckDB oracle SQL twins for plans/queries.py.

Each SQL string runs against DuckDB views named after the testdata
tables and must produce the same column names (and, after rounding,
the same values) as the matching Spark query. This systematizes the
reference repo's own validation design: every workload there exists as
both a SQL file and a PySpark file (SQL/*.txt ↔ pyspark/*.py).
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}

ORACLES["q01_pricing_summary"] = """
SELECT
    l_returnflag,
    l_linestatus,
    round(sum(l_quantity), 2)                                        AS sum_qty,
    round(sum(l_extendedprice), 2)                                   AS sum_base_price,
    round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
    round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
    round(avg(l_quantity), 4)                                        AS avg_qty,
    round(avg(l_extendedprice), 4)                                   AS avg_price,
    round(avg(l_discount), 4)                                        AS avg_disc,
    count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
