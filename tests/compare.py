"""Differential-compare helpers mirroring the driver's oracle check:
columns sorted by name, values normalized (FIXTURES.md §1 canonicalization:
timestamps → ISO strings, floats → 6 dp), rows sorted, then equality."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _norm(v):
    if v is None:
        return None
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return round(float(v), 6)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def canonical(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is not None, str(x)) for x in t))


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def assert_matches(df, con, sql: str, qid: str = "") -> None:
    scols, srows = spark_result(df)
    dcols, drows = duck_result(con, sql)
    assert sorted(scols) == sorted(dcols), (
        f"{qid}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    s = canonical(scols, srows)
    d = canonical(dcols, drows)
    assert len(s) == len(d), f"{qid}: row count spark={len(s)} duck={len(d)}"
    for i, (a, b) in enumerate(zip(s, d)):
        assert a == b, f"{qid}: first diff at canonical row {i}: spark={a} duck={b}"
