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


def _norm_type(t: str) -> str:
    """Collapse engine-specific spellings into a neutral type family.
    Int WIDTHS and decimal (precision, scale) are preserved on purpose: the
    driver's hash is type-sensitive, so bigint-vs-hugeint or
    decimal(28,6)-vs-decimal(38,6) must FAIL here, not be papered over."""
    t = t.strip().lower()
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("decimal"):
        return t.replace(" ", "")
    return {
        "varchar": "string",
        "text": "string",
        "integer": "int",
        "float": "float",
        "float8": "double",
        "real": "float",
    }.get(t, t)


def spark_type_sig(df) -> dict[str, str]:
    return {f.name: _norm_type(f.dataType.simpleString()) for f in df.schema.fields}


def duck_type_sig(con, sql: str) -> dict[str, str]:
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    return {r[0]: _norm_type(r[1]) for r in rows}


def assert_types_match(df, con, sql: str, qid: str = "") -> None:
    """Type-strict schema comparison mirroring the driver's type-sensitive
    hash: a Spark decimal(28,6) against a DuckDB DECIMAL(38,6), or a BIGINT
    against an INT128, fails here even when the values round-trip equal."""
    ssig = spark_type_sig(df)
    dsig = duck_type_sig(con, sql)
    assert set(ssig) == set(dsig), (
        f"{qid}: column mismatch spark={sorted(ssig)} duck={sorted(dsig)}"
    )
    diffs = {c: (ssig[c], dsig[c]) for c in ssig if ssig[c] != dsig[c]}
    assert not diffs, f"{qid}: result-type mismatches (spark, duck): {diffs}"


def assert_matches(df, con, sql: str, qid: str = "", strict_types: bool = False) -> None:
    if strict_types:
        assert_types_match(df, con, sql, qid)
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
