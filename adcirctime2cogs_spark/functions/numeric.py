"""Engine-exact rounding for oracle comparison.

DuckDB's round() on DOUBLE mis-rounds near decimal half-boundaries
(observed: round(0.49124999999999996, 4) -> 0.4913), while Spark's
round() is exact-decimal HALF_UP — so identical doubles can hash
differently after "the same" round(x, 4). Both engines compute
floor(x * 10000 + 0.5) / 10000 bit-identically on identical doubles,
so that is the engine's rounding convention:

- Spark side: r4() below;
- oracle side: registry.expand_round_sql() rewrites every
  round(X, 4) in oracle SQL into the floor form, so queries stay
  readable as plain round().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r4(col: Column | str) -> Column:
    """round-half-up to 4 decimals, bit-stable across engines."""
    return rn(col, 4)


def rn(col: Column | str, digits: int) -> Column:
    """round-half-up to `digits` decimals in the same engine-exact
    floor form as r4 — use this instead of F.round for ANY rounded
    double an oracle compares (review r11: the PQ family's 3dp
    F.round bypassed the convention).

    The input is cast to DOUBLE first so the whole computation — and
    the RESULT TYPE — is double regardless of the input type. Without
    the cast a DECIMAL input keeps the arithmetic in Spark's exact
    decimal (decimal * decimal-literal stays decimal) while DuckDB's
    identical text promotes to DOUBLE, producing numerically equal but
    type-divergent results that a type-sensitive hasher rejects
    (r11 post-mortem: join_lateral_topk / subquery_scalar_select)."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10 ** digits)
    return F.floor(c.cast("double") * scale + 0.5) / scale


def expand_round_sql(sql: str) -> str:
    """Rewrite every round(X, d) call (integer literal d) in a SQL
    string to floor(CAST((X) AS DOUBLE) * 1e<d> + 0.5) / 1e<d>
    (balanced-paren aware).

    The CAST and the exponent literal are both load-bearing: `10000.0`
    parses as DECIMAL in Spark SQL (and DECIMAL(6,1) in DuckDB), so on
    a DECIMAL input the un-cast form keeps Spark in exact-decimal
    arithmetic and returns decimal(26,7) while DuckDB's identical text
    returns DOUBLE — numerically equal, hash-divergent (burned
    join_lateral_topk in the r11 external window). `1e4` is DOUBLE in
    both engines and the CAST pins the whole computation to double on
    any input type, so the same expanded text produces bit-identical
    DOUBLE results on both sides."""
    out = []
    i = 0
    lower = sql.lower()
    while True:
        j = lower.find("round(", i)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        # word boundary: 'bround(', 'workaround(' etc. must not match
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            out.append(sql[i : j + len("round(")])
            i = j + len("round(")
            continue
        # find the matching close paren
        depth = 0
        k = j + len("round(")
        start = k
        while k < len(sql):
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            k += 1
        inner = sql[start:k]
        # split at the last top-level comma
        depth = 0
        split = -1
        for idx, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                split = idx
        digits = inner[split + 1:].strip() if split >= 0 else ""
        if digits.isdigit():
            expr = expand_round_sql(inner[:split])
            scale = f"1e{int(digits)}"
            out.append(sql[i:j])
            out.append(
                f"floor(CAST(({expr}) AS DOUBLE) * {scale} + 0.5) / {scale}"
            )
            i = k + 1
        else:
            # a non-literal-digits round: emit only its opening and
            # KEEP SCANNING inside it — a round(X, 4) nested in
            # round(..., col) must still be rewritten (skipping to
            # k+1 left it native)
            out.append(sql[i:start])
            i = start
