"""Row/document hashing (reference op25, etl/etl_ida.py:124-131).

The reference computes ``md5('{ano_mes}|{grupo}|{servico}|{variavel}|{valor}')``
per record for dedup (UNIQUE(hash_registro), schema_star.sql:93).  Spark's
built-in ``F.md5`` is JVM-side and codegen'd — no UDF needed, and md5 is also
available in DuckDB so the oracle can reproduce it bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def record_hash(*cols: Column | str, sep: str = "|") -> Column:
    """MD5 hex of pipe-joined column values (NULL-safe via concat_ws)."""
    return F.md5(F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols]))


def text_fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of case-folded,
    whitespace-collapsed text.  Used for exact near-normalization dedup;
    mirrors the reference's clean-then-hash pattern (etl/etl_ida.py:398-404
    + :124-131) but applied to documents.
    """
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return F.md5(normalized)


# Carter-Wegman universal hash family over the Mersenne prime 2^31-1:
# h_j(k) = (((k mod p) * a_j + b_j) mod p) mod m.  (k mod p) < 2^31 and
# a_j < 2^31, so the product fits signed 64-bit exactly — pure integer
# arithmetic every engine evaluates identically inside codegen (measured
# ~9x cheaper than an md5-based family on a 600k-row probe: a digest +
# hex parse per row vs two multiplies).  Shared by the x14 bloom
# membership prefilter and the per-partition bloom index in
# sources/file_pruning.py; property-tested bit-identical across Spark,
# DuckDB, and a Python reference (tests/test_property_based.py).
CW_PRIME = 2147483647
CW_PARAMS = [(1103515245, 12345), (1299709, 7919), (122949829, 314159)]


def cw_bucket(key: Column, seed: int, m: int) -> Column:
    """Bucket/bit-position of an integer key under hash function `seed`
    (1-based index into CW_PARAMS), in [0, m) for ANY integer key —
    SQL's % is sign-preserving, so the residue is normalized with +p
    before the multiply (still < 2^32, product still fits int64); this
    matches Python's non-negative % semantics exactly, and is a no-op
    for non-negative keys."""
    a, b = CW_PARAMS[seed - 1]
    k = (key.cast("long") % CW_PRIME + CW_PRIME) % CW_PRIME
    return (k * a + b) % CW_PRIME % m


def cw_bucket_sql(key: str, seed: int, m: int) -> str:
    """DuckDB twin of cw_bucket — identical arithmetic, identical bits."""
    a, b = CW_PARAMS[seed - 1]
    k = f"((CAST({key} AS BIGINT) % {CW_PRIME} + {CW_PRIME}) % {CW_PRIME})"
    return f"(({k} * {a} + {b}) % {CW_PRIME}) % {m}"


def bloom_positions(df, key_col: str, n_hashes: int, m: int, part_cols=()):
    """Distinct Bloom bit-position table for `df[key_col]` under the CW
    family: one row per ({part_cols...}, pos).  The shared kernel behind
    the per-partition bloom index in sources/file_pruning.py.

    ONE scan (r13): the k positions ride an array+explode in a single
    projection instead of a k-branch union — the union form re-scanned
    the source once PER HASH FUNCTION (x14's x100 phase profile: the
    3-scan bitmap build was 1.66 s of the query's 2.67 s wall; guide
    §6.2 scan once / §2.3 shuffle the same distinct set either way).
    explode-of-k-array yields exactly the union's multiset per row, so
    the distinct is unchanged."""
    return df.select(
        *part_cols,
        F.explode(
            F.array(
                *[
                    cw_bucket(F.col(key_col), j, m)
                    for j in range(1, n_hashes + 1)
                ]
            )
        ).alias("pos"),
    ).distinct()


def km_pos(key: Column, j: int, m: int) -> Column:
    """j-th Bloom position by Kirsch-Mitzenmacher double hashing:
    ``pos_j = (h1 + j*h2) mod m`` with h1/h2 TWO Carter-Wegman evals
    (CW_PARAMS[0]/[1]); h2 is forced odd so every stride is coprime with
    the power-of-two m and the k probe positions stay distinct mod m.

    Why (r11, measured at the x100 replica on x14's 60 M-row probe
    projection): k independent CW evals cost k normalizations + k
    multiply-mod chains PER ROW; KM computes two and derives the rest
    with one multiply-add-mod — 2.17 s → 1.72 s for the k=3 probe+agg
    pass, identical no-false-negative contract and indistinguishable FP
    rate (Kirsch & Mitzenmacher 2006: a KM-derived family has the same
    asymptotic FP behavior as k independent hashes).  The whole family
    stays overflow-free signed-64 integer arithmetic, so the DuckDB twin
    (km_pos_sql) is bit-identical."""
    a1, b1 = CW_PARAMS[0]
    a2, b2 = CW_PARAMS[1]
    k = (key.cast("long") % CW_PRIME + CW_PRIME) % CW_PRIME
    h1 = (k * a1 + b1) % CW_PRIME
    h2 = ((k * a2 + b2) % CW_PRIME).bitwiseOR(F.lit(1))
    return (h1 + j * h2) % m


def km_pos_sql(key: str, j: int, m: int) -> str:
    """DuckDB twin of km_pos — identical arithmetic, identical bits.
    DuckDB's % is sign-preserving exactly like Spark's, and | is int64
    bitwise OR on both engines."""
    a1, b1 = CW_PARAMS[0]
    a2, b2 = CW_PARAMS[1]
    k = f"((CAST({key} AS BIGINT) % {CW_PRIME} + {CW_PRIME}) % {CW_PRIME})"
    h1 = f"(({k} * {a1} + {b1}) % {CW_PRIME})"
    h2 = f"((({k} * {a2} + {b2}) % {CW_PRIME}) | 1)"
    return f"(({h1} + {j} * {h2}) % {m})"


def bloom_positions_km(df, key_col: str, n_hashes: int, m: int):
    """Distinct KM-family Bloom bit-position table (build-side twin of
    km_pos — the build and probe sides of a filter must share the
    family).  Build cost is amortized over the probe side, but the same
    2-eval saving applies.

    ONE scan (r13, same rewrite as bloom_positions): the union form ran
    one source scan per hash function — on x14's x100 reference side
    that was 3 scans of 15 M orders rows before the 4th scan the confirm
    marker needs.  explode-of-k-array preserves the multiset, hence the
    distinct."""
    return df.select(
        F.explode(
            F.array(
                *[km_pos(F.col(key_col), j, m) for j in range(1, n_hashes + 1)]
            )
        ).alias("pos")
    ).distinct()


def bloom_bitmap(df, key_col: str, n_hashes: int, m: int, family="cw"):
    """The position table packed into ONE row: a DENSE array<bigint> of
    m/64 64-bit words (word pos>>6 gets bit 1<<(pos&63); absent words
    are 0).  Probing is then a broadcast crossJoin plus pure codegen
    bit arithmetic per row — no join on the probe side at all, versus
    one broadcast hash join per hash function for the row-per-position
    form (whose three renamed markers also defeat exchange reuse, so
    the reference scan re-ran per join — measured on x14).  Dense ARRAY
    rather than a map because Spark's map element_at is a LINEAR key
    scan (1024-entry map × 3 probes/row measured SLOWER than the joins
    it replaced); array element_at is O(1).  ≤ 1024 words (8 KB) for
    the default geometry, riding one broadcast row.

    ``family``: "cw" (k independent Carter-Wegman evals) or "km"
    (Kirsch-Mitzenmacher double hashing — see km_pos); build and probe
    sides must match."""
    pos_fn = bloom_positions_km if family == "km" else bloom_positions
    pos = pos_fn(df, key_col, n_hashes, m)
    words = pos.groupBy(
        F.shiftright(F.col("pos"), 6).cast("int").alias("w")
    ).agg(
        # positions are DISTINCT, so each (word, bit) appears once and
        # SUM == bitwise OR — and sum is map-side combinable.
        # call_function: the PySpark shiftleft wrapper only takes an int
        # literal shift; the SQL function itself accepts expressions
        F.sum(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % 64).cast("int"),
            )
        ).alias("bits")
    )
    sparse = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("w"), F.col("bits")))
        ).alias("__m")
    )
    n_words = (m + 63) // 64
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("int")), F.lit(0).cast("long")
        ),
    )
    return sparse.select(dense.alias("__bloom"))


def bloom_bitmap_probe(pos_col, bitmap_col=None):
    """Membership test of a position against the packed bitmap:
    bit (pos & 63) of array word (pos>>6)+1 (1-indexed).  Pure
    expression — whole-stage codegen, no join."""
    m = bitmap_col if bitmap_col is not None else F.col("__bloom")
    word = F.element_at(
        m, (F.shiftright(pos_col, 6) + 1).cast("int")
    )
    # LOGICAL shift: an arithmetic >> of a negative word (bit 63 set)
    # propagates the sign and `-1 % 2 == -1` in Spark — bit 63 would
    # silently read as unset.  call_function because the PySpark wrapper
    # only accepts an int-literal shift.
    shifted = F.call_function(
        "shiftrightunsigned", word, (pos_col % 64).cast("int")
    )
    # bitwiseAND, not `% 2`: when bit 63 is also set the shifted word is
    # a NEGATIVE long for shifts < 63, and Spark's % keeps the dividend
    # sign (-9223372036854775807 % 2 == -1) — the low bit would read
    # unset (caught by the self-probe check in tests)
    return (shifted.bitwiseAND(F.lit(1)) == 1) & word.isNotNull()
